"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding tests
run without TPU hardware (SURVEY.md §4 implication; the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).

The environment's sitecustomize imports jax and registers the TPU plugin at interpreter
startup, so env vars are too late here — use jax.config instead, which takes effect as
long as no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8 and devs[0].platform == "cpu"
    return devs
