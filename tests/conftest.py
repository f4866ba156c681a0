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


def pytest_collection_modifyitems(config, items):
    """Apply the 'slow' mark from the committed manifest (tests/slow_tests.txt,
    tests measured >= 15 s on the 1-core CI host) so
    ``pytest -m "not slow"`` is a <15-min default loop and the full suite
    stays the pre-snapshot gate (CLAUDE.md). Regenerate the manifest from a
    full run's ``--durations=0`` output:

        grep -E "^[0-9.]+s call" run.log | sort -rn \
          | awk '$1+0 >= 15 {print $3}' | sort > tests/slow_tests.txt

    Tests may also carry @pytest.mark.slow directly; the manifest adds the
    measured ones without touching 80+ files."""
    manifest = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    if not os.path.exists(manifest):
        return
    with open(manifest) as f:
        slow_ids = {ln.strip() for ln in f if ln.strip()}
    for item in items:
        nodeid = item.nodeid.split("[")[0]  # params share the base id's cost class
        if item.nodeid in slow_ids or nodeid in slow_ids:
            item.add_marker(pytest.mark.slow)
