"""Pin the driver entry points: entry() compiles, and dryrun_multichip(8)
self-provisions its mesh and completes even in a process that cannot satisfy the
device count in-process (the round-1 failure mode: bench host with 1 real chip,
MULTICHIP_r01 rc=1)."""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 10)


def test_dryrun_multichip_in_process():
    # conftest already provisioned 8 virtual CPU devices; the normal path.
    graft.dryrun_multichip(8)


def test_dryrun_multichip_cold_process_no_env():
    """The driver's exact invocation: fresh interpreter, NO env overrides —
    dryrun_multichip must provision its own virtual mesh (tests/conftest.py recipe
    applied in-process) instead of failing on the host's real device count."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")
    }
    r = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip OK" in r.stdout
    assert "fused/shard_map OK" in r.stdout
    # the dryrun feeds NONZERO random data and asserts loss>0 + params-changed in
    # every block — a zero loss would mean the artifact proves dispatch only
    assert "loss=0.0000" not in r.stdout, r.stdout
