"""Platform pinning helpers for the container's site-hook quirk.

The deployment container registers its TPU plugin via a ``sitecustomize`` that
pins ``jax.config.jax_platforms`` to its own platform list (observed:
``'axon,cpu'``) BEFORE environment variables are honored. Two consequences for
fresh interpreters:

- ``JAX_PLATFORMS=cpu python script.py`` silently selects the TPU anyway
  (the config pin wins over the env var), and
- when the TPU tunnel is unhealthy, backend init then HANGS indefinitely —
  even for runs that never wanted the TPU.

Importing this module (or the package) does not initialize jax backends, so
calling these helpers at the top of an entry script is always safe.
"""

from __future__ import annotations

import os


def pin_platform_from_env() -> None:
    """Make the JAX_PLATFORMS env var authoritative for this process.

    For fresh-interpreter entry points (CLI ``__main__``, examples, benches):
    apply the env var through ``jax.config`` so it wins over the site hook's
    pin. No-op when the env var is unset. Must run before any
    backend-initializing jax call. In-process library code must NOT call this —
    a caller that already pinned a platform (tests, notebooks) would be flipped
    back to the env's platform (see cli.main's conservative rule).
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def pin_cpu_if_requested() -> None:
    """Apply ``JAX_PLATFORMS=cpu`` through ``jax.config`` (no-op otherwise)."""
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")


def probe_tpu_or_pin_cpu(caller: str = "bench") -> None:
    """Bounded TPU-reachability probe BEFORE this process touches jax backends.

    An unhealthy TPU tunnel hangs backend init indefinitely (even
    ``jax.devices()``), which would make a bench hang instead of reporting.
    Probe in a subprocess with a hard timeout; on failure set JAX_PLATFORMS=cpu
    so the caller always completes (with an honest "backend" field in its
    output). The generous default timeout exists because on this 1-core host a
    loaded CPU can slow a HEALTHY probe (tunneled plugin registration) well past
    120 s, and a false fallback would record a misleading CPU number.
    Respects SVT_SKIP_TPU_PROBE / SVT_TPU_PROBE_TIMEOUT. Must run before any
    jax import in the calling process; pair with :func:`pin_cpu_if_requested`.
    """
    import subprocess
    import sys

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        return  # caller already wants CPU
    if os.environ.get("SVT_SKIP_TPU_PROBE"):
        return
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=float(os.environ.get("SVT_TPU_PROBE_TIMEOUT", "300")),
            check=True, capture_output=True,
        )
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        # NOTE: a FAST failure saying "Backend 'axon' is not in the list of
        # known backends" usually means the caller's environment clobbered
        # PYTHONPATH (the plugin registers via a sitecustomize dir that the
        # deployment ships ON PYTHONPATH) — export
        # PYTHONPATH=/root/repo:$PYTHONPATH, never PYTHONPATH=/root/repo.
        print(f"{caller}: TPU backend unreachable within the probe timeout — "
              "falling back to CPU", file=sys.stderr)
        os.environ["JAX_PLATFORMS"] = "cpu"
