"""Profiling/timing harness — a first-class flag instead of the reference's
commented-out profiler scaffolding (model_pipeline.py:1295, 1317-1336; the unused
``prof`` constructor arg at :20-21, 43; supplementary_files_1/profiler_code.py).

``maybe_profile`` wraps any region in a ``jax.profiler.trace`` when a directory is
given (view with Perfetto / TensorBoard); ``timeit_device`` measures steady-state
device time of a jitted function with a hard host-readback sync.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def maybe_profile(trace_dir: str | None):
    """jax.profiler.trace(trace_dir) when trace_dir is set; no-op otherwise."""
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


def timeit_device(fn: Callable, *args, iters: int = 20, trials: int = 5,
                  warmup: int = 1) -> dict:
    """Median-of-trials wall time per call of ``fn(*args)``.

    The first output leaf is read back to host after each trial as a hard device sync
    (block_until_ready alone has proven unreliable on tunneled backends — bench.py)."""

    def sync(out):
        # reduce on device, transfer ONE scalar — transferring a whole leaf would
        # dominate the measurement on tunneled backends
        import jax.numpy as jnp

        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))

    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    return {
        "median_s": times[len(times) // 2],
        "min_s": times[0],
        "all_s": times,
    }
