"""Sweep runner: the DCN-tier replacement for the reference's HTCondor/SLURM job array
(README.md:13-15, specify_parameters.py:287-293 — N parameters.txt lines -> N cluster
jobs each invoking main.py with one combo).

Two layers:
- ``assign_to_host``: deterministic round-robin split of a sweep across hosts/slices —
  each host runs ``run_sweep_local`` on its slice; results aggregate through per-run
  JSON files + ``eval_tools.results.merge_results`` (no shared-file locking — the
  reference's FileLock'd CSV, utils.py:1045-1069, was its whole coordination layer).
- ``run_sweep_local``: run each config in an isolated subprocess (own JAX runtime, like
  one cluster job), optionally several at once for CPU-only sweeps. On a TPU host keep
  ``max_workers=1`` — chips don't share between processes.
"""

from __future__ import annotations

import os
import subprocess
import sys
from dataclasses import dataclass
from typing import Optional, Sequence

from sparse_vision_tpu.config import RunConfig


def assign_to_host(
    configs: Sequence[RunConfig], num_hosts: int, host_index: int
) -> list[RunConfig]:
    """Deterministic round-robin shard of the sweep for one host."""
    if not (0 <= host_index < num_hosts):
        raise ValueError(f"host_index {host_index} out of range for {num_hosts} hosts")
    return [c for i, c in enumerate(configs) if i % num_hosts == host_index]


@dataclass
class RunResult:
    config: RunConfig
    returncode: int
    stdout_tail: str


def run_sweep_local(
    configs: Sequence[RunConfig],
    max_workers: int = 1,
    env: Optional[dict] = None,
    timeout: Optional[float] = None,
) -> list[RunResult]:
    """Run each config as ``python -m sparse_vision_tpu.cli --run_pipeline --config ...``
    in a subprocess. Returns per-run results in input order."""
    base_env = dict(os.environ)
    # make the package importable in children regardless of install state
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    base_env["PYTHONPATH"] = pkg_root + os.pathsep + base_env.get("PYTHONPATH", "")
    if env:
        base_env.update(env)

    import time

    procs: dict[int, subprocess.Popen] = {}
    deadlines: dict[int, float] = {}
    results: dict[int, RunResult] = {}
    pending = list(enumerate(configs))

    def launch(i, cfg):
        cmd = [sys.executable, "-m", "sparse_vision_tpu.cli",
               "--run_pipeline", "--config", cfg.to_json()]
        procs[i] = subprocess.Popen(
            cmd, env=base_env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        if timeout is not None:
            deadlines[i] = time.monotonic() + timeout

    while pending or procs:
        while pending and len(procs) < max_workers:
            i, cfg = pending.pop(0)
            launch(i, cfg)
        done = []
        for i, p in procs.items():
            if timeout is not None and time.monotonic() > deadlines[i]:
                p.kill()  # run exceeded its per-run timeout
                out, _ = p.communicate()
                done.append((i, p.returncode, (out or "") + "\n[killed: timeout]"))
                continue
            try:
                out, _ = p.communicate(timeout=0.2)
                done.append((i, p.returncode, out))
            except subprocess.TimeoutExpired:
                continue
        for i, rc, out in done:
            procs.pop(i)
            tail = "\n".join((out or "").splitlines()[-10:])
            results[i] = RunResult(configs[i], rc, tail)
    return [results[i] for i in range(len(configs))]
