"""Multi-host (DCN) initialization and mesh construction for pod slices.

The reference has no multi-host runtime at all (SURVEY §2.2); this module completes
the scaling story for real v5e pods: one `initialize()` per host process, then a mesh
whose 'data' axis spans every chip in the slice. Within-host chips communicate over
ICI; across hosts over DCN — pure data-parallel SAE training only pmean's gradients,
which XLA maps onto the fast hierarchy automatically.

On a single-host (or CPU-test) environment everything degrades to no-ops, so the same
launch script runs everywhere.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from sparse_vision_tpu.parallel.mesh import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; TPU pods also
    auto-detect). No-op on single-process runs. Returns the process count."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    process_id_env = os.environ.get("JAX_PROCESS_ID")
    if process_id is None and process_id_env is not None:
        process_id = int(process_id_env)

    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_count()


def global_data_mesh():
    """1-D 'data' mesh over EVERY chip in the slice (all hosts)."""
    return make_mesh((jax.device_count(),))


def process_local_batch_slice(global_batch: int) -> int:
    """Per-host share of a global batch (equal split; raises on remainder so sharded
    means stay exact — the same equal-shard requirement as the shard_map step)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    return global_batch // n
