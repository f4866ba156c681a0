"""Host->device prefetching: overlap decode/batching with device compute.

Replaces the reference's DataLoader worker processes (utils.py:354, 540-547) with a
background thread that stages the next batches onto the device (optionally sharded over
a mesh) while the current step runs — the standard JAX double-buffering pattern.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np

from sparse_vision_tpu.data.datasets import Batch


def device_put_batch(batch: Batch, sharding: Optional[jax.sharding.Sharding] = None):
    """Transfer one batch to device(s). With a sharding the batch axis is split over
    the mesh's data axis (the reference is single-device: execute_project.py:102-107)."""
    def put(x):
        if sharding is None:
            return jax.device_put(x)
        return jax.device_put(x, sharding)

    return Batch(put(batch.images), put(batch.labels), put(batch.indices))


def prefetch(
    it: Iterator[Batch],
    sharding: Optional[jax.sharding.Sharding] = None,
    buffer_size: int = 2,
) -> Iterator[Batch]:
    """Stage up to ``buffer_size`` device batches ahead of the consumer."""
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    sentinel = object()

    def producer():
        try:
            for b in it:
                q.put(device_put_batch(b, sharding))
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item
