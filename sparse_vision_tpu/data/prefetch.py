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
    """Stage up to ``buffer_size`` device batches ahead of the consumer.

    Producer exceptions (decode failures, device OOM) are RE-RAISED in the consumer —
    a silently truncated epoch would corrupt metrics and dead-neuron statistics. If
    the consumer abandons the generator early, the producer unblocks via a stop flag
    instead of leaking a thread parked on q.put."""
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    sentinel = object()
    stop = threading.Event()

    def producer():
        try:
            for b in it:
                staged = device_put_batch(b, sharding)
                while not stop.is_set():
                    try:
                        q.put(staged, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(sentinel)
        except BaseException as e:  # surface in the consumer, don't truncate silently
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
