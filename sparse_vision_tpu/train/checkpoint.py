"""Orbax checkpoint wrapper.

Reference semantics (model_pipeline.py:1266-1280 + 234-263): per-epoch checkpoint of
{epoch, model params, optimizer state, training_step}; resume restores the optimizer
state and train_batch_idx so the dead-neuron schedule continues correctly
(model_pipeline.py:238). File naming excludes sae_epochs (see utils/paths.py).

``save_checkpoint(..., blocking=False)`` writes asynchronously (Orbax
AsyncCheckpointer): the device arrays are snapshotted immediately and serialization
overlaps the next training epoch — the TPU equivalent of not stalling the step loop on
torch.save. Call ``wait_for_saves()`` before reading a just-written checkpoint or
exiting.
"""

from __future__ import annotations

import atexit
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

_async_ckptr: Optional[ocp.AsyncCheckpointer] = None


def _get_async() -> ocp.AsyncCheckpointer:
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        atexit.register(wait_for_saves)
    return _async_ckptr


def wait_for_saves() -> None:
    """Block until all in-flight async checkpoint writes are durable."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(ckpt_dir: str, epoch: int, tree: Any, blocking: bool = True) -> str:
    """Save a pytree checkpoint for ``epoch`` under ckpt_dir/epoch_{e}."""
    path = os.path.abspath(os.path.join(ckpt_dir, f"epoch_{epoch}"))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if not blocking:
        _get_async().save(path, _to_numpy(tree), force=True)
        return path
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _to_numpy(tree), force=True)
    return path


def load_checkpoint(ckpt_dir: str, epoch: int, like: Optional[Any] = None) -> Any:
    path = os.path.abspath(os.path.join(ckpt_dir, f"epoch_{epoch}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path, item=_to_numpy(like))
        return ckptr.restore(path)


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    epochs = [
        int(d.split("_", 1)[1])
        for d in os.listdir(ckpt_dir)
        if d.startswith("epoch_") and d.split("_", 1)[1].isdigit()
    ]
    return max(epochs) if epochs else None
