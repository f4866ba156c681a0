"""Orbax checkpoint wrapper.

Reference semantics (model_pipeline.py:1266-1280 + 234-263): per-epoch checkpoint of
{epoch, model params, optimizer state, training_step}; resume restores the optimizer
state and train_batch_idx so the dead-neuron schedule continues correctly
(model_pipeline.py:238). File naming excludes sae_epochs (see utils/paths.py).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(ckpt_dir: str, epoch: int, tree: Any) -> str:
    """Save a pytree checkpoint for ``epoch`` under ckpt_dir/epoch_{e}."""
    path = os.path.abspath(os.path.join(ckpt_dir, f"epoch_{epoch}"))
    os.makedirs(os.path.dirname(path), exist_ok=True)
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
