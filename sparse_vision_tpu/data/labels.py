"""ImageNet label translation: PyTorch/torchvision class ids -> the old TF/GoogLeNet
convention.

Reproduces the reference's get_label_translator (utils.py:2072-2122): both conventions
are wordnet-id lists (public label files, shipped in data/assets/); translation maps a
new-convention index to its wordnet id, looks that id up in the old list, and adds 1
(old-convention GoogLeNet ids start at 1, utils.py:2120). Implemented as a precomputed
jnp gather table so it is jittable and runs on device (the reference loops per label on
host per batch).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_ASSETS = os.path.join(os.path.dirname(__file__), "assets")


def _read_wids(path: str) -> list[str]:
    with open(path, "r", encoding="utf-8") as f:
        return [line.split(" ")[0].strip() for line in f.read().strip().split("\n")]


@functools.lru_cache(maxsize=1)
def torch_to_tf_label_table() -> jnp.ndarray:
    """[1000]-entry int32 table: new-convention class id -> old-convention id (+1
    offset). Entries whose wordnet id is missing from the old list map to -1 (the
    reference raises for those, utils.py:2116-2118; both shipped lists cover all 1000
    classes so a -1 signals a mismatched label file)."""
    old_wids = _read_wids(os.path.join(_ASSETS, "old_imagenet_labels.txt"))
    new_wids = _read_wids(os.path.join(_ASSETS, "imagenet_labels.txt"))
    old_index = {wid: i for i, wid in enumerate(old_wids)}
    table = [old_index.get(wid, -2) + 1 for wid in new_wids]  # missing -> -1
    return jnp.asarray(table, jnp.int32)


def remap_torch_to_tf_labels(labels: jax.Array) -> jax.Array:
    """Vectorized equivalent of the reference's per-element loop (utils.py:2109-2120)."""
    return torch_to_tf_label_table()[labels]
