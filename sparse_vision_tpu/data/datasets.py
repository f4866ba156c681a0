"""Input pipelines: host-side numpy batching feeding device-resident NHWC batches.

Replaces the reference's torch DataLoader / WebDataset stack (utils.py:331-610) with a
deterministic, worker-less numpy pipeline plus device prefetch (data/prefetch.py).
Reference semantics kept:
- drop_last=True everywhere so per-batch means average cleanly (utils.py:335-338)
- train shuffled, eval not (utils.py:333-334)
- MNIST normalize (0.1307, 0.3081) (utils.py:429-433)
- CIFAR-10 normalized with the SAME MNIST constants on every channel — a reference
  quirk kept for parity (utils.py:374-408 uses Normalize((0.1307,), (0.3081,)))
- Tiny-ImageNet images are raw float32 in [0, 255] (the dataset is constructed with
  transform=None at utils.py:353-357, so the normalization branch at
  tiny_imagenet.py:278-283 never runs)
- ImageNet: resize-256 -> center-crop 229 -> x*255 - 117 (lucent InceptionV1
  convention, utils.py:318-329)
- the reference's val-loader bug (load_data returns train_dataloader twice,
  utils.py:610) is NOT replicated: we return the real validation split.

Batches carry (images, labels, sample_indices) — the `process_batch` contract
(utils.py:2125-2211). The reference's live-experiment artifact of filtering ImageNet to
the flamingo class (utils.py:2163-2168) is exposed as an explicit opt-in filter.
"""

from __future__ import annotations

import gzip
import os
import pickle
import struct
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import numpy as np

from sparse_vision_tpu.config import NUM_CLASSES, RunConfig, get_img_size


@dataclass
class Batch:
    images: np.ndarray  # [B, H, W, C] float32
    labels: np.ndarray  # [B] int32
    indices: np.ndarray  # [B] int32 — index of the sample in the dataset (for top-k/MIS)


class ArrayDataset:
    """In-memory dataset with deterministic epoch shuffling and drop_last batching."""

    def __init__(self, images: np.ndarray, labels: np.ndarray, category_names: Sequence[str]):
        assert images.ndim == 4 and images.shape[0] == labels.shape[0]
        self.images = images
        self.labels = labels.astype(np.int32)
        self.category_names = list(category_names)

    def __len__(self) -> int:
        return self.images.shape[0]

    def batches(self, batch_size: int, shuffle: bool, seed: int = 0) -> Iterator[Batch]:
        n = len(self)
        order = (
            np.random.default_rng(seed).permutation(n) if shuffle else np.arange(n)
        ).astype(np.int32)
        num_batches = n // batch_size  # drop_last=True
        for b in range(num_batches):
            idx = order[b * batch_size : (b + 1) * batch_size]
            yield Batch(self.images[idx], self.labels[idx], idx)

    def num_batches(self, batch_size: int) -> int:
        return len(self) // batch_size


class LazyImageDataset:
    """File-backed dataset decoding images per batch (ImageNet / Tiny-ImageNet scale)."""

    def __init__(self, paths, labels, category_names, decode_fn):
        self.paths = list(paths)
        self.labels = np.asarray(labels, np.int32)
        self.category_names = list(category_names)
        self.decode_fn = decode_fn

    def __len__(self) -> int:
        return len(self.paths)

    def batches(self, batch_size: int, shuffle: bool, seed: int = 0) -> Iterator[Batch]:
        n = len(self)
        order = (
            np.random.default_rng(seed).permutation(n) if shuffle else np.arange(n)
        ).astype(np.int32)
        for b in range(n // batch_size):
            idx = order[b * batch_size : (b + 1) * batch_size]
            imgs = np.stack([self.decode_fn(self.paths[i]) for i in idx])
            yield Batch(imgs, self.labels[idx], idx)

    def num_batches(self, batch_size: int) -> int:
        return len(self) // batch_size


# ---------------------------------------------------------------------------
# synthetic data (tests / benchmarks; no reference equivalent — the reference
# requires downloaded datasets even for smoke tests)
# ---------------------------------------------------------------------------

def make_synthetic(
    num_samples: int = 512,
    img_size: tuple = (28, 28, 1),
    num_classes: int = 10,
    seed: int = 0,
    center_seed: int = 1234,
) -> ArrayDataset:
    """Class-conditional Gaussian blobs: linearly separable enough that a small MLP
    reaches high accuracy in one epoch — used by end-to-end learning tests.

    The class centers are drawn from ``center_seed`` so that train and val splits
    (different ``seed``) sample the SAME task."""
    centers = (
        np.random.default_rng(center_seed)
        .normal(0, 1.0, size=(num_classes,) + tuple(img_size))
        .astype(np.float32)
    )
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, size=num_samples)
    images = centers[labels] + rng.normal(0, 0.3, size=(num_samples,) + tuple(img_size)).astype(
        np.float32
    )
    return ArrayDataset(images, labels, [str(i) for i in range(num_classes)])


# ---------------------------------------------------------------------------
# MNIST (idx files) — normalization (x/255 - 0.1307)/0.3081 (utils.py:429-433)
# ---------------------------------------------------------------------------

def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        dims = struct.unpack(f">{ndim}I", f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(dims)


def _find(dirpath: str, names: Sequence[str]) -> str:
    for n in names:
        for cand in (os.path.join(dirpath, n), os.path.join(dirpath, n + ".gz")):
            if os.path.exists(cand):
                return cand
    raise FileNotFoundError(f"None of {names} under {dirpath}")


def load_mnist(data_dir: str, split: str) -> ArrayDataset:
    base = os.path.join(data_dir, "mnist")
    if os.path.isdir(os.path.join(base, "MNIST", "raw")):
        base = os.path.join(base, "MNIST", "raw")
    prefix = "train" if split == "train" else "t10k"
    images = _read_idx(_find(base, [f"{prefix}-images-idx3-ubyte", f"{prefix}-images.idx3-ubyte"]))
    labels = _read_idx(_find(base, [f"{prefix}-labels-idx1-ubyte", f"{prefix}-labels.idx1-ubyte"]))
    x = images.astype(np.float32)[..., None] / 255.0
    x = (x - 0.1307) / 0.3081
    return ArrayDataset(x, labels, [str(i) for i in range(10)])


# ---------------------------------------------------------------------------
# CIFAR-10 (python pickles) — reference-quirk normalization (utils.py:374-408)
# ---------------------------------------------------------------------------

def load_cifar10(data_dir: str, split: str) -> ArrayDataset:
    base = os.path.join(data_dir, "cifar-10")
    for sub in ("cifar-10-batches-py", "."):
        cand = os.path.join(base, sub)
        if os.path.exists(os.path.join(cand, "data_batch_1")):
            base = cand
            break
    files = [f"data_batch_{i}" for i in range(1, 6)] if split == "train" else ["test_batch"]
    xs, ys = [], []
    for fn in files:
        with open(os.path.join(base, fn), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        xs.append(d[b"data"])
        ys.extend(d[b"labels"])
    x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1).astype(np.float32) / 255.0
    x = (x - 0.1307) / 0.3081  # reference quirk: MNIST constants on all channels
    names = ["plane", "car", "bird", "cat", "deer", "dog", "frog", "horse", "ship", "truck"]
    return ArrayDataset(x, np.asarray(ys), names)


# ---------------------------------------------------------------------------
# Tiny-ImageNet (directory layout) — raw float32 [0,255] NHWC
# ---------------------------------------------------------------------------

def _decode_image(path: str) -> np.ndarray:
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32)
    return img


def load_tiny_imagenet(data_dir: str, split: str) -> LazyImageDataset:
    root = os.path.join(data_dir, "tiny-imagenet-200")
    with open(os.path.join(root, "wnids.txt")) as f:
        wnids = [l.strip() for l in f if l.strip()]
    wnid_to_idx = {w: i for i, w in enumerate(wnids)}
    paths, labels = [], []
    if split == "train":
        for w in wnids:
            d = os.path.join(root, "train", w, "images")
            for fn in sorted(os.listdir(d)):
                paths.append(os.path.join(d, fn))
                labels.append(wnid_to_idx[w])
    else:
        with open(os.path.join(root, "val", "val_annotations.txt")) as f:
            for line in f:
                parts = line.split("\t")
                paths.append(os.path.join(root, "val", "images", parts[0]))
                labels.append(wnid_to_idx[parts[1]])
    return LazyImageDataset(paths, labels, wnids, _decode_image)


# ---------------------------------------------------------------------------
# ImageNet (ImageFolder layout) — resize 256, center-crop 229, x*255-117
# ---------------------------------------------------------------------------

def imagenet_decode(path: str, crop: int = 229) -> np.ndarray:
    """Lucent-InceptionV1 preprocessing (utils.py:318-329): shorter side to 256,
    center crop 229, then x*255 - 117 on the [0,1]-scaled image — i.e. raw pixel
    values minus 117."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    scale = 256 / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)), Image.BILINEAR)
    w, h = img.size
    left, top = (w - crop) // 2, (h - crop) // 2
    img = img.crop((left, top, left + crop, top + crop))
    return np.asarray(img, dtype=np.float32) - 117.0


def load_imagenet(
    data_dir: str, split: str, class_filter: Optional[str] = None
) -> LazyImageDataset:
    root = os.path.join(data_dir, "imagenet", "train" if split == "train" else "val")
    wnids = sorted(d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
    wnid_to_idx = {w: i for i, w in enumerate(wnids)}
    paths, labels = [], []
    for w in wnids:
        if class_filter is not None and w != class_filter:
            continue
        d = os.path.join(root, w)
        for fn in sorted(os.listdir(d)):
            paths.append(os.path.join(d, fn))
            labels.append(wnid_to_idx[w])
    return LazyImageDataset(paths, labels, wnids, imagenet_decode)


# ---------------------------------------------------------------------------
# factory (reference: utils.py:331-610 load_data)
# ---------------------------------------------------------------------------

def load_data(cfg: RunConfig, class_filter: Optional[str] = None):
    """Returns (train_ds, val_ds, category_names, img_size). Unlike the reference,
    the validation split is real (the reference returns the train loader twice,
    utils.py:610 — documented bug, not replicated)."""
    name = cfg.dataset_name
    if name == "synthetic" or not cfg.data_dir:
        train = make_synthetic(seed=cfg.seed, img_size=get_img_size(name),
                               num_classes=NUM_CLASSES[name])
        val = make_synthetic(num_samples=256, seed=cfg.seed + 1,
                             img_size=get_img_size(name), num_classes=NUM_CLASSES[name])
        return train, val, train.category_names, get_img_size(name)
    if name == "mnist":
        train, val = load_mnist(cfg.data_dir, "train"), load_mnist(cfg.data_dir, "val")
    elif name == "cifar_10":
        train, val = load_cifar10(cfg.data_dir, "train"), load_cifar10(cfg.data_dir, "val")
    elif name == "tiny_imagenet":
        train = load_tiny_imagenet(cfg.data_dir, "train")
        val = load_tiny_imagenet(cfg.data_dir, "val")
    elif name == "imagenet":
        train = load_imagenet(cfg.data_dir, "train", class_filter)
        val = load_imagenet(cfg.data_dir, "val", class_filter)
    else:
        raise ValueError(f"Unsupported dataset: {name}")
    return train, val, train.category_names, get_img_size(name)
