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
  convention, utils.py:318-329) for the CNN family; ViT/CLIP towers instead get
  their HF processors' exact numerics (vit_decode/clip_decode below), selected
  per model by decode_fns_for_model — the reference's own per-backbone
  preprocessing precedent extended to the transformer family
- the reference's val-loader bug (load_data returns train_dataloader twice,
  utils.py:610) is NOT replicated: we return the real validation split.

Batches carry (images, labels, sample_indices) — the `process_batch` contract
(utils.py:2125-2211). The reference's live-experiment artifact of filtering ImageNet to
the flamingo class (utils.py:2163-2168) is exposed as an explicit opt-in filter.
"""

from __future__ import annotations

import glob as _glob
import gzip
import hashlib
import io
import json
import os
import pickle
import struct
import tarfile
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import numpy as np

from sparse_vision_tpu.config import NUM_CLASSES, RunConfig, get_img_size


def _auto_workers(workers: Optional[int]) -> int:
    """None/-1 -> auto (PIL releases the GIL in its C decoders, so threads scale);
    0 -> synchronous decode on the consumer thread."""
    if workers is None or workers < 0:
        return min(16, os.cpu_count() or 8)
    return workers


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

    def batches(
        self, batch_size: int, shuffle: bool, seed: int = 0,
        workers: Optional[int] = 0,
    ) -> Iterator[Batch]:
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
    """File-backed dataset decoding images per batch (ImageNet / Tiny-ImageNet scale).

    Decode is parallelized over a thread pool with a 2-batch lookahead — the TPU-side
    replacement for the reference's DataLoader worker processes (utils.py:354: 5
    workers for Tiny-ImageNet, utils.py:540-547: 8 for ImageNet). PIL's JPEG decoder
    drops the GIL, so threads give near-linear scaling without pickling batches
    across process boundaries."""

    def __init__(self, paths, labels, category_names, decode_fn):
        self.paths = list(paths)
        self.labels = np.asarray(labels, np.int32)
        self.category_names = list(category_names)
        self.decode_fn = decode_fn

    def __len__(self) -> int:
        return len(self.paths)

    def batches(
        self, batch_size: int, shuffle: bool, seed: int = 0,
        workers: Optional[int] = None,
    ) -> Iterator[Batch]:
        n = len(self)
        order = (
            np.random.default_rng(seed).permutation(n) if shuffle else np.arange(n)
        ).astype(np.int32)
        nb = n // batch_size
        w = _auto_workers(workers)
        if w == 0:
            for b in range(nb):
                idx = order[b * batch_size : (b + 1) * batch_size]
                imgs = np.stack([self.decode_fn(self.paths[i]) for i in idx])
                yield Batch(imgs, self.labels[idx], idx)
            return

        lookahead = 2  # batches in flight beyond the one being consumed
        ex = ThreadPoolExecutor(max_workers=w)
        try:
            def submit(b):
                idx = order[b * batch_size : (b + 1) * batch_size]
                return idx, [ex.submit(self.decode_fn, self.paths[i]) for i in idx]

            pending: deque = deque(submit(b) for b in range(min(1 + lookahead, nb)))
            for b in range(nb):
                idx, futs = pending.popleft()
                if b + 1 + lookahead < nb:
                    pending.append(submit(b + 1 + lookahead))
                imgs = np.stack([f.result() for f in futs])
                yield Batch(imgs, self.labels[idx], idx)
        finally:
            ex.shutdown(wait=False, cancel_futures=True)

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

    return _imagenet_transform(Image.open(path), crop)


def imagenet_decode_bytes(data: bytes, crop: int = 229) -> np.ndarray:
    """Same transform from encoded bytes (the tar-shard read path)."""
    from PIL import Image

    return _imagenet_transform(Image.open(io.BytesIO(data)), crop)


def _imagenet_transform(img, crop: int) -> np.ndarray:
    from PIL import Image

    img = img.convert("RGB")
    w, h = img.size
    scale = 256 / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)), Image.BILINEAR)
    w, h = img.size
    left, top = (w - crop) // 2, (h - crop) // 2
    img = img.crop((left, top, left + crop, top + crop))
    return np.asarray(img, dtype=np.float32) - 117.0


def load_imagenet(
    data_dir: str, split: str, class_filter: Optional[str] = None,
    decode_fn=imagenet_decode,
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
    return LazyImageDataset(paths, labels, wnids, decode_fn)


# ---------------------------------------------------------------------------
# ViT / CLIP preprocessing — HF processor numerics, selected per MODEL family
# (the per-backbone-preprocessing precedent is the reference's own InceptionV1
# convention, utils.py:318-329; HF-pretrained towers expect their processors'
# exact pixel statistics, tests/test_vit.py pins both against transformers)
# ---------------------------------------------------------------------------

# HF ViTImageProcessor defaults (IMAGENET_STANDARD_MEAN/STD)
VIT_MEAN = (0.5, 0.5, 0.5)
VIT_STD = (0.5, 0.5, 0.5)
# HF CLIPImageProcessor defaults (OPENAI_CLIP_MEAN/STD)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _rescale_normalize(img, mean, std) -> np.ndarray:
    x = np.asarray(img, np.float32) / 255.0
    return ((x - np.asarray(mean, np.float32))
            / np.asarray(std, np.float32)).astype(np.float32)


def _vit_transform(img, size: int) -> np.ndarray:
    """HF ViTImageProcessor numerics: direct (size, size) BILINEAR resize (no
    aspect-preserving crop), rescale 1/255, normalize mean/std 0.5."""
    from PIL import Image

    img = img.convert("RGB").resize((size, size), Image.BILINEAR)
    return _rescale_normalize(img, VIT_MEAN, VIT_STD)


def _clip_transform(img, size: int) -> np.ndarray:
    """HF CLIPImageProcessor numerics: shortest edge -> size with BICUBIC
    (long side int-truncated, image_transforms.get_resize_output_image_size),
    center crop size x size, rescale 1/255, normalize OpenAI CLIP stats."""
    from PIL import Image

    img = img.convert("RGB")
    w, h = img.size
    short, long = (w, h) if w <= h else (h, w)
    new_short, new_long = size, int(size * long / short)
    nw, nh = (new_short, new_long) if w <= h else (new_long, new_short)
    img = img.resize((nw, nh), Image.BICUBIC)
    left, top = (nw - size) // 2, (nh - size) // 2
    img = img.crop((left, top, left + size, top + size))
    return _rescale_normalize(img, CLIP_MEAN, CLIP_STD)


def vit_decode(path: str, size: int = 224) -> np.ndarray:
    from PIL import Image

    return _vit_transform(Image.open(path), size)


def vit_decode_bytes(data: bytes, size: int = 224) -> np.ndarray:
    from PIL import Image

    return _vit_transform(Image.open(io.BytesIO(data)), size)


def clip_decode(path: str, size: int = 224) -> np.ndarray:
    from PIL import Image

    return _clip_transform(Image.open(path), size)


def clip_decode_bytes(data: bytes, size: int = 224) -> np.ndarray:
    from PIL import Image

    return _clip_transform(Image.open(io.BytesIO(data)), size)


def decode_fns_for_model(model_name: str):
    """(file decode, bytes decode) for the ImageNet path, per backbone family:
    CLIP towers -> CLIPImageProcessor numerics, ViTs -> ViTImageProcessor
    numerics, everything else -> the lucent-InceptionV1 229px convention."""
    base = model_name[:-6] if model_name.endswith("_split") else model_name
    if base.startswith("clip_vit"):
        return clip_decode, clip_decode_bytes
    if base.startswith("vit_"):
        return vit_decode, vit_decode_bytes
    return imagenet_decode, imagenet_decode_bytes


# ---------------------------------------------------------------------------
# Tar shards (webdataset layout) — the reference's production ImageNet format
# (utils.py:520-547: wds.WebDataset over imagenet-train-{0000..0146}.tar with
# .jpg/.cls member pairs, shard+sample shuffling, 8 decode workers)
# ---------------------------------------------------------------------------

_IMG_EXTS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp")


def _scan_tar_shards(tar_paths: Sequence[str]) -> list[list[dict]]:
    """Read tar headers once and return, per shard, the (offset, size, label) of each
    image member. Labels come from the adjacent ``<key>.cls`` member (webdataset
    convention); -1 when absent. The offsets make every later epoch a plain
    seek+read — no tarfile layer on the hot path."""
    shards = []
    for p in tar_paths:
        entries: dict[str, dict] = {}
        with tarfile.open(p, "r:") as tf:  # uncompressed: members are seekable
            for m in tf:
                if not m.isfile():
                    continue
                key, ext = os.path.splitext(m.name)
                ext = ext.lower()
                if ext in _IMG_EXTS:
                    e = entries.setdefault(key, {"label": -1})
                    e["offset"] = m.offset_data
                    e["size"] = m.size
                    e["name"] = m.name
                elif ext == ".cls":
                    f = tf.extractfile(m)
                    entries.setdefault(key, {})["label"] = int(f.read().decode().strip())
        shards.append(
            [e for _, e in sorted(entries.items()) if "offset" in e]
        )
    return shards


def fetch_images(dataset, indices) -> np.ndarray:
    """Random-access image fetch by canonical sample index, across every dataset
    kind: in-memory arrays (.images), tar shards (.get_image), lazy files
    (.paths + .decode_fn). Used by the top-k sample grids and MIS scoring."""
    idx = [int(i) for i in indices]
    if hasattr(dataset, "images"):
        return dataset.images[np.asarray(idx, np.int64)]
    if hasattr(dataset, "get_image"):
        return np.stack([dataset.get_image(i) for i in idx])
    return np.stack([dataset.decode_fn(dataset.paths[i]) for i in idx])


def fetch_images_batches(
    dataset, indices, batch_size: int, workers: Optional[int] = None
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Chunked random-access fetch with thread-pool decode and a 2-chunk lookahead —
    the input-pipeline treatment for passes that embed an arbitrary index set (the
    MIS embedding pass): same decode-parallel pattern as LazyImageDataset.batches,
    but over explicit indices instead of an epoch order.

    Yields ``(chunk_indices [b], images [b, H, W, C])``; the final chunk may be
    shorter."""
    idx = [int(i) for i in indices]
    chunks = [idx[s : s + batch_size] for s in range(0, len(idx), batch_size)]
    if hasattr(dataset, "images"):  # in-memory arrays: no decode cost to hide
        for c in chunks:
            a = np.asarray(c, np.int64)
            yield a, dataset.images[a]
        return
    get = (
        dataset.get_image
        if hasattr(dataset, "get_image")
        else (lambda i: dataset.decode_fn(dataset.paths[i]))
    )
    w = _auto_workers(workers)
    if w == 0:
        for c in chunks:
            yield np.asarray(c, np.int64), np.stack([get(i) for i in c])
        return
    lookahead = 2
    ex = ThreadPoolExecutor(max_workers=w)
    try:
        pending: deque = deque(
            (c, [ex.submit(get, i) for i in c]) for c in chunks[: 1 + lookahead]
        )
        for b in range(len(chunks)):
            c, futs = pending.popleft()
            imgs = np.stack([f.result() for f in futs])
            nxt = b + 1 + lookahead
            if nxt < len(chunks):
                pending.append(
                    (chunks[nxt], [ex.submit(get, i) for i in chunks[nxt]])
                )
            yield np.asarray(c, np.int64), imgs
    finally:
        ex.shutdown(wait=False, cancel_futures=True)


class _Done:
    """Pre-resolved stand-in for a Future (synchronous decode, workers=0)."""

    __slots__ = ("_v",)

    def __init__(self, v):
        self._v = v

    def result(self):
        return self._v


class TarShardDataset:
    """Streaming dataset over uncompressed webdataset-style tar shards.

    On first open the tar headers are scanned into an offset index (cached as
    ``<dir>/_svt_index_<hash>.json`` so 100+-shard datasets don't rescan per run,
    keyed by shard basenames + size/mtime stamps so regenerated shards and sibling
    train/val sets never collide); batches
    then read members with seek+read and decode on a thread pool. Shuffling follows
    the reference's webdataset regime (utils.py:534-543): shard order shuffles per
    epoch, samples shuffle within each shard, and reads stay shard-sequential so the
    IO pattern is still large and linear per shard.

    Sample indices are positions in the canonical (sorted-shard, sorted-key) catalog,
    stable across epochs — the Batch contract top-k/MIS rely on."""

    def __init__(self, tar_paths: Sequence[str], category_names: Sequence[str],
                 decode_bytes_fn=imagenet_decode_bytes, index_cache: Optional[str] = None):
        self.tar_paths = sorted(tar_paths)
        if not self.tar_paths:
            raise ValueError("no tar shards given")
        self.category_names = list(category_names)
        self.decode_bytes_fn = decode_bytes_fn

        # cache identity: basenames + per-file (size, mtime_ns). The size/mtime
        # stamp invalidates the index when shards are REGENERATED in place (stale
        # offsets would silently read wrong members); the basename-set hash in the
        # default file name keeps train/val shard sets in one directory from
        # evicting each other's index.
        basenames = [os.path.basename(p) for p in self.tar_paths]
        stamps = [[os.path.getsize(p), os.stat(p).st_mtime_ns] for p in self.tar_paths]
        cache = index_cache
        if cache is None:
            tag = hashlib.md5("\0".join(basenames).encode()).hexdigest()[:10]
            cache = os.path.join(
                os.path.dirname(self.tar_paths[0]), f"_svt_index_{tag}.json"
            )
        self.entries = None
        if cache and os.path.exists(cache):
            with open(cache) as f:
                idx = json.load(f)
            if idx.get("tar_paths") == basenames and idx.get("stamps") == stamps:
                self.entries = idx["shards"]
        if self.entries is None:
            self.entries = _scan_tar_shards(self.tar_paths)
            if cache:
                tmp = cache + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(
                        {
                            "tar_paths": basenames,
                            "stamps": stamps,
                            "shards": self.entries,
                        },
                        f,
                    )
                os.replace(tmp, cache)

        # canonical global index per sample + labels array (Batch contract)
        self._base = np.cumsum([0] + [len(s) for s in self.entries])
        self.labels = np.asarray(
            [e["label"] for s in self.entries for e in s], np.int32
        )

    def __len__(self) -> int:
        return int(self._base[-1])

    def num_batches(self, batch_size: int) -> int:
        return len(self) // batch_size

    def get_image(self, i: int) -> np.ndarray:
        """Random access by canonical sample index — the integrated equivalent of the
        reference's extract-activating-images-from-tars step (utils.py:2367-2445),
        used by the top-k sample grids (eval_tools/viz.gather_topk_images)."""
        si = int(np.searchsorted(self._base, i, side="right") - 1)
        e = self.entries[si][i - int(self._base[si])]
        with open(self.tar_paths[si], "rb") as f:
            f.seek(e["offset"])
            data = f.read(e["size"])
        return self.decode_bytes_fn(data)

    def batches(
        self, batch_size: int, shuffle: bool, seed: int = 0,
        workers: Optional[int] = None,
    ) -> Iterator[Batch]:
        rng = np.random.default_rng(seed)
        shard_order = np.arange(len(self.tar_paths))
        if shuffle:
            rng.shuffle(shard_order)
        w = _auto_workers(workers)
        if w == 0:
            # honor the documented synchronous contract (_auto_workers: 0 -> decode
            # on the consumer thread) — same as LazyImageDataset
            ex = None
            submit = lambda fn, a: _Done(fn(a))  # noqa: E731
        else:
            ex = ThreadPoolExecutor(max_workers=w)
            submit = ex.submit
        try:
            buf: list = []  # (future, label, global_idx) spilling across shards

            def drain(min_keep: int):
                # keep >= min_keep decode futures in flight behind the yielded batch
                while len(buf) >= batch_size + min_keep:
                    chunk = buf[:batch_size]
                    del buf[:batch_size]
                    imgs = np.stack([f.result() for f, _, _ in chunk])
                    labels = np.asarray([l for _, l, _ in chunk], np.int32)
                    idx = np.asarray([i for _, _, i in chunk], np.int32)
                    yield Batch(imgs, labels, idx)

            lookahead = 2 * batch_size
            for si in shard_order:
                entries = self.entries[si]
                order = np.arange(len(entries))
                if shuffle:
                    rng.shuffle(order)
                with open(self.tar_paths[si], "rb") as f:
                    for j in order:
                        e = entries[j]
                        f.seek(e["offset"])
                        data = f.read(e["size"])
                        buf.append(
                            (
                                submit(self.decode_bytes_fn, data),
                                e["label"],
                                int(self._base[si]) + int(j),
                            )
                        )
                        if len(buf) > batch_size + lookahead:
                            yield from drain(lookahead)
            yield from drain(0)
            # trailing partial batch dropped (drop_last semantics, utils.py:335-338)
        finally:
            if ex is not None:
                ex.shutdown(wait=False, cancel_futures=True)


def write_tar_shards(
    paths: Sequence[str], labels: Sequence[int], out_dir: str,
    shard_size: int = 1024, prefix: str = "train",
) -> list[str]:
    """Pack image files + labels into webdataset-style tar shards
    (``<key>.jpg`` + ``<key>.cls`` pairs) — the converter from ImageFolder layout to
    the reference's production format (utils.py:520-526)."""
    os.makedirs(out_dir, exist_ok=True)
    out_paths = []
    for s in range(0, len(paths), shard_size):
        op = os.path.join(out_dir, f"{prefix}-{s // shard_size:05d}.tar")
        # write to a temp name and rename on completion: tarfile.open creates
        # the file immediately, so a process killed mid-write would otherwise
        # leave a truncated shard that satisfies existence globs but fails at
        # decode time (ADVICE r4)
        tmp = op + ".tmp"
        with tarfile.open(tmp, "w") as tf:
            for i in range(s, min(s + shard_size, len(paths))):
                key = f"{i:08d}"
                ext = os.path.splitext(paths[i])[1].lower() or ".jpg"
                with open(paths[i], "rb") as f:
                    data = f.read()
                info = tarfile.TarInfo(key + ext)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cls = str(int(labels[i])).encode()
                info = tarfile.TarInfo(key + ".cls")
                info.size = len(cls)
                tf.addfile(info, io.BytesIO(cls))
        os.replace(tmp, op)
        out_paths.append(op)
    return out_paths


def load_imagenet_tars(
    data_dir: str, split: str, decode_bytes_fn=imagenet_decode_bytes
) -> Optional[TarShardDataset]:
    """ImageNet from tar shards when present: ``<data_dir>/imagenet/<split>*.tar``
    (also accepts the reference's ``imagenet-train-NNNN.tar`` naming). Returns None
    when no shards exist so load_data can fall back to ImageFolder."""
    base = os.path.join(data_dir, "imagenet")
    pats = [
        os.path.join(base, f"{split}*.tar"),
        os.path.join(base, f"imagenet-{split}-*.tar"),
        os.path.join(base, "shards", f"{split}*.tar"),
    ]
    tars: list[str] = []
    for p in pats:
        tars = sorted(_glob.glob(p))
        if tars:
            break
    if not tars:
        return None
    names_file = os.path.join(base, "wnids.txt")
    if os.path.exists(names_file):
        with open(names_file) as f:
            names = [l.strip() for l in f if l.strip()]
    else:
        names = [str(i) for i in range(NUM_CLASSES["imagenet"])]
    return TarShardDataset(tars, names, decode_bytes_fn)


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
        # production format first: webdataset tar shards (utils.py:520-547); fall
        # back to ImageFolder. The class filter needs per-class file listing, so it
        # stays on the folder path. Decode is MODEL-aware: ViT/CLIP towers get
        # their HF-processor transforms, CNNs the InceptionV1 229px convention.
        dec, dec_bytes = decode_fns_for_model(cfg.model_name)
        train = None if class_filter else load_imagenet_tars(
            cfg.data_dir, "train", dec_bytes)
        val = None if class_filter else load_imagenet_tars(
            cfg.data_dir, "val", dec_bytes)
        if train is None:
            train = load_imagenet(cfg.data_dir, "train", class_filter, dec)
        if val is None:
            val = load_imagenet(cfg.data_dir, "val", class_filter, dec)
    else:
        raise ValueError(f"Unsupported dataset: {name}")
    return train, val, train.category_names, get_img_size(name, cfg.model_name)
