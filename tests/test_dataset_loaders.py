"""Dataset-loader tests against synthetic ON-DISK fixtures in the real formats:
MNIST idx files, CIFAR-10 python pickles, Tiny-ImageNet directory layout, ImageNet
ImageFolder layout — verifying the reference's exact normalizations and the batch
contract (drop_last, sample indices)."""

import gzip
import os
import pickle
import struct

import numpy as np
import pytest
from PIL import Image

from sparse_vision_tpu.data import datasets as D


def _write_idx_images(path, arr):
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 0x00000803))
        f.write(struct.pack(">3I", *arr.shape))
        f.write(arr.astype(np.uint8).tobytes())


def _write_idx_labels(path, arr):
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 0x00000801))
        f.write(struct.pack(">I", arr.shape[0]))
        f.write(arr.astype(np.uint8).tobytes())


def test_mnist_idx_loader(tmp_path, rng):
    base = tmp_path / "mnist"
    os.makedirs(base)
    imgs = rng.integers(0, 256, (10, 28, 28)).astype(np.uint8)
    labels = rng.integers(0, 10, 10).astype(np.uint8)
    _write_idx_images(base / "train-images-idx3-ubyte", imgs)
    _write_idx_labels(base / "train-labels-idx1-ubyte", labels)
    # gzipped variant for the eval split (both spellings must resolve)
    with gzip.open(base / "t10k-images-idx3-ubyte.gz", "wb") as f:
        f.write(open(base / "train-images-idx3-ubyte", "rb").read())
    with gzip.open(base / "t10k-labels-idx1-ubyte.gz", "wb") as f:
        f.write(open(base / "train-labels-idx1-ubyte", "rb").read())

    ds = D.load_mnist(str(tmp_path), "train")
    assert ds.images.shape == (10, 28, 28, 1)
    # normalization: (x/255 - 0.1307)/0.3081 (utils.py:429-433)
    expected = (imgs[0].astype(np.float32)[..., None] / 255.0 - 0.1307) / 0.3081
    np.testing.assert_allclose(ds.images[0], expected, rtol=1e-5)
    np.testing.assert_array_equal(ds.labels, labels)
    val = D.load_mnist(str(tmp_path), "val")
    assert len(val) == 10  # gz variant loads too

    # batch contract: drop_last + sample indices
    batches = list(ds.batches(4, shuffle=False))
    assert len(batches) == 2  # 10 // 4, last 2 dropped
    np.testing.assert_array_equal(batches[0].indices, [0, 1, 2, 3])


def test_cifar10_pickle_loader(tmp_path, rng):
    base = tmp_path / "cifar-10" / "cifar-10-batches-py"
    os.makedirs(base)
    n = 4
    for i in range(1, 6):
        data = rng.integers(0, 256, (n, 3 * 32 * 32)).astype(np.uint8)
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": list(range(n))}, f)
    with open(base / "test_batch", "wb") as f:
        pickle.dump({b"data": rng.integers(0, 256, (n, 3072)).astype(np.uint8),
                     b"labels": [0] * n}, f)

    ds = D.load_cifar10(str(tmp_path), "train")
    assert ds.images.shape == (20, 32, 32, 3)
    assert len(D.load_cifar10(str(tmp_path), "val")) == n
    # reference quirk: MNIST constants applied on every channel (utils.py:374-408)
    assert abs(float(ds.images.mean()) - (0.5 - 0.1307) / 0.3081) < 0.3


def _png(path, size, color):
    Image.new("RGB", size, color).save(path)


def test_tiny_imagenet_layout(tmp_path):
    root = tmp_path / "tiny-imagenet-200"
    wnids = ["n01443537", "n01629819"]
    (root / "val" / "images").mkdir(parents=True)
    with open(root / "wnids.txt", "w") as f:
        f.write("\n".join(wnids) + "\n")
    for w in wnids:
        d = root / "train" / w / "images"
        d.mkdir(parents=True)
        for i in range(3):
            _png(d / f"{w}_{i}.JPEG", (64, 64), (i * 40, 10, 10))
    with open(root / "val" / "val_annotations.txt", "w") as f:
        for i, w in enumerate(wnids):
            _png(root / "val" / "images" / f"val_{i}.JPEG", (64, 64), (0, 100, 0))
            f.write(f"val_{i}.JPEG\t{w}\t0\t0\t10\t10\n")

    train = D.load_tiny_imagenet(str(tmp_path), "train")
    val = D.load_tiny_imagenet(str(tmp_path), "val")
    assert len(train) == 6 and len(val) == 2
    b = next(train.batches(4, shuffle=False))
    assert b.images.shape == (4, 64, 64, 3)
    # raw float32 [0, 255] — NO normalization (the reference constructs the dataset
    # with transform=None, utils.py:353-357)
    assert b.images.max() > 1.5
    assert set(val.labels.tolist()) == {0, 1}


def test_imagenet_imagefolder_layout_and_transform(tmp_path):
    root = tmp_path / "imagenet" / "train"
    for w, color in [("n01440764", (200, 0, 0)), ("n01443537", (0, 200, 0))]:
        (root / w).mkdir(parents=True)
        for i in range(2):
            _png(root / w / f"{w}_{i}.JPEG", (300, 280), color)
    (tmp_path / "imagenet" / "val").mkdir()
    for w in ["n01440764"]:
        (tmp_path / "imagenet" / "val" / w).mkdir()
        _png(tmp_path / "imagenet" / "val" / w / "v.JPEG", (260, 260), (1, 2, 3))

    ds = D.load_imagenet(str(tmp_path), "train")
    assert len(ds) == 4
    b = next(ds.batches(2, shuffle=False))
    # lucent transform: resize-256 -> crop-229 -> pixels - 117 (utils.py:318-329)
    assert b.images.shape == (2, 229, 229, 3)
    np.testing.assert_allclose(b.images[0, 0, 0], [200 - 117, -117, -117], atol=2)

    # explicit class filter (the reference's flamingo artifact as an opt-in)
    only = D.load_imagenet(str(tmp_path), "train", class_filter="n01443537")
    assert len(only) == 2 and set(only.labels.tolist()) == {1}


def test_fetch_images_batches_lazy_and_memory(tmp_path):
    """fetch_images_batches yields the same images as fetch_images, chunked, with
    decode parallelized (the MIS embedding pass's input pipeline)."""
    root = tmp_path / "imagenet" / "train"
    w = "n01440764"
    (root / w).mkdir(parents=True)
    for i in range(7):
        _png(root / w / f"{w}_{i}.JPEG", (240, 240), (10 * i, 0, 0))
    (tmp_path / "imagenet" / "val").mkdir()

    ds = D.load_imagenet(str(tmp_path), "train")  # LazyImageDataset
    want = [5, 0, 3, 6, 1]
    ref = D.fetch_images(ds, want)
    for workers in (0, 2):
        got_idx, got = [], []
        for ci, imgs in D.fetch_images_batches(ds, want, 2, workers=workers):
            got_idx.extend(ci.tolist())
            got.append(imgs)
        assert got_idx == want
        assert [a.shape[0] for a in got] == [2, 2, 1]  # final chunk shorter
        np.testing.assert_array_equal(np.concatenate(got), ref)

    # in-memory branch
    class Mem:
        images = np.arange(5 * 2 * 2 * 1, dtype=np.float32).reshape(5, 2, 2, 1)

    (ci,), (imgs,) = zip(*D.fetch_images_batches(Mem(), [4, 2, 0], 3))
    np.testing.assert_array_equal(ci, [4, 2, 0])
    np.testing.assert_array_equal(imgs, Mem.images[[4, 2, 0]])
