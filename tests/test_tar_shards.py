"""Tar-shard (webdataset layout) ingestion + parallel decode tests: exact parity with
the file-backed path, deterministic shuffling, stable global indices, index caching,
and the ImageFolder->shards converter (reference production format, utils.py:520-547)."""

import io
import os

import numpy as np
import pytest

from sparse_vision_tpu.data.datasets import (
    LazyImageDataset,
    TarShardDataset,
    load_imagenet_tars,
    write_tar_shards,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _raw_decode_path(path):
    return np.asarray(Image.open(path).convert("RGB"), np.float32)


def _raw_decode_bytes(data):
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.float32)


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths, labels = [], []
    for i in range(40):
        arr = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        p = str(d / f"img_{i:03d}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
        labels.append(i % 10)
    return paths, labels


def test_tar_roundtrip_matches_files(tmp_path, jpeg_dir):
    paths, labels = jpeg_dir
    tars = write_tar_shards(paths, labels, str(tmp_path), shard_size=16)
    assert len(tars) == 3  # 16 + 16 + 8

    ds = TarShardDataset(tars, [str(i) for i in range(10)], _raw_decode_bytes)
    ref = LazyImageDataset(paths, labels, [str(i) for i in range(10)], _raw_decode_path)
    assert len(ds) == len(ref) == 40

    got = list(ds.batches(8, shuffle=False))
    want = list(ref.batches(8, shuffle=False, workers=0))
    assert len(got) == len(want) == 5
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g.images, w.images)
        np.testing.assert_array_equal(g.labels, w.labels)
        np.testing.assert_array_equal(g.indices, w.indices)


def test_tar_shuffle_deterministic_and_covers(tmp_path, jpeg_dir):
    paths, labels = jpeg_dir
    tars = write_tar_shards(paths, labels, str(tmp_path), shard_size=16)
    ds = TarShardDataset(tars, [str(i) for i in range(10)], _raw_decode_bytes)

    a = list(ds.batches(8, shuffle=True, seed=7))
    b = list(ds.batches(8, shuffle=True, seed=7))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.indices, y.indices)
        np.testing.assert_array_equal(x.images, y.images)
    idx = np.concatenate([x.indices for x in a])
    assert len(np.unique(idx)) == len(idx) == 40  # full epoch, no dupes
    # labels consistent with the canonical catalog
    for x in a:
        np.testing.assert_array_equal(x.labels, ds.labels[x.indices])
    # a different seed gives a different order
    c = list(ds.batches(8, shuffle=True, seed=8))
    assert any(
        not np.array_equal(x.indices, y.indices) for x, y in zip(a, c)
    )


def test_tar_index_cache_reused(tmp_path, jpeg_dir):
    paths, labels = jpeg_dir
    tars = write_tar_shards(paths, labels, str(tmp_path), shard_size=16)
    ds1 = TarShardDataset(tars, ["x"], _raw_decode_bytes)
    cache = tmp_path / "_svt_index.json"
    assert cache.exists()
    stamp = os.path.getmtime(cache)
    ds2 = TarShardDataset(tars, ["x"], _raw_decode_bytes)
    assert os.path.getmtime(cache) == stamp  # not rewritten
    assert ds2.entries == ds1.entries
    np.testing.assert_array_equal(ds2.labels, ds1.labels)


def test_lazy_parallel_decode_matches_sync(jpeg_dir):
    paths, labels = jpeg_dir
    ref = LazyImageDataset(paths, labels, ["x"], _raw_decode_path)
    a = list(ref.batches(8, shuffle=True, seed=1, workers=0))
    b = list(ref.batches(8, shuffle=True, seed=1, workers=4))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.images, y.images)
        np.testing.assert_array_equal(x.indices, y.indices)


def test_lazy_parallel_decode_error_propagates(jpeg_dir):
    paths, labels = jpeg_dir
    broken = list(paths)
    broken[3] = broken[3] + ".does_not_exist"
    ref = LazyImageDataset(broken, labels, ["x"], _raw_decode_path)
    with pytest.raises(FileNotFoundError):
        list(ref.batches(8, shuffle=False, workers=4))


def test_load_imagenet_tars_discovery(tmp_path, jpeg_dir):
    paths, labels = jpeg_dir
    base = tmp_path / "imagenet"
    write_tar_shards(paths, labels, str(base), shard_size=16, prefix="train")
    (base / "wnids.txt").write_text("\n".join(f"n{i:08d}" for i in range(10)))
    ds = load_imagenet_tars(str(tmp_path), "train", _raw_decode_bytes)
    assert ds is not None and len(ds) == 40
    assert ds.category_names[0] == "n00000000"
    assert load_imagenet_tars(str(tmp_path), "val", _raw_decode_bytes) is None
