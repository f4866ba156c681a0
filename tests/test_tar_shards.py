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
    caches = list(tmp_path.glob("_svt_index_*.json"))
    assert len(caches) == 1
    stamp = os.path.getmtime(caches[0])
    ds2 = TarShardDataset(tars, ["x"], _raw_decode_bytes)
    assert os.path.getmtime(caches[0]) == stamp  # not rewritten
    assert ds2.entries == ds1.entries
    np.testing.assert_array_equal(ds2.labels, ds1.labels)


def test_tar_index_cache_invalidated_on_regenerated_shards(tmp_path, jpeg_dir):
    """Regenerating shards in place (same names, different content) must NOT be
    read through stale cached offsets — size/mtime stamps invalidate the index."""
    paths, labels = jpeg_dir
    tars = write_tar_shards(paths, labels, str(tmp_path), shard_size=16)
    ds1 = TarShardDataset(tars, ["x"], _raw_decode_bytes)
    last_img = ds1.get_image(len(paths) - 1)  # before the files are overwritten
    # regenerate with a different sample ordering/content under the SAME names
    tars2 = write_tar_shards(paths[::-1], labels[::-1], str(tmp_path), shard_size=16)
    os.utime(tars2[0])  # ensure mtime moves even on coarse filesystems
    ds2 = TarShardDataset(tars2, ["x"], _raw_decode_bytes)
    np.testing.assert_array_equal(ds2.labels, np.asarray(labels[::-1], np.int32))
    # ds2 sample 0 is the reversed list's first item == the original list's last
    np.testing.assert_array_equal(ds2.get_image(0), last_img)


def test_tar_index_cache_split_specific(tmp_path, jpeg_dir):
    """train-*.tar and val-*.tar in one directory keep SEPARATE index caches
    (previously they shared one file and evicted each other every run)."""
    paths, labels = jpeg_dir
    half = len(paths) // 2
    t_train = write_tar_shards(paths[:half], labels[:half], str(tmp_path),
                               shard_size=16, prefix="train")
    t_val = write_tar_shards(paths[half:], labels[half:], str(tmp_path),
                             shard_size=16, prefix="val")
    TarShardDataset(t_train, ["x"], _raw_decode_bytes)
    TarShardDataset(t_val, ["x"], _raw_decode_bytes)
    caches = sorted(tmp_path.glob("_svt_index_*.json"))
    assert len(caches) == 2
    stamps = [os.path.getmtime(c) for c in caches]
    # second construction of both must hit both caches (no rewrites)
    TarShardDataset(t_train, ["x"], _raw_decode_bytes)
    TarShardDataset(t_val, ["x"], _raw_decode_bytes)
    assert [os.path.getmtime(c) for c in caches] == stamps


def test_tar_batches_workers_zero_is_synchronous(tmp_path, jpeg_dir):
    """workers=0 must decode on the consumer thread (documented contract) and
    produce identical batches to the threaded path."""
    import threading

    paths, labels = jpeg_dir
    tars = write_tar_shards(paths, labels, str(tmp_path), shard_size=16)
    main_thread = threading.get_ident()
    seen_threads = set()

    def tracking_decode(data):
        seen_threads.add(threading.get_ident())
        return _raw_decode_bytes(data)

    ds = TarShardDataset(tars, ["x"], tracking_decode)
    sync = list(ds.batches(8, shuffle=True, seed=3, workers=0))
    assert seen_threads == {main_thread}
    ds2 = TarShardDataset(tars, ["x"], _raw_decode_bytes)
    thr = list(ds2.batches(8, shuffle=True, seed=3, workers=4))
    for a, b in zip(sync, thr):
        np.testing.assert_array_equal(a.images, b.images)
        np.testing.assert_array_equal(a.indices, b.indices)


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
