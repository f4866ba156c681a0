"""Native C++ shard reader tests: build, exact payload roundtrip vs numpy, cache
integration, and error propagation. Skipped when no C++ toolchain is present."""

import os

import numpy as np
import pytest

from sparse_vision_tpu.data import native_io

pytestmark = pytest.mark.skipif(
    native_io.build_native() is None, reason="no C++ toolchain"
)


def _write_shards(tmp_path, shapes, seed=0):
    rng = np.random.default_rng(seed)
    paths, arrays = [], []
    for i, shp in enumerate(shapes):
        a = rng.normal(size=shp).astype(np.float32)
        p = str(tmp_path / f"acts_{i:05d}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    return paths, arrays


def test_native_iterator_roundtrip(tmp_path):
    paths, arrays = _write_shards(tmp_path, [(128, 16), (128, 16), (64, 16)])
    it = native_io.NativeShardIterator(paths)
    got = [np.array(shard) for shard in it]  # copy: views are recycled
    assert len(got) == 3
    for g, a in zip(got, arrays):
        np.testing.assert_array_equal(g, a)


def test_native_iterator_many_shards_ring_reuse(tmp_path):
    # more shards than ring buffers forces slot recycling
    paths, arrays = _write_shards(tmp_path, [(32, 8)] * 10)
    it = native_io.NativeShardIterator(paths, n_buffers=2)
    for shard, a in zip(it, arrays):
        np.testing.assert_array_equal(np.array(shard), a)


def test_native_missing_file_raises(tmp_path):
    paths, _ = _write_shards(tmp_path, [(16, 4)])
    # metadata read happens in python; break the file AFTER constructing metadata
    it = native_io.NativeShardIterator(paths + paths)  # same file twice
    first = np.array(next(it))
    assert first.shape == (16, 4)
    os.remove(paths[0])
    # worker may or may not have buffered the second copy already; accept either
    try:
        np.array(next(it))
    except (IOError, StopIteration):
        pass


def test_cache_native_path_matches_numpy(tmp_path):
    import jax

    from sparse_vision_tpu.data.activation_cache import ActivationCache, dump_activations
    from sparse_vision_tpu.data.datasets import make_synthetic
    from sparse_vision_tpu.models.backbone import make_backbone

    net = make_backbone("custom_cnn_1", "cifar_10")
    params, state = net.init(jax.random.key(0), (32, 32, 3))
    ds = make_synthetic(num_samples=8, img_size=(32, 32, 3))
    dump_activations(net, params, state, ds, "relu1", str(tmp_path), batch_size=4,
                     shard_tokens=2048)
    cache = ActivationCache(str(tmp_path))
    a = np.concatenate([np.array(b) for b in cache.batches(1024, prefetch="native")])
    b = np.concatenate(list(cache.batches(1024, prefetch=False)))
    np.testing.assert_array_equal(a, b)
