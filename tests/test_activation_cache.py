"""ActivationCache error-path contract: a bad shard (missing/truncated) must raise
promptly on the consumer, never hang it (the round-1 weak spot: the prefetch producer
died without its sentinel and the consumer blocked on q.get() forever)."""

import json
import os
import threading

import numpy as np
import pytest

from sparse_vision_tpu.data.activation_cache import ActivationCache


def _make_cache(tmp_path, n_shards=3, tokens=64, dim=8):
    rng = np.random.default_rng(0)
    for i in range(n_shards):
        np.save(tmp_path / f"acts_{i:05d}.npy", rng.normal(size=(tokens, dim)).astype(np.float32))
    meta = {
        "layer": "relu1",
        "dim": dim,
        "num_shards": n_shards,
        "total_tokens": n_shards * tokens,
        "shard_tokens": tokens,
        "dtype": "float32",
    }
    (tmp_path / "meta.json").write_text(json.dumps(meta))
    return ActivationCache(str(tmp_path))


def _consume_with_timeout(gen, timeout=30.0):
    """Drain gen on a worker thread; return (finished, exception)."""
    result = {"exc": None, "done": False}

    def run():
        try:
            for _ in gen:
                pass
        except BaseException as e:  # noqa: BLE001
            result["exc"] = e
        result["done"] = True

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout)
    return result["done"], result["exc"]


@pytest.mark.parametrize("break_mode", ["missing", "truncated"])
def test_prefetch_bad_shard_raises_promptly(tmp_path, break_mode):
    cache = _make_cache(tmp_path)
    victim = tmp_path / "acts_00001.npy"
    if break_mode == "missing":
        os.remove(victim)
    else:
        raw = victim.read_bytes()
        victim.write_bytes(raw[: len(raw) // 2])

    done, exc = _consume_with_timeout(cache.batches(32, prefetch=True))
    assert done, "consumer hung on a bad shard instead of raising"
    assert exc is not None
    assert isinstance(exc, (IOError, ValueError, EOFError))


def test_prefetch_happy_path_matches_sync(tmp_path):
    cache = _make_cache(tmp_path)
    a = np.concatenate(list(cache.batches(32, prefetch=True)))
    b = np.concatenate(list(cache.batches(32, prefetch=False)))
    np.testing.assert_array_equal(a, b)


def test_prefetch_shuffled_matches_sync_same_seed(tmp_path):
    cache = _make_cache(tmp_path)
    a = np.concatenate(list(cache.batches(32, shuffle=True, seed=3, prefetch=True)))
    b = np.concatenate(list(cache.batches(32, shuffle=True, seed=3, prefetch=False)))
    np.testing.assert_array_equal(a, b)


def test_prefetch_abandoned_generator_releases_producer(tmp_path):
    """Closing the batches() generator early must unblock the producer thread
    (stop-event contract, same as data/prefetch.py) — previously it stayed parked
    on q.put forever, pinning a full shard copy."""
    import threading
    import time

    cache = _make_cache(tmp_path)
    before = set(threading.enumerate())
    gen = cache.batches(32, prefetch=True)
    next(gen)  # producer running, likely parked on the size-1 queue
    gen.close()
    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline:
        leaked = [t for t in set(threading.enumerate()) - before if t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"producer thread leaked: {leaked}"


def test_stacks_cover_same_tokens_as_batches(tmp_path):
    """stacks(tps, k) visits exactly the tokens batches(tps) visits (same shuffle
    regime at coarser granularity), full stacks first-dimension k, tail smaller."""
    cache = _make_cache(tmp_path)
    tps, k = 32, 4
    stacked = list(cache.stacks(tps, k, shuffle=False))
    flat = np.concatenate([s.reshape(-1, s.shape[-1]) for s in stacked])
    ref = np.concatenate(list(cache.batches(tps, shuffle=False)))
    np.testing.assert_array_equal(flat, ref)
    assert all(s.shape[1] == tps for s in stacked)
    assert all(s.shape[0] == k for s in stacked[:-1])


def test_stacks_aligned_path_is_zero_copy(tmp_path):
    """When k*tps divides the shard size, full stacks are views into the shard
    buffer (no per-dispatch assembly copy)."""
    cache = _make_cache(tmp_path)
    st = int(cache.meta["shard_tokens"])
    tps = st // 4
    k = 4  # k*tps == shard_tokens -> one zero-copy stack per shard
    for s in cache.stacks(tps, k, shuffle=False, prefetch=False):
        if s.shape[0] == k:
            assert s.base is not None  # a view, not an owning copy


def test_stacks_shuffled_cover_all_tokens(tmp_path):
    cache = _make_cache(tmp_path)
    tps, k = 32, 3  # unaligned k: falls back to assembly, still full coverage
    stacked = list(cache.stacks(tps, k, shuffle=True, seed=5))
    flat = np.concatenate([s.reshape(-1, s.shape[-1]) for s in stacked])
    ref = np.concatenate(list(cache.batches(tps, shuffle=False)))
    # same token SET (order differs under shuffle): compare sorted rows
    np.testing.assert_array_equal(
        np.sort(flat.ravel()), np.sort(ref.ravel())
    )


def test_stacks_aligned_path_short_last_shard(tmp_path):
    """The aligned zero-copy path's tail branch: a SHORT last shard contributes its
    whole steps via the (copying) cross-shard tail buffer; coverage still matches
    batches() exactly."""
    cache = _make_cache(tmp_path)
    st = int(cache.meta["shard_tokens"])
    # pick tps/k so block == shard_tokens (aligned) and a short last shard exists
    tps = st // 2
    k = 2
    stacked = list(cache.stacks(tps, k, shuffle=False, prefetch=False))
    flat = np.concatenate([s.reshape(-1, s.shape[-1]) for s in stacked])
    ref = np.concatenate(list(cache.batches(tps, shuffle=False, prefetch=False)))
    np.testing.assert_array_equal(flat, ref)
    # buffered tail rows must be OWNING copies (native-reader views die at the
    # next shard); owning arrays have base None after np.stack of copies
    for s in stacked:
        arr = np.asarray(s)
        assert arr.dtype == ref.dtype


def test_stream_stacks_matches_sequential(tmp_path):
    """stream_stacks over queued shard paths yields exactly the cache's tokens in
    dump order, with remainder carry across shards and drop_last at the tail."""
    import queue

    from sparse_vision_tpu.data.activation_cache import stream_stacks

    cache = _make_cache(tmp_path, n_shards=3, tokens=64, dim=8)
    q = queue.Queue()
    for p in cache.shard_paths:
        q.put(p)
    q.put(None)
    # tps=16, k=2 -> block=32 divides 64: zero-copy whole-shard path
    stacks = list(stream_stacks(q, 16, 2))
    got = np.concatenate([s.reshape(-1, 8) for s in stacks])
    want = np.concatenate([np.load(p) for p in cache.shard_paths])
    np.testing.assert_array_equal(got, want)

    # tps=24, k=2 -> block=48: remainder 16 tokens carries into the next shard;
    # 192 total tokens -> 4 full stacks of 48 (192 = 4*48), no tail
    q2 = queue.Queue()
    for p in cache.shard_paths:
        q2.put(p)
    q2.put(None)
    stacks = list(stream_stacks(q2, 24, 2))
    got = np.concatenate([s.reshape(-1, 8) for s in stacks])
    np.testing.assert_array_equal(got, want[: got.shape[0]])
    assert got.shape[0] == 192


def test_stream_stacks_forwards_producer_error(tmp_path):
    import queue

    from sparse_vision_tpu.data.activation_cache import stream_stacks

    q = queue.Queue()
    q.put(RuntimeError("dump died"))
    with pytest.raises(RuntimeError, match="dump died"):
        list(stream_stacks(q, 16, 2))


def test_overlap_dump_train_pipeline(tmp_path):
    """overlap_dump_train=True trains the first epoch while the dump writes, leaves a
    byte-identical cache on disk, and later epochs read the completed cache."""
    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.pipeline import Pipeline

    def cfg(d, **kw):
        return RunConfig(
            model_name="custom_mlp_9", sae_layer="fc1", dataset_name="synthetic",
            directory_path=str(d), sae_epochs=2, sae_batch_size=64, batch_size=64,
            dead_neurons_steps=100, use_activation_cache=True,
            cache_tokens_per_step=512, log_every=1000, **kw,
        )

    p_seq = Pipeline(cfg(tmp_path / "seq"))
    p_seq.run()
    p_ovl = Pipeline(cfg(tmp_path / "ovl", overlap_dump_train=True))
    p_ovl.run()
    assert int(p_ovl.ts.step) == int(p_seq.ts.step) > 0

    def cache_dir(p):
        return os.path.join(p.paths["evaluation_results"], "activation_cache", "fc1")

    seq_dir, ovl_dir = cache_dir(p_seq), cache_dir(p_ovl)
    shards = sorted(f for f in os.listdir(seq_dir) if f.endswith(".npy"))
    assert shards == sorted(f for f in os.listdir(ovl_dir) if f.endswith(".npy"))
    for f in shards:
        a = open(os.path.join(seq_dir, f), "rb").read()
        b = open(os.path.join(ovl_dir, f), "rb").read()
        assert a == b, f"shard {f} differs between sequential and overlapped dump"
    assert not any(f.endswith(".tmp") for f in os.listdir(ovl_dir))


def _mk_pipeline(d, **kw):
    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.pipeline import Pipeline

    return Pipeline(RunConfig(
        model_name="custom_mlp_9", sae_layer="fc1", dataset_name="synthetic",
        directory_path=str(d), sae_epochs=1, sae_batch_size=64, batch_size=64,
        dead_neurons_steps=100, use_activation_cache=True,
        cache_tokens_per_step=512, log_every=1000, **kw,
    ))


@pytest.mark.parametrize("dtype_name", ["float32", "bfloat16"])
def test_multi_dump_byte_matches_per_layer(tmp_path, dtype_name):
    """dump_activations_multi's per-layer caches are byte-identical to running
    dump_activations once per layer with the same arguments — the contract that
    lets Pipeline/ActivationCache consume multi-dumped caches unchanged. bf16
    covers the device-side storage cast (round-to-nearest-even on device)."""
    import ml_dtypes

    from sparse_vision_tpu.data.activation_cache import (
        dump_activations,
        dump_activations_multi,
    )

    dtype = ml_dtypes.bfloat16 if dtype_name == "bfloat16" else np.float32
    p = _mk_pipeline(tmp_path / "probe")
    layers = ["fc1", "fc2"]
    single = {}
    for l in layers:
        single[l] = dump_activations(
            p.net, p.frozen_params, p.net_state, p.train_ds, l,
            str(tmp_path / "single" / l), batch_size=64, shard_tokens=1024,
            dtype=dtype,
        )
    multi = dump_activations_multi(
        p.net, p.frozen_params, p.net_state, p.train_ds, layers,
        {l: str(tmp_path / "multi" / l) for l in layers},
        batch_size=64, shard_tokens=1024, dtype=dtype,
    )
    for l in layers:
        assert multi[l] == single[l]
        sdir, mdir = tmp_path / "single" / l, tmp_path / "multi" / l
        files = sorted(f.name for f in sdir.iterdir())
        assert files == sorted(f.name for f in mdir.iterdir())
        for f in files:
            assert (sdir / f).read_bytes() == (mdir / f).read_bytes(), \
                f"{l}/{f} differs between single- and multi-layer dump"
    # different layers genuinely differ (fc1 width 128 vs fc2 width 10)
    assert multi["fc1"]["dim"] != multi["fc2"]["dim"]


def test_train_saes_multilayer_one_pass(tmp_path, monkeypatch):
    """train_saes_multilayer dumps all missing layer caches with ONE
    dump_activations_multi call (one backbone pass), then trains each layer's SAE
    from its cache; per-layer results and caches land in the standard locations."""
    import sparse_vision_tpu.train.multilayer as ml
    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.data.activation_cache import dump_activations_multi

    calls = []

    def counting_dump(*args, **kw):
        calls.append(args[4])  # the layers list
        return dump_activations_multi(*args, **kw)

    monkeypatch.setattr(
        "sparse_vision_tpu.data.activation_cache.dump_activations_multi",
        counting_dump,
    )

    base = RunConfig(
        model_name="custom_mlp_9", sae_layer="fc1", dataset_name="synthetic",
        directory_path=str(tmp_path), sae_epochs=1, sae_batch_size=64,
        batch_size=64, dead_neurons_steps=100, use_activation_cache=True,
        cache_tokens_per_step=512, log_every=1000,
    )
    results = ml.train_saes_multilayer(base, layers=["fc1", "fc2"])

    assert calls == [["fc1", "fc2"]], "expected exactly one multi-layer dump pass"
    assert set(results) == {"fc1", "fc2"}
    for l, res in results.items():
        assert res and "sae_rec_loss" in res, f"layer {l} returned no eval results"
    evald = os.path.join(str(tmp_path), "custom_mlp_9", "synthetic",
                         "evaluation_results_sae_mlp", "activation_cache")
    for l in ("fc1", "fc2"):
        assert os.path.exists(os.path.join(evald, l, "meta.json"))

    # idempotent: a second call finds the caches and does not dump again
    ml.train_saes_multilayer(base, layers=["fc1", "fc2"])
    assert len(calls) == 1
