"""int8 activation cache (cache_dtype="int8"): symmetric per-shard per-channel
quantization on dump, device-side dequantization in the train step.

Halves cache disk bytes AND the per-epoch host->device transfer vs bfloat16 —
the recurring cost of cached SAE training (the dump runs once, training reads
every epoch). Max per-element error is absmax/254 per (shard, channel)."""

import json
import os

import numpy as np
import pytest

from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.data.activation_cache import (
    ActivationCache,
    dequantize_int8,
    dump_activations,
    quantize_int8,
)
from sparse_vision_tpu.train.pipeline import Pipeline


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    # heterogeneous channel scales + exact zeros (post-ReLU-like)
    x = rng.normal(size=(512, 16)).astype(np.float32) * np.logspace(-3, 2, 16)
    x[x < 0] = 0.0
    q, scale = quantize_int8(x)
    assert q.dtype == np.int8 and scale.shape == (16,)
    deq = dequantize_int8(q, scale)
    # per-channel error bound: half a quantization step
    assert np.all(np.abs(deq - x) <= scale / 2 + 1e-9)
    # exact zeros survive exactly (scale floor keeps all-zero channels at 0)
    assert np.all(deq[x == 0.0] == 0.0)
    zcol = np.zeros((64, 3), np.float32)
    qz, sz = quantize_int8(zcol)
    assert np.all(dequantize_int8(qz, sz) == 0.0)


def _cfg(d, **kw):
    defaults = dict(
        model_name="custom_mlp_9", sae_layer="fc1", dataset_name="synthetic",
        directory_path=str(d), sae_epochs=1, sae_batch_size=64, batch_size=64,
        dead_neurons_steps=100, use_activation_cache=True,
        cache_tokens_per_step=512, log_every=1000,
    )
    defaults.update(kw)
    return RunConfig(**defaults)


def test_int8_dump_and_read_paths(tmp_path):
    """An int8 dump writes int8 shards + scale sidecars; host reads dequantize to
    float32 within the quantization bound of an f32 dump of the SAME data; the
    device path's (int8, scale) pairs dequantize to exactly the host path."""
    p32 = Pipeline(_cfg(tmp_path / "f32"))
    d32 = os.path.join(p32.paths["evaluation_results"], "activation_cache", "fc1")
    dump_activations(p32.net, p32.frozen_params, p32.net_state, p32.train_ds,
                     "fc1", d32, batch_size=64, shard_tokens=1024)

    p8 = Pipeline(_cfg(tmp_path / "i8", cache_dtype="int8"))
    # same synthetic data + same frozen backbone weights => same activations
    p8.frozen_params, p8.net_state = p32.frozen_params, p32.net_state
    d8 = os.path.join(p8.paths["evaluation_results"], "activation_cache", "fc1")
    dump_activations(p8.net, p8.frozen_params, p8.net_state, p8.train_ds,
                     "fc1", d8, batch_size=64, shard_tokens=1024, dtype="int8")

    meta = json.loads(open(os.path.join(d8, "meta.json")).read())
    assert meta["dtype"] == "int8"
    shards = sorted(f for f in os.listdir(d8) if f.startswith("acts_"))
    scales = sorted(f for f in os.listdir(d8) if f.startswith("scales_"))
    assert len(shards) == len(scales) == meta["num_shards"]
    raw = np.load(os.path.join(d8, shards[0]))
    assert raw.dtype == np.int8
    # ~4x smaller than the float32 shards
    sz8 = os.path.getsize(os.path.join(d8, shards[0]))
    sz32 = os.path.getsize(os.path.join(d32, shards[0]))
    assert sz8 < 0.3 * sz32

    c32, c8 = ActivationCache(d32), ActivationCache(d8)
    assert not c32.quantized and c8.quantized
    b32 = list(c32.batches(512, prefetch=False))
    b8 = list(c8.batches(512, prefetch=False))
    assert b8[0].dtype == np.float32
    for a, b, i in zip(b32, b8, range(len(b32))):
        # int8 round-trips through a device-side bf16 cast before quantization;
        # bound = bf16 rounding (~0.4%) + half a quantization step per channel
        step = c8.scale(i * 512 // 1024)
        assert np.all(np.abs(a - b) <= np.abs(a) * 8e-3 + step / 2 + 1e-6)

    # device path: (int8, scale) pairs; dequantized == host path exactly
    dev = list(c8.stacks(512, 2, prefetch=False, dequantize="device"))
    host = list(c8.stacks(512, 2, prefetch=False))
    assert len(dev) == len(host)
    for (q, s), h in zip(dev, host):
        assert q.dtype == np.int8 and s.shape == (q.shape[-1],)
        np.testing.assert_array_equal(dequantize_int8(q, s), np.asarray(h))


def test_int8_pipeline_trains_close_to_f32(tmp_path):
    """End-to-end cached training from an int8 cache (device dequant in the jitted
    step) converges to within a few percent of the float32-cache run."""
    p32 = Pipeline(_cfg(tmp_path / "f32", sae_epochs=2))
    r32 = p32.run()
    p8 = Pipeline(_cfg(tmp_path / "i8", cache_dtype="int8", sae_epochs=2))
    p8.frozen_params, p8.net_state = p32.frozen_params, p32.net_state
    r8 = p8.run()
    assert int(p8.ts.step) == int(p32.ts.step) > 0
    assert r8["sae_rec_loss"] == pytest.approx(r32["sae_rec_loss"], rel=0.05)
    assert r8["sparsity"] == pytest.approx(r32["sparsity"], rel=0.05)


def test_int8_overlap_dump_train(tmp_path):
    """overlap_dump_train + int8: the streamed first epoch host-dequantizes, later
    epochs use the device path; the on-disk cache matches the sequential dump."""
    p_seq = Pipeline(_cfg(tmp_path / "seq", cache_dtype="int8", sae_epochs=2))
    p_seq.run()
    p_ovl = Pipeline(_cfg(tmp_path / "ovl", cache_dtype="int8", sae_epochs=2,
                          overlap_dump_train=True))
    p_ovl.frozen_params, p_ovl.net_state = p_seq.frozen_params, p_seq.net_state
    p_ovl.run()
    assert int(p_ovl.ts.step) == int(p_seq.ts.step) > 0

    def cache_dir(p):
        return os.path.join(p.paths["evaluation_results"], "activation_cache", "fc1")

    seq_dir, ovl_dir = cache_dir(p_seq), cache_dir(p_ovl)
    files = sorted(f for f in os.listdir(seq_dir) if f.endswith(".npy"))
    assert files == sorted(f for f in os.listdir(ovl_dir) if f.endswith(".npy"))
    for f in files:  # shards AND scale sidecars byte-match
        a = open(os.path.join(seq_dir, f), "rb").read()
        b = open(os.path.join(ovl_dir, f), "rb").read()
        assert a == b, f"{f} differs between sequential and overlapped int8 dump"


def test_int8_sharded_mesh_pipeline(tmp_path):
    """int8 cached training under the 8-device data mesh: the scale is placed
    replicated, tokens shard — exercises _put_scale + the GSPMD dequant step."""
    p = Pipeline(_cfg(tmp_path, cache_dtype="int8", mesh_shape=(8,),
                      cache_tokens_per_step=512))
    r = p.run()
    assert int(p.ts.step) > 0 and np.isfinite(r["sae_rec_loss"])


def test_int8_tensor_parallel_pipeline(tmp_path):
    """int8 cache under the (2, 4) tensor-parallel mesh: the dequant wrapper
    composes over the TP step (latent-sharded state, token-sharded int8 input,
    replicated scale) and matches the single-device int8 run."""
    p1 = Pipeline(_cfg(tmp_path / "single", cache_dtype="int8", sae_epochs=2))
    r1 = p1.run()
    ptp = Pipeline(_cfg(tmp_path / "tp", cache_dtype="int8", sae_epochs=2,
                        mesh_shape=(2, 4), cache_tokens_per_step=512))
    ptp.frozen_params, ptp.net_state = p1.frozen_params, p1.net_state
    rtp = ptp.run()
    assert int(ptp.ts.step) == int(p1.ts.step) > 0
    for k in ("sae_rec_loss", "sae_loss", "perc_dead_units"):
        np.testing.assert_allclose(rtp[k], r1[k], rtol=1e-4, err_msg=k)
