"""Transcoder variant (beyond-reference; Dunefsky et al. 2024): a sparse
dictionary mapping layer A's activations to layer B's, trained from the
framework's paired one-pass activation caches (train/transcoder.py)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.models.sae import (
    init_transcoder,
    transcoder_apply,
    transcoder_inference_and_loss,
)
from sparse_vision_tpu.train.pipeline import Pipeline


def test_transcoder_forward_numpy_golden():
    k = jax.random.key(0)
    d_in, ef, d_out, t = 8, 4, 5, 32
    params = init_transcoder(k, d_in, ef, d_out)
    assert params["W_enc"].shape == (d_in, d_in * ef)
    assert params["W_dec"].shape == (d_in * ef, d_out)
    # decoder rows unit-norm (ConstrainedAdam invariant holds from init)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(params["W_dec"]), axis=1), 1.0, atol=1e-6
    )
    x = np.random.RandomState(0).randn(t, d_in).astype(np.float32)
    enc, y_hat, pre = transcoder_apply(params, jnp.asarray(x))
    p = {k_: np.asarray(v) for k_, v in params.items()}
    pre_np = x @ p["W_enc"] + p["b_enc"]
    enc_np = np.maximum(pre_np, 0.0)
    y_np = enc_np @ p["W_dec"] + p["b_dec"]
    np.testing.assert_allclose(np.asarray(pre), pre_np, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(enc), enc_np, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y_hat), y_np, rtol=1e-5, atol=1e-6)

    # loss terms: MSE against the TARGET + L1 on the code
    y_tgt = np.random.RandomState(1).randn(t, d_out).astype(np.float32)
    out = transcoder_inference_and_loss(params, jnp.asarray(x), jnp.asarray(y_tgt), 0.5)
    np.testing.assert_allclose(
        float(out["rec_loss"]), np.mean((y_np - y_tgt) ** 2), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(out["loss"]),
        np.mean((y_np - y_tgt) ** 2) + 0.5 * np.mean(np.abs(enc_np)), rtol=1e-5,
    )


def test_transcoder_token_count_mismatch_raises():
    params = init_transcoder(jax.random.key(0), 8, 2, 5)
    x = jnp.zeros((4, 3, 8))  # 12 tokens
    y = jnp.zeros((4, 2, 5))  # 8 tokens
    with pytest.raises(ValueError, match="token count"):
        transcoder_inference_and_loss(params, x, y, 0.1)


def test_resample_with_rectangular_decoder():
    """Dead-latent resampling with d_out != d_in (the d_out-aware surgery in
    ops/resample.py): dead rows are replaced, all rows return to unit norm."""
    import optax

    from sparse_vision_tpu.ops.resample import resample_dead_neurons

    params = init_transcoder(jax.random.key(0), 8, 4, 5)
    h = 32
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    dead = np.zeros(h, bool)
    dead[[3, 7, 20]] = True
    before = np.asarray(params["W_dec"]).copy()
    new_p, _ = resample_dead_neurons(params, opt_state, jnp.asarray(dead),
                                     jax.random.key(5))
    after = np.asarray(new_p["W_dec"])
    assert after.shape == (h, 5)
    np.testing.assert_allclose(np.linalg.norm(after, axis=1), 1.0, atol=1e-5)
    assert not np.allclose(after[3], before[3])  # dead row replaced
    np.testing.assert_allclose(after[0], before[0], atol=1e-6)  # live row kept


def _cfg(d, **kw):
    defaults = dict(
        model_name="custom_mlp_8", sae_model_name="transcoder",
        sae_layer="fc1", transcoder_target_layer="fc2",
        dataset_name="synthetic", directory_path=str(d),
        sae_epochs=2, sae_batch_size=64, batch_size=64,
        sae_learning_rate=1e-3, sae_optimizer_name="constrained_adam",
        sae_lambda_sparse=0.05, sae_expansion_factor=2,
        dead_neurons_steps=10_000, use_activation_cache=True,
        cache_tokens_per_step=64, log_every=1000,
    )
    defaults.update(kw)
    return RunConfig(**defaults)


def test_transcoder_pipeline_e2e(tmp_path):
    """Full cached transcoder run on custom_mlp_8 (fc1 [32] -> fc2 [16]): paired
    caches from one pass, reconstruction improves, eval/checkpoint/export
    artifacts land."""
    from sparse_vision_tpu.eval_tools.results import read_results
    from sparse_vision_tpu.train import checkpoint as ckpt

    pipe = Pipeline(_cfg(tmp_path))
    assert pipe.sae_params["W_enc"].shape == (32, 64)
    assert pipe.sae_params["W_dec"].shape == (64, 16)
    before = pipe.eval_modified(epoch=0, store=False)
    result = pipe.run()
    assert int(pipe.ts.step) > 0
    assert result["sae_rec_loss"] < before["sae_rec_loss"], (before, result)
    # the transcoder predicts the target layer: variance explained must move
    # from ~nothing toward positive
    assert result["var_expl"] > before["var_expl"]
    # ConstrainedAdam invariant on the OUTPUT-space decoder
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pipe.ts.params["W_dec"]), axis=1), 1.0, atol=1e-4
    )
    # both layer caches exist (one backbone pass)
    for layer in ("fc1", "fc2"):
        assert os.path.exists(
            os.path.join(pipe._cache_dir(layer), "meta.json")
        ), layer
    assert ckpt.latest_epoch(pipe._sae_ckpt_dir()) == 2
    csv_path = os.path.join(pipe.paths["evaluation_results"], "sae_eval_results.csv")
    rows = read_results(csv_path)
    assert any(r["epochs"] == 2 for r in rows)


def test_transcoder_skip_splice_identity(tmp_path):
    """Sanity anchor for the segment-skip splice: feeding the TRUE target
    activations through apply_segment(after=target) reproduces the original
    logits exactly — the transcoder's eval path with a perfect prediction."""
    pipe = Pipeline(_cfg(tmp_path))
    b = next(pipe.val_ds.batches(16, shuffle=False))
    logits, taps, _ = pipe.net.apply(pipe.frozen_params, jnp.asarray(b.images),
                                     state=pipe.net_state)
    logits_skip = pipe.net.apply_segment(
        pipe.frozen_params, taps["fc2"], after="fc2",
        upto=pipe.net.stage_names[-1], state=pipe.net_state,
    )
    np.testing.assert_allclose(np.asarray(logits_skip), np.asarray(logits), atol=1e-6)


def test_transcoder_data_mesh_matches_single_device(tmp_path):
    """GSPMD data-parallel transcoder training (mesh_shape=(8,)) matches the
    single-device run."""
    p1 = Pipeline(_cfg(tmp_path / "single", sae_epochs=1))
    r1 = p1.run()
    p8 = Pipeline(_cfg(tmp_path / "mesh", sae_epochs=1, mesh_shape=(8,),
                       cache_tokens_per_step=64))
    p8.frozen_params, p8.net_state = p1.frozen_params, p1.net_state
    r8 = p8.run()
    assert int(p8.ts.step) == int(p1.ts.step) > 0
    for k in ("sae_rec_loss", "sae_loss", "sparsity"):
        np.testing.assert_allclose(float(r8[k]), float(r1[k]), rtol=1e-4, err_msg=k)


def test_transcoder_tensor_parallel_matches_single_device(tmp_path):
    """(2, 4)-mesh TP transcoder (fused interpret kernels, latent dim sharded
    over 'model', TP resample) matches the single-device stock run."""
    p1 = Pipeline(_cfg(tmp_path / "single", sae_epochs=1, dead_neurons_steps=3))
    r1 = p1.run()
    ptp = Pipeline(_cfg(tmp_path / "tp", sae_epochs=1, dead_neurons_steps=3,
                        mesh_shape=(2, 4), cache_tokens_per_step=64))
    ptp.frozen_params, ptp.net_state = p1.frozen_params, p1.net_state
    rtp = ptp.run()
    assert int(ptp.ts.step) == int(p1.ts.step) > 0
    for k in ("sae_rec_loss", "sae_loss", "perc_dead_units", "sparsity"):
        np.testing.assert_allclose(float(rtp[k]), float(r1[k]), rtol=1e-4, err_msg=k)
    # the latent axis is genuinely sharded over 'model'
    shard_rows = {s.data.shape[0] for s in ptp.ts.params["W_dec"].addressable_shards}
    assert shard_rows == {ptp.num_units // 4}, shard_rows


def test_transcoder_int8_cache(tmp_path):
    """Transcoder training from int8 paired caches (host-dequant read path)
    stays close to the float32-cache run."""
    p32 = Pipeline(_cfg(tmp_path / "f32", sae_epochs=1))
    r32 = p32.run()
    p8 = Pipeline(_cfg(tmp_path / "i8", sae_epochs=1, cache_dtype="int8"))
    p8.frozen_params, p8.net_state = p32.frozen_params, p32.net_state
    r8 = p8.run()
    assert int(p8.ts.step) == int(p32.ts.step) > 0
    assert r8["sae_rec_loss"] == pytest.approx(r32["sae_rec_loss"], rel=0.05)


def test_transcoder_target_layer_in_run_identity():
    """Two transcoders reading the same layer but predicting different ones must
    not collide on checkpoints/results/exports (run identity includes the
    target; plain SAE identities are unchanged)."""
    import dataclasses

    from sparse_vision_tpu.utils.paths import run_id, sae_params_no_epochs

    a = _cfg("/tmp/unused")
    b = dataclasses.replace(a, transcoder_target_layer="fc3")
    assert run_id(a) != run_id(b)
    assert (tuple(sae_params_no_epochs(a).values())
            != tuple(sae_params_no_epochs(b).values()))
    plain = dataclasses.replace(a, sae_model_name="sae_mlp",
                                transcoder_target_layer="")
    assert "to-" not in run_id(plain)


def test_transcoder_mismatched_cache_geometry_rejected(tmp_path):
    """An input cache inherited from a run with a different tokens-per-step
    geometry must be rejected, not silently mispaired."""
    p1 = Pipeline(_cfg(tmp_path, cache_tokens_per_step=64, sae_epochs=1))
    p1.run()  # dumps fc1 + fc2 at the 64-tps shard geometry
    import shutil

    shutil.rmtree(p1._cache_dir("fc2"))  # fc2 will re-dump at the new geometry
    p2 = Pipeline(_cfg(tmp_path, cache_tokens_per_step=96, sae_epochs=1))
    with pytest.raises(ValueError, match="shard_tokens"):
        p2.run()


def test_transcoder_validation(tmp_path):
    with pytest.raises(ValueError, match="transcoder_target_layer"):
        Pipeline(_cfg(tmp_path, transcoder_target_layer=""))
    with pytest.raises(ValueError, match="use_activation_cache"):
        Pipeline(_cfg(tmp_path / "b", use_activation_cache=False)).train_sae()


def test_transcoder_overlap_dump_train(tmp_path):
    """overlap_dump_train=True streams the first epoch from the overlapped
    paired dump (zipped aligned shard queues), leaves byte-identical caches on
    disk, and later epochs read the completed caches."""
    p_seq = Pipeline(_cfg(tmp_path / "seq"))
    p_seq.run()
    p_ovl = Pipeline(_cfg(tmp_path / "ovl", overlap_dump_train=True))
    p_ovl.run()
    assert int(p_ovl.ts.step) == int(p_seq.ts.step) > 0
    for layer in ("fc1", "fc2"):
        seq_dir = p_seq._cache_dir(layer)
        ovl_dir = p_ovl._cache_dir(layer)
        shards = sorted(f for f in os.listdir(seq_dir) if f.endswith(".npy"))
        assert shards == sorted(
            f for f in os.listdir(ovl_dir) if f.endswith(".npy")
        )
        for f in shards:
            a = open(os.path.join(seq_dir, f), "rb").read()
            b = open(os.path.join(ovl_dir, f), "rb").read()
            assert a == b, f"{layer}/{f} differs between sequential and overlapped"


def test_transcoder_overlap_partial_cache_falls_back(tmp_path):
    """When only SOME caches exist, overlap mode dumps the missing ones
    sequentially (a fresh stream cannot zip against an existing cache) and the
    run still completes."""
    import shutil

    p1 = Pipeline(_cfg(tmp_path, sae_epochs=1))
    p1.run()
    shutil.rmtree(p1._cache_dir("fc2"))
    p2 = Pipeline(_cfg(tmp_path, sae_epochs=1, overlap_dump_train=True,
                       sae_learning_rate=2e-3))
    p2.run()
    assert int(p2.ts.step) > 0


def test_transcoder_pairs_googlenet_geometry():
    """Eligible circuit pairs = adjacent layers with matching SPATIAL dims:
    the registry's 8 circuit layers (which skip mixed4a, interp/registry.py)
    give 5 pairs — the two pool-crossing adjacencies (mixed3b->mixed4b at
    28->14 and mixed4e->mixed5a at 14->7) are excluded; a transcoder is a
    per-token map (models/sae.transcoder_inference_and_loss)."""
    from sparse_vision_tpu.models.backbone import make_backbone
    from sparse_vision_tpu.train.multilayer import transcoder_pairs

    net = make_backbone("inceptionv1", "imagenet")
    pairs = transcoder_pairs(net, "imagenet")
    assert pairs == [
        ("mixed3a", "mixed3b"),
        ("mixed4b", "mixed4c"), ("mixed4c", "mixed4d"),
        ("mixed4d", "mixed4e"),
        ("mixed5a", "mixed5b"),
    ]


def test_train_transcoders_multilayer(tmp_path):
    """One backbone pass dumps all three layer caches; two transcoders
    (fc1->fc2, fc2->fc3) train from the shared caches with per-pair run
    identities and results."""
    from sparse_vision_tpu.models.backbone import make_backbone
    from sparse_vision_tpu.train.multilayer import (
        train_transcoders_multilayer,
        transcoder_pairs,
    )

    base = RunConfig(
        model_name="custom_mlp_3", dataset_name="synthetic",
        directory_path=str(tmp_path), sae_epochs=1, sae_batch_size=64,
        batch_size=64, sae_expansion_factor=2, dead_neurons_steps=10_000,
        use_activation_cache=True, cache_tokens_per_step=64, log_every=1000,
        sae_optimizer_name="constrained_adam",
    )
    net = make_backbone("custom_mlp_3", "synthetic")
    pairs = transcoder_pairs(net, "synthetic", ["fc1", "fc2", "fc3"])
    assert pairs == [("fc1", "fc2"), ("fc2", "fc3")]  # MLP taps share geometry
    results = train_transcoders_multilayer(
        base, pairs=pairs, use_registry=False
    )
    assert set(results) == {("fc1", "fc2"), ("fc2", "fc3")}
    for pair, r in results.items():
        assert np.isfinite(r["sae_rec_loss"]), pair
    # one dump: all three caches exist and share geometry
    p = Pipeline(dataclasses.replace(
        base, sae_model_name="transcoder", sae_layer="fc1",
        transcoder_target_layer="fc2",
    ))
    import json as _json

    metas = []
    for layer in ("fc1", "fc2", "fc3"):
        mp = os.path.join(p._cache_dir(layer), "meta.json")
        assert os.path.exists(mp), layer
        with open(mp) as f:
            metas.append(_json.load(f))
    assert len({m["total_tokens"] for m in metas}) == 1
