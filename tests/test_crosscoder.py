"""Crosscoder variant (beyond-reference; Lindsey et al. 2024 "Sparse
Crosscoders for Cross-Layer Features and Model Diffing"): one sparse latent
space shared across L layers, trained from the framework's aligned one-pass
multi-layer activation caches (train/crosscoder.py)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.models.crosscoder import (
    crosscoder_apply,
    crosscoder_decoder_norms,
    crosscoder_inference_and_loss,
    init_crosscoder,
)
from sparse_vision_tpu.train.pipeline import Pipeline


def test_crosscoder_forward_numpy_golden():
    k = jax.random.key(0)
    dims, ef, t = (8, 5, 3), 4, 32
    h = dims[0] * ef
    params = init_crosscoder(k, dims, ef)
    assert params["b_enc"].shape == (h,)
    for i, d in enumerate(dims):
        assert params[f"W_enc_{i}"].shape == (d, h)
        assert params[f"W_dec_{i}"].shape == (h, d)
        # per-layer decoder rows start at norm 1/L (free thereafter)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(params[f"W_dec_{i}"]), axis=1),
            1.0 / len(dims), atol=1e-6,
        )
    rs = np.random.RandomState(0)
    xs = tuple(rs.randn(t, d).astype(np.float32) for d in dims)
    enc, dec, pre = crosscoder_apply(params, tuple(jnp.asarray(x) for x in xs))
    p = {k_: np.asarray(v) for k_, v in params.items()}
    pre_np = sum(x @ p[f"W_enc_{i}"] for i, x in enumerate(xs)) + p["b_enc"]
    z_np = np.maximum(pre_np, 0.0)
    np.testing.assert_allclose(np.asarray(pre), pre_np, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(enc), z_np, rtol=1e-5, atol=1e-6)
    for i in range(len(dims)):
        y_np = z_np @ p[f"W_dec_{i}"] + p[f"b_dec_{i}"]
        np.testing.assert_allclose(np.asarray(dec[i]), y_np, rtol=1e-5, atol=1e-6)

    # loss: summed per-layer MSE + decoder-norm-weighted L1
    lam = 0.5
    out = crosscoder_inference_and_loss(
        params, tuple(jnp.asarray(x) for x in xs), lam
    )
    rec_np = sum(
        np.mean((z_np @ p[f"W_dec_{i}"] + p[f"b_dec_{i}"] - xs[i]) ** 2)
        for i in range(len(dims))
    )
    n_j = sum(
        np.linalg.norm(p[f"W_dec_{i}"], axis=1) for i in range(len(dims))
    )
    l1_np = np.mean(z_np * n_j[None, :])
    np.testing.assert_allclose(float(out["rec_loss"]), rec_np, rtol=1e-5)
    np.testing.assert_allclose(float(out["l1_loss"]), l1_np, rtol=1e-5)
    np.testing.assert_allclose(
        float(out["loss"]), rec_np + lam * l1_np, rtol=1e-5
    )


def test_crosscoder_init_l1_matches_plain_l1():
    """At init every n_j = 1 (rows at 1/L summed over L), so the weighted L1
    equals mean|z| — sae_lambda_sparse transfers across variants."""
    params = init_crosscoder(jax.random.key(1), (16, 12), 4)
    x0 = np.random.RandomState(2).randn(64, 16).astype(np.float32)
    x1 = np.random.RandomState(3).randn(64, 12).astype(np.float32)
    out = crosscoder_inference_and_loss(
        params, (jnp.asarray(x0), jnp.asarray(x1)), 0.1
    )
    enc = np.asarray(out["encoded"])
    np.testing.assert_allclose(
        float(out["l1_loss"]), np.mean(np.abs(enc)), rtol=1e-5
    )


def test_crosscoder_token_count_mismatch_raises():
    params = init_crosscoder(jax.random.key(0), (8, 5), 2)
    x0 = jnp.zeros((4, 3, 8))  # 12 tokens
    x1 = jnp.zeros((4, 2, 5))  # 8 tokens
    with pytest.raises(ValueError, match="token count"):
        crosscoder_inference_and_loss(params, (x0, x1), 0.1)


def test_crosscoder_resample():
    """Dead latents are re-initialized in EVERY layer's encoder/decoder slices,
    live slices are untouched, decoder norms are NOT forced to unit (they carry
    the diffing signal), and Adam moments of dead slices are zeroed."""
    import optax

    from sparse_vision_tpu.ops.resample import resample_dead_neurons_crosscoder

    dims, ef = (8, 5), 4
    h = dims[0] * ef
    params = init_crosscoder(jax.random.key(0), dims, ef)
    # give layer-0 decoder rows a distinctive scale so "no renorm" is testable
    params["W_dec_0"] = params["W_dec_0"] * 3.0
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    # fake nonzero moments
    opt_state = jax.tree.map(jnp.ones_like, opt_state)
    dead = np.zeros(h, bool)
    dead[[3, 7, 20]] = True
    before = jax.device_get(params)
    new_p, new_o = resample_dead_neurons_crosscoder(
        params, opt_state, jnp.asarray(dead), jax.random.key(5)
    )
    for i in range(len(dims)):
        w_dec = np.asarray(new_p[f"W_dec_{i}"])
        w_enc = np.asarray(new_p[f"W_enc_{i}"])
        assert not np.allclose(w_dec[3], before[f"W_dec_{i}"][3])
        assert not np.allclose(w_enc[:, 3], before[f"W_enc_{i}"][:, 3])
        np.testing.assert_allclose(w_dec[0], before[f"W_dec_{i}"][0], atol=1e-6)
        np.testing.assert_allclose(
            w_enc[:, 0], before[f"W_enc_{i}"][:, 0], atol=1e-6
        )
        # dead rows land at the LIVE mean norm of that layer — not at unit
        live_norms = np.linalg.norm(np.asarray(before[f"W_dec_{i}"]), axis=1)
        live_mean = live_norms[~dead].mean()
        np.testing.assert_allclose(
            np.linalg.norm(w_dec[3]), live_mean, rtol=1e-4
        )
    # Adam moments of the dead slices are zeroed, live kept
    adam = [s for s in jax.tree.leaves(
        new_o, is_leaf=lambda s: isinstance(s, optax.ScaleByAdamState)
    ) if isinstance(s, optax.ScaleByAdamState)]
    mu = adam[0].mu
    assert float(np.asarray(mu["b_enc"])[3]) == 0.0
    assert float(np.asarray(mu["b_enc"])[0]) == 1.0
    assert np.all(np.asarray(mu["W_dec_1"])[3] == 0.0)
    assert np.all(np.asarray(mu["W_enc_1"])[:, 3] == 0.0)
    assert np.all(np.asarray(mu["W_dec_1"])[0] == 1.0)


def _cfg(d, **kw):
    defaults = dict(
        model_name="custom_mlp_3", sae_model_name="crosscoder",
        sae_layer="fc1", crosscoder_layers="fc2,fc3",
        dataset_name="synthetic", directory_path=str(d),
        sae_epochs=2, sae_batch_size=64, batch_size=64,
        sae_learning_rate=1e-3, sae_optimizer_name="adam",
        sae_lambda_sparse=0.05, sae_expansion_factor=2,
        dead_neurons_steps=10_000, use_activation_cache=True,
        cache_tokens_per_step=64, log_every=1000,
    )
    defaults.update(kw)
    return RunConfig(**defaults)


def test_crosscoder_pipeline_e2e(tmp_path):
    """Full cached crosscoder run on custom_mlp_3 (fc1 [64] + fc2 [32] + fc3
    [16]): aligned caches from one pass, reconstruction improves, eval /
    checkpoint / export / decoder-norm-CSV artifacts land."""
    from sparse_vision_tpu.eval_tools.results import read_results
    from sparse_vision_tpu.train import checkpoint as ckpt

    pipe = Pipeline(_cfg(tmp_path))
    h = 64 * 2
    assert pipe.num_units == h
    assert pipe.sae_params["W_enc_0"].shape == (64, h)
    assert pipe.sae_params["W_dec_2"].shape == (h, 16)
    before = pipe.eval_modified(epoch=0, store=False)
    result = pipe.run()
    assert int(pipe.ts.step) > 0
    assert result["sae_rec_loss"] < before["sae_rec_loss"], (before, result)
    # the splice replaces the DEEPEST layer (fc3) with its reconstruction:
    # the spliced model's divergence from the original drops as training
    # proceeds (per-layer var_expl alone wobbles under the weighted-L1 shrink
    # pressure at these tiny scales — KLD is the faithful-splice signal)
    assert result["kld"] < before["kld"], (before, result)
    # all three layer caches exist (one backbone pass)
    for layer in ("fc1", "fc2", "fc3"):
        assert os.path.exists(
            os.path.join(pipe._cache_dir(layer), "meta.json")
        ), layer
    assert ckpt.latest_epoch(pipe._sae_ckpt_dir()) == 2
    csv_path = os.path.join(pipe.paths["evaluation_results"], "sae_eval_results.csv")
    rows = read_results(csv_path)
    assert any(r["epochs"] == 2 for r in rows)
    # the model-diffing readout landed next to the exported weights
    folder = pipe.paths["sae_weights"]
    norms_csvs = [f for f in os.listdir(folder) if f.endswith("_decoder_norms.csv")]
    assert norms_csvs, os.listdir(folder)
    import pandas as pd

    df = pd.read_csv(os.path.join(folder, norms_csvs[0]))
    assert len(df) == h
    for layer in ("fc1", "fc2", "fc3"):
        assert f"norm_{layer}" in df and f"share_{layer}" in df
    shares = df[[f"share_{l}" for l in ("fc1", "fc2", "fc3")]].to_numpy()
    np.testing.assert_allclose(shares.sum(axis=1), 1.0, atol=1e-6)
    # native npz export round-trips
    npzs = [f for f in os.listdir(folder) if f.endswith(".npz")]
    assert npzs
    from sparse_vision_tpu.train.sae_io import import_any

    loaded = import_any(os.path.join(folder, npzs[0]), "crosscoder",
                        like=jax.device_get(pipe.ts.params))
    np.testing.assert_allclose(
        np.asarray(loaded["W_dec_1"]), np.asarray(pipe.ts.params["W_dec_1"]),
        atol=1e-7,
    )


def test_crosscoder_torch_state_dict_round_trip():
    from sparse_vision_tpu.train.sae_io import (
        _normalize_state_dict,
        to_torch_state_dict,
    )

    params = jax.device_get(init_crosscoder(jax.random.key(0), (8, 5, 3), 2))
    sd = to_torch_state_dict(params, "crosscoder")
    assert sd["encoder_0.weight"].shape == (16, 8)
    assert sd["decoder_2.weight"].shape == (3, 16)
    back = _normalize_state_dict(sd, "crosscoder")
    for k, v in params.items():
        np.testing.assert_allclose(back[k], np.asarray(v), atol=1e-7, err_msg=k)


def test_crosscoder_validation(tmp_path):
    # missing crosscoder_layers
    with pytest.raises(ValueError, match="crosscoder_layers"):
        Pipeline(_cfg(tmp_path, crosscoder_layers=""))
    # wrong depth order (sae_layer must be shallowest, list ascending)
    with pytest.raises(ValueError, match="depth order"):
        Pipeline(_cfg(tmp_path, sae_layer="fc2", crosscoder_layers="fc1,fc3"))
    # duplicate layer
    with pytest.raises(ValueError, match="distinct"):
        Pipeline(_cfg(tmp_path, crosscoder_layers="fc1,fc3"))
    # ConstrainedAdam would erase the decoder-norm diffing signal
    with pytest.raises(ValueError, match="plain optimizer"):
        Pipeline(_cfg(tmp_path, sae_optimizer_name="constrained_adam")).run()


def test_crosscoder_layers_in_run_identity():
    from sparse_vision_tpu.utils.paths import run_id, sae_params_no_epochs

    a = _cfg("/tmp/unused")
    b = dataclasses.replace(a, crosscoder_layers="fc2")
    assert run_id(a) != run_id(b)
    assert (tuple(sae_params_no_epochs(a).values())
            != tuple(sae_params_no_epochs(b).values()))
    plain = dataclasses.replace(a, sae_model_name="sae_mlp", crosscoder_layers="")
    assert "-x-" not in run_id(plain)


def test_crosscoder_tensor_parallel_matches_single_device(tmp_path):
    """(2, 4)-mesh TP crosscoder (fused interpret cat-space kernels, latent dim
    sharded over 'model', TP multi-layer resample) matches the single-device
    stock run across a resample boundary."""
    p1 = Pipeline(_cfg(tmp_path / "single", sae_epochs=1, dead_neurons_steps=3))
    r1 = p1.run()
    ptp = Pipeline(_cfg(tmp_path / "tp", sae_epochs=1, dead_neurons_steps=3,
                        mesh_shape=(2, 4)))
    ptp.frozen_params, ptp.net_state = p1.frozen_params, p1.net_state
    rtp = ptp.run()
    assert int(ptp.ts.step) == int(p1.ts.step) > 0
    for k in ("sae_rec_loss", "sae_loss", "perc_dead_units", "sparsity"):
        np.testing.assert_allclose(float(rtp[k]), float(r1[k]), rtol=1e-4, err_msg=k)
    # the latent axis is genuinely sharded over 'model' in every layer's params
    for key in ("W_dec_0", "W_dec_2"):
        shard_rows = {s.data.shape[0]
                      for s in ptp.ts.params[key].addressable_shards}
        assert shard_rows == {ptp.num_units // 4}, (key, shard_rows)


def test_crosscoder_data_mesh_matches_single_device(tmp_path):
    """GSPMD data-parallel crosscoder training (mesh_shape=(8,)) matches the
    single-device run."""
    p1 = Pipeline(_cfg(tmp_path / "single", sae_epochs=1))
    r1 = p1.run()
    p8 = Pipeline(_cfg(tmp_path / "mesh", sae_epochs=1, mesh_shape=(8,)))
    p8.frozen_params, p8.net_state = p1.frozen_params, p1.net_state
    r8 = p8.run()
    assert int(p8.ts.step) == int(p1.ts.step) > 0
    for k in ("sae_rec_loss", "sae_loss", "sparsity"):
        np.testing.assert_allclose(float(r8[k]), float(r1[k]), rtol=1e-4, err_msg=k)


def test_crosscoder_mis_collect_then_score(tmp_path):
    """MIS over crosscoder latents: the shared code's top-k collection rides
    eval_modified unchanged (mis='1' saves the filename-index npz; mis='2'
    scores it) — the npz contract is variant-agnostic (interp/mis.py)."""
    Pipeline(_cfg(tmp_path, sae_epochs=1)).run()

    collect = Pipeline(_cfg(tmp_path, sae_epochs=1, training=False, mis="1",
                            sae_checkpoint_epoch=1))
    collect.run()
    fn_dir = os.path.join(collect.paths["evaluation_results"], "filename_indices")
    saved = [f for f in os.listdir(fn_dir) if f.endswith("_epoch_1.npz")]
    assert saved
    data = np.load(os.path.join(fn_dir, saved[0]))
    assert data["max_filename_indices"].shape[0] == 200  # n_mis*(k_mis+1)

    score = Pipeline(_cfg(tmp_path, sae_epochs=1, training=False, mis="2",
                          sae_checkpoint_epoch=1))
    result = score.run()
    assert 0.0 <= result["median_mis"] <= 1.0


def test_crosscoder_int8_cache(tmp_path):
    """Crosscoder training from int8 aligned caches (host-dequant read path)
    stays close to the float32-cache run."""
    p32 = Pipeline(_cfg(tmp_path / "f32", sae_epochs=1))
    r32 = p32.run()
    p8 = Pipeline(_cfg(tmp_path / "i8", sae_epochs=1, cache_dtype="int8"))
    p8.frozen_params, p8.net_state = p32.frozen_params, p32.net_state
    r8 = p8.run()
    assert int(p8.ts.step) == int(p32.ts.step) > 0
    assert r8["sae_rec_loss"] == pytest.approx(r32["sae_rec_loss"], rel=0.05)


def test_crosscoder_overlap_dump_train(tmp_path):
    """overlap_dump_train=True streams the first epoch from the overlapped
    3-layer dump (zipped aligned shard queues) and leaves byte-identical
    caches on disk."""
    p_seq = Pipeline(_cfg(tmp_path / "seq"))
    p_seq.run()
    p_ovl = Pipeline(_cfg(tmp_path / "ovl", overlap_dump_train=True))
    p_ovl.run()
    assert int(p_ovl.ts.step) == int(p_seq.ts.step) > 0
    for layer in ("fc1", "fc2", "fc3"):
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


def test_crosscoder_recovers_shared_dictionary_and_diffing_signal():
    """Ground-truth recovery: synthetic two-layer data from a KNOWN shared
    sparse dictionary where half the features are ABSENT from layer 2 (their
    D_2 rows are zero). After training, (a) every true feature is recovered as
    a learned decoder direction (max cosine), and (b) the decoder-norm share
    profile — the variant's model-diffing readout — separates absent-in-layer-2
    features (share_2 ~ 0) from shared ones (Lindsey et al. 2024 §Model
    Diffing). This is the quantitative anchor that the weighted-L1 objective
    actually produces the per-layer presence signal the crosscoder exists for."""
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.crosscoder import (
        make_crosscoder_multi_step,
        make_crosscoder_train_step_from_acts,
    )
    from sparse_vision_tpu.train.steps import init_sae_train_state

    rs = np.random.RandomState(0)
    h_true, dims = 8, (16, 12)
    d1 = rs.randn(h_true, dims[0])
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 = rs.randn(h_true, dims[1])
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    absent = np.arange(h_true // 2)
    d2[absent] = 0.0

    k, t = 50, 512

    def stacks(seed):
        r = np.random.RandomState(seed)
        z = (r.rand(k * t, h_true) < 0.15) * r.exponential(1.0, (k * t, h_true))
        return (jnp.asarray((z @ d1).astype(np.float32).reshape(k, t, -1)),
                jnp.asarray((z @ d2).astype(np.float32).reshape(k, t, -1)))

    ef = 2  # 32 learned latents for 8 true features
    params = init_crosscoder(jax.random.key(1), dims, ef)
    tx = optim.get_optimizer("adam", 3e-3)
    ts = init_sae_train_state(params, tx, dims[0] * ef, seed=0)
    step = make_crosscoder_train_step_from_acts(0.02, tx, 400, ef)
    multi = make_crosscoder_multi_step(step)
    for r in range(30):  # 1,500 steps
        ts, ms = multi(ts, stacks(r))
    assert float(ms["sae_rec_loss"][-1]) < 1e-4

    p = jax.device_get(ts.params)
    norms = np.asarray(crosscoder_decoder_norms(ts.params))  # [2, h]
    share2 = norms[1] / np.maximum(norms.sum(0), 1e-9)
    w1 = p["W_dec_0"] / np.maximum(
        np.linalg.norm(p["W_dec_0"], axis=1, keepdims=True), 1e-9
    )
    cos = d1 @ w1.T  # [h_true, h]
    match, quality = cos.argmax(1), cos.max(1)
    assert (quality > 0.9).all(), quality  # every true feature recovered
    assert (share2[match[absent]] < 0.15).all(), share2[match[absent]]
    assert (share2[match[h_true // 2:]] > 0.3).all(), share2[match[h_true // 2:]]
