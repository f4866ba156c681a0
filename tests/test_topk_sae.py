"""TopK SAE (beyond-reference: Gao et al. 2024, arXiv:2406.04093).

Sparsity comes from the activation — keep the k largest pre-activations per token
(through ReLU), zero the rest — so L0 <= k by construction and training needs no L1
term. Parameter layout is identical to the ReLU SAE (weight IO round-trips through
train/sae_io.py unchanged).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sparse_vision_tpu.models.sae import (
    init_sae,
    sae_inference_and_loss,
    topk_sae_apply,
)

D, EXP, K = 16, 4, 5


def _numpy_topk_sae(params, x, k):
    """Independent numpy replication of the TopK forward."""
    x_cent = x - np.asarray(params["b_dec"])
    pre = x_cent @ np.asarray(params["W_enc"]) + np.asarray(params["b_enc"])
    post = np.zeros_like(pre)
    for t in range(pre.shape[0]):
        idx = np.argsort(pre[t])[::-1][:k]
        post[t, idx] = np.maximum(pre[t, idx], 0.0)
    recon = post @ np.asarray(params["W_dec"]) + np.asarray(params["b_dec"])
    return post, recon, pre


def test_topk_matches_numpy_golden():
    params = init_sae("topk_sae", jax.random.key(0), D, EXP)
    x = np.random.default_rng(0).normal(size=(32, D)).astype(np.float32)
    enc, dec, pre = topk_sae_apply(params, jnp.asarray(x), K)
    g_enc, g_dec, g_pre = _numpy_topk_sae(params, x, K)
    np.testing.assert_allclose(np.asarray(pre), g_pre, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(enc), g_enc, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dec), g_dec, rtol=1e-5, atol=1e-6)


def test_topk_l0_bounded_by_k():
    params = init_sae("topk_sae", jax.random.key(1), D, EXP)
    x = np.random.default_rng(1).normal(size=(64, D)).astype(np.float32)
    enc, _, _ = topk_sae_apply(params, jnp.asarray(x), K)
    l0 = np.count_nonzero(np.asarray(enc), axis=1)
    assert (l0 <= K).all() and l0.max() == K  # <= k always; == k when pre > 0 exists


def test_topk_l0_exact_under_ties():
    """Index-scatter selection keeps L0 <= k even when many latents TIE at the
    k-th value (a value-threshold selection would activate all of them)."""
    params = init_sae("topk_sae", jax.random.key(4), D, EXP)
    # degenerate input: x == b_dec makes every pre equal b_enc; zero b_enc means a
    # total tie across all latents
    params = dict(params, b_enc=jnp.zeros_like(params["b_enc"]))
    x = jnp.broadcast_to(params["b_dec"], (4, D))
    enc, _, _ = topk_sae_apply(params, x, K)
    assert (np.count_nonzero(np.asarray(enc), axis=1) <= K).all()


def test_topk_k_validated():
    import pytest

    params = init_sae("topk_sae", jax.random.key(5), D, EXP)
    x = jnp.zeros((2, D))
    with pytest.raises(ValueError, match="exceeds the latent count"):
        topk_sae_apply(params, x, D * EXP + 1)


def test_topk_inference_and_loss_token_reshape():
    """4-D conv taps reshape through the same token path as the other variants."""
    params = init_sae("topk_sae", jax.random.key(2), D, EXP)
    act = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 3, 3, D)).astype(np.float32)
    )
    out = sae_inference_and_loss("topk_sae", params, act, 0.0, topk=K)
    assert out["decoded"].shape == act.shape
    assert out["encoded"].shape == (2, 3, 3, D * EXP)
    assert out["encoded_pre"] is not None
    assert float(out["loss"]) == float(out["rec_loss"])  # lambda=0: pure MSE


def test_topk_gradients_flow_only_through_selected():
    """d rec/d b_enc is nonzero only at latents selected somewhere in the batch."""
    params = init_sae("topk_sae", jax.random.key(3), D, EXP)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(8, D)).astype(np.float32))

    def loss(p):
        enc, dec, _ = topk_sae_apply(p, x, K)
        return jnp.mean(jnp.square(dec - x))

    g = jax.grad(loss)(params)
    enc, _, _ = topk_sae_apply(params, x, K)
    selected = np.asarray(enc > 0).any(axis=0)
    g_b = np.asarray(g["b_enc"])
    assert (g_b[~selected] == 0).all()
    assert np.abs(g_b[selected]).max() > 0


def test_topk_trains_end_to_end(tmp_path):
    """Pipeline mode 3 with the TopK variant: reconstruction improves, L0 stays at
    the configured k, and the weight export round-trips."""
    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfg = RunConfig(
        directory_path=str(tmp_path), dataset_name="synthetic",
        sae_model_name="topk_sae", sae_lambda_sparse=0.0, sae_topk=8,
        sae_epochs=2, sae_batch_size=64, sae_expansion_factor=2,
        dead_neurons_steps=10_000, log_every=1000,
    )
    pipe = Pipeline(cfg)
    before = pipe.eval_modified(epoch=0, store=False)
    result = pipe.train_sae()
    assert result["sae_rec_loss"] < before["sae_rec_loss"], (before, result)
    # relative sparsity metric: active/(units/expansion) = L0/ (h/exp); h=dk=392*2?
    # here d=784, exp=2 -> h=1568, h/exp=784; L0<=8 -> sparsity <= 8/784
    assert result["sparsity"] <= cfg.sae_topk / (pipe.num_units / cfg.sae_expansion_factor) + 1e-6

    import glob
    import os

    npz = glob.glob(os.path.join(pipe.paths["sae_weights"], "*_model_weights.npz"))
    assert npz
    cfg2 = dataclasses.replace(
        cfg, directory_path=str(tmp_path / "re"), training=False,
        sae_weights_path=npz[0],
    )
    pipe2 = Pipeline(cfg2)
    for k in pipe.ts.params:
        np.testing.assert_array_equal(
            np.asarray(pipe2.ts.params[k]), np.asarray(pipe.ts.params[k])
        )


def test_topk_cached_path(tmp_path):
    """The activation-cache production path trains the TopK variant (stock step on
    CPU; on TPU the gate routes it to the gather-based fast path,
    ops/fast_topk_sae.py)."""
    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfg = RunConfig(
        directory_path=str(tmp_path), dataset_name="synthetic",
        sae_model_name="topk_sae", sae_lambda_sparse=0.0, sae_topk=8,
        sae_epochs=1, sae_batch_size=64, sae_expansion_factor=2,
        dead_neurons_steps=10_000, log_every=1000,
        use_activation_cache=True, cache_tokens_per_step=128,
    )
    res = Pipeline(cfg).train_sae()
    assert np.isfinite(res["sae_rec_loss"])


def test_topk_approx_selection():
    """sae_topk_approx: lax.approx_max_k selection keeps the TopK contract —
    L0 <= k exactly, selected set ~= the exact top-k (recall_target 0.95), and
    gradients flow through the selected values (the opt-in fast path for
    production latent counts; 11x faster selection measured on v5e at 16k)."""
    import jax
    import jax.numpy as jnp

    from sparse_vision_tpu.models.sae import init_sae, sae_inference_and_loss

    d, exp, k, t = 64, 8, 8, 128  # h = 512
    params = init_sae("topk_sae", jax.random.key(0), d, exp)
    tok = jax.random.normal(jax.random.key(1), (t, d))

    exact = sae_inference_and_loss("topk_sae", params, tok, 0.0, topk=k)
    approx = sae_inference_and_loss("topk_sae", params, tok, 0.0, topk=k,
                                    topk_approx=True)
    l0 = np.count_nonzero(np.asarray(approx["encoded"]), axis=1)
    assert (l0 <= k).all()
    # recall vs the exact selection well above the 0.95 target on this size
    sel_e = np.asarray(exact["encoded"]) != 0
    sel_a = np.asarray(approx["encoded"]) != 0
    recall = (sel_e & sel_a).sum() / max(sel_e.sum(), 1)
    assert recall >= 0.9, recall

    def loss(p):
        return sae_inference_and_loss("topk_sae", p, tok, 0.0, topk=k,
                                      topk_approx=True)["loss"]

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["W_dec"]).sum()) > 0
    assert float(jnp.abs(g["W_enc"]).sum()) > 0


def test_fast_topk_matches_stock_terms_and_grads():
    """The gather-based fast TopK path (ops/fast_topk_sae.py) reproduces the stock
    path's loss terms, gradients, and dead/sparsity stats exactly (exact selection
    mode; the production default for fused=True on TPU)."""
    import jax
    import jax.numpy as jnp

    from sparse_vision_tpu.models.sae import init_sae, sae_inference_and_loss
    from sparse_vision_tpu.ops.fast_topk_sae import fast_topk_sae_loss_terms
    from sparse_vision_tpu.ops.metrics import measure_inactive_units

    d, exp, k, t = 32, 8, 8, 96  # h = 256
    params = init_sae("topk_sae", jax.random.key(0), d, exp)
    tok = jax.random.normal(jax.random.key(1), (t, d))

    fast = fast_topk_sae_loss_terms(params, tok, 0.1, exp, k)
    stock = sae_inference_and_loss("topk_sae", params, tok, 0.1, topk=k)
    dead_s, sparsity_s, freq_s = measure_inactive_units(stock["encoded"], exp)
    for key in ("loss", "rec_loss", "l1_loss", "nrmse_loss", "rmse_loss"):
        np.testing.assert_allclose(
            float(fast[key]), float(stock[key]), rtol=1e-5, err_msg=key
        )
    np.testing.assert_allclose(
        np.asarray(fast["decoded"]), np.asarray(stock["decoded"]), rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_array_equal(np.asarray(fast["dead"]), np.asarray(dead_s))
    # stock freq = 1 - mean(inactive f32) accumulates rounding; fast is exact int/t
    np.testing.assert_allclose(
        np.asarray(fast["activity_freq"]), np.asarray(freq_s), rtol=1e-5
    )
    np.testing.assert_allclose(float(fast["sparsity"]), float(sparsity_s), rtol=1e-5)

    def loss_fast(p):
        return fast_topk_sae_loss_terms(p, tok, 0.1, exp, k)["loss"]

    def loss_stock(p):
        return sae_inference_and_loss("topk_sae", p, tok, 0.1, topk=k)["loss"]

    gf = jax.grad(loss_fast)(params)
    gs = jax.grad(loss_stock)(params)
    for key in gf:
        np.testing.assert_allclose(
            np.asarray(gf[key]), np.asarray(gs[key]), rtol=1e-5, atol=1e-6,
            err_msg=key,
        )


def test_fast_topk_train_step_matches_stock():
    """make_sae_train_step_from_acts(fused=True) on topk_sae routes through the fast
    path and tracks the stock trajectory."""
    import jax
    import jax.numpy as jnp

    from sparse_vision_tpu.models.sae import init_sae
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_step_from_acts,
    )

    d, exp, k = 32, 4, 8
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    mk = lambda: init_sae_train_state(
        init_sae("topk_sae", jax.random.key(0), d, exp), tx, d * exp
    )
    s_stock = make_sae_train_step_from_acts("topk_sae", 0.0, tx, 1000, exp,
                                            fused=False, topk=k)
    s_fast = make_sae_train_step_from_acts("topk_sae", 0.0, tx, 1000, exp,
                                           fused=True, topk=k)
    ts_a, ts_b = mk(), mk()
    for s in range(4):
        x = jnp.asarray(np.random.default_rng(s).normal(size=(64, d)),
                        jnp.float32)
        ts_a, ma = s_stock(ts_a, x)
        ts_b, mb = s_fast(ts_b, x)
        for key in ("sae_loss", "sae_rec_loss", "sparsity"):
            np.testing.assert_allclose(float(mb[key]), float(ma[key]), rtol=1e-5,
                                       err_msg=key)
    for key in ts_a.params:
        np.testing.assert_allclose(
            np.asarray(ts_b.params[key]), np.asarray(ts_a.params[key]),
            rtol=1e-5, atol=1e-6, err_msg=key,
        )
    np.testing.assert_array_equal(np.asarray(ts_b.dead_acc), np.asarray(ts_a.dead_acc))


def test_fast_topk_sharded_matches_single_device():
    """The shard_map fused path routes topk_sae through the gather-based fast terms
    per chip; pmean'd grads match the single-device fast trajectory on an 8-device
    data mesh."""
    import jax
    import jax.numpy as jnp

    from sparse_vision_tpu.models.sae import init_sae
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.parallel.mesh import make_mesh
    from sparse_vision_tpu.parallel.sharded_steps import (
        make_sharded_fused_train_step,
        put_replicated_state,
        put_tokens_sharded,
    )
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_step_from_acts,
    )

    d, exp, k = 32, 4, 8
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    mesh = make_mesh((8,))
    mk = lambda: init_sae_train_state(
        init_sae("topk_sae", jax.random.key(0), d, exp), tx, d * exp
    )
    ref_step = make_sae_train_step_from_acts("topk_sae", 0.0, tx, 1000, exp,
                                             fused=True, topk=k)
    sh_step = make_sharded_fused_train_step(mesh, 0.0, tx, 1000, exp, fused=True,
                                            sae_model_name="topk_sae", topk=k)
    ts_ref, ts_sh = mk(), put_replicated_state(mesh, mk())
    for s in range(3):
        x = np.random.default_rng(s).normal(size=(64, d)).astype(np.float32)
        ts_ref, m_ref = ref_step(ts_ref, jnp.asarray(x))
        ts_sh, m_sh = sh_step(ts_sh, put_tokens_sharded(mesh, x))
        for key in ("sae_loss", "sae_rec_loss", "sparsity"):
            np.testing.assert_allclose(float(m_sh[key]), float(m_ref[key]),
                                       rtol=1e-5, err_msg=key)
    for key in ts_ref.params:
        np.testing.assert_allclose(
            np.asarray(ts_sh.params[key]), np.asarray(ts_ref.params[key]),
            rtol=1e-5, atol=1e-6, err_msg=key,
        )
