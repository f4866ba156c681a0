"""BatchTopK SAE (beyond-reference: Bussmann, Leask & Nanda 2024, arXiv:2412.06410).

Training keeps the T*k largest pre-activations across the WHOLE batch (through
ReLU) — the per-token budget is an average, so tokens with more structure may use
more latents. Inference gates with a scalar threshold EMA-estimated during
training from each batch's minimum positive selected value (the paper's
BatchTopK -> JumpReLU deployment conversion). Parameter layout = ReLU SAE plus
the scalar ``threshold``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sparse_vision_tpu.models.sae import (
    batch_topk_sae_apply,
    batch_topk_threshold_update,
    init_sae,
    sae_encode,
    sae_inference_and_loss,
)

D, EXP, K = 16, 4, 5


def _numpy_batch_topk(params, x, k):
    """Independent numpy replication of the training-time batch selection."""
    x_cent = x - np.asarray(params["b_dec"])
    pre = x_cent @ np.asarray(params["W_enc"]) + np.asarray(params["b_enc"])
    t, h = pre.shape
    flat = pre.reshape(-1)
    idx = np.argsort(flat)[::-1][: t * k]
    post_flat = np.zeros_like(flat)
    post_flat[idx] = np.maximum(flat[idx], 0.0)
    post = post_flat.reshape(t, h)
    recon = post @ np.asarray(params["W_dec"]) + np.asarray(params["b_dec"])
    kept = np.maximum(flat[idx], 0.0)
    min_pos = kept[kept > 0].min() if (kept > 0).any() else 0.0
    return post, recon, pre, min_pos


def test_batch_topk_matches_numpy_golden():
    params = init_sae("batch_topk_sae", jax.random.key(0), D, EXP)
    x = np.random.default_rng(0).normal(size=(32, D)).astype(np.float32)
    enc, dec, pre, mp = batch_topk_sae_apply(params, jnp.asarray(x), K)
    g_enc, g_dec, g_pre, g_mp = _numpy_batch_topk(params, x, K)
    np.testing.assert_allclose(np.asarray(pre), g_pre, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(enc), g_enc, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dec), g_dec, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(mp), g_mp, rtol=1e-5)


def test_batch_topk_budget_is_batch_level():
    """Total selected == T*k, and the PER-TOKEN allocation varies — the variant's
    point: a token with concentrated energy uses more than k latents, a flat
    token fewer (per-token TopK would force exactly k each)."""
    params = init_sae("batch_topk_sae", jax.random.key(1), D, EXP)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(16, D)).astype(np.float32)
    x[:8] *= 5.0  # half the tokens carry much more energy
    enc, _, _, _ = batch_topk_sae_apply(params, jnp.asarray(x), K)
    l0 = np.count_nonzero(np.asarray(enc), axis=1)
    assert l0.sum() <= 16 * K
    assert l0.max() > K and l0.min() < K, l0  # allocation actually varies


def test_batch_topk_gradients_flow_only_through_selected():
    params = init_sae("batch_topk_sae", jax.random.key(3), D, EXP)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(8, D)).astype(np.float32))

    def loss(p):
        enc, dec, _, _ = batch_topk_sae_apply(p, x, K)
        return jnp.mean(jnp.square(dec - x))

    g = jax.grad(loss)(params)
    enc, _, _, _ = batch_topk_sae_apply(params, x, K)
    selected = np.asarray(enc > 0).any(axis=0)
    g_b = np.asarray(g["b_enc"])
    assert (g_b[~selected] == 0).all()
    assert np.abs(g_b[selected]).max() > 0
    assert float(jnp.abs(g["threshold"])) == 0.0  # never gradient-trained


def test_threshold_ema_seeds_then_averages():
    thr = jnp.zeros(())
    thr = batch_topk_threshold_update(thr, jnp.asarray(0.5))
    assert float(thr) == 0.5  # first positive observation seeds
    thr2 = batch_topk_threshold_update(thr, jnp.asarray(1.5), ema=0.9)
    np.testing.assert_allclose(float(thr2), 0.9 * 0.5 + 0.1 * 1.5, rtol=1e-6)
    thr3 = batch_topk_threshold_update(thr2, jnp.asarray(0.0))  # no positives
    assert float(thr3) == float(thr2)


def test_train_step_estimates_threshold_and_eval_uses_it():
    """The train step overwrites the zero-gradient threshold with the EMA (first
    batch seeds it with that batch's min positive selected); inference gates
    every surviving activation strictly above it."""
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_step_from_acts,
    )

    tx = optim.get_optimizer("constrained_adam", 1e-3)
    ts = init_sae_train_state(
        init_sae("batch_topk_sae", jax.random.key(0), D, EXP), tx, D * EXP
    )
    step = make_sae_train_step_from_acts("batch_topk_sae", 0.0, tx, 10_000, EXP,
                                         topk=K)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(32, D)), jnp.float32)
    _, _, _, mp0 = batch_topk_sae_apply(ts.params, x0, K)
    ts, m = step(ts, x0)
    np.testing.assert_allclose(float(ts.params["threshold"]), float(mp0), rtol=1e-6)
    for s in range(1, 4):
        x = jnp.asarray(np.random.default_rng(s).normal(size=(32, D)), jnp.float32)
        ts, m = step(ts, x)
    thr = float(ts.params["threshold"])
    assert thr > 0 and np.isfinite(m["sae_loss"])

    out = sae_inference_and_loss("batch_topk_sae", ts.params,
                                 jnp.asarray(x0), 0.0, topk=K, training=False)
    enc = np.asarray(out["encoded"])
    assert (enc[enc > 0] > thr).all()
    assert "batch_topk_min_pos" not in out  # inference emits no observation
    # sae_encode (the circuit tier's entry) is the same deployment form
    enc2 = np.asarray(sae_encode("batch_topk_sae", ts.params, x0))
    np.testing.assert_array_equal(enc, enc2)


def test_kth_largest_radix_bisection_golden():
    """The radix-bisection cutoff (ops/fast_batch_topk.kth_largest) returns the
    EXACT n-th largest value — negatives, duplicates, and subnormal magnitudes
    included — without sorting."""
    from sparse_vision_tpu.ops.fast_batch_topk import kth_largest

    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.normal(size=500), -rng.exponential(size=300),
        np.repeat(rng.normal(size=10), 5), [0.0, -0.0, 1e-38, -1e-38],
    ]).astype(np.float32)
    for n in (1, 2, 7, 100, 854, len(x)):
        want = np.sort(x)[::-1][n - 1]
        got = float(kth_largest(jnp.asarray(x), n))
        assert got == want, (n, got, want)


def test_fast_batch_topk_matches_stock_terms_and_grads():
    """The cutoff-mask fast path reproduces the scatter-selection stock path's
    loss terms, gradients, stats, and threshold observation exactly (continuous
    data: no cutoff ties)."""
    from sparse_vision_tpu.ops.fast_batch_topk import fast_batch_topk_sae_loss_terms
    from sparse_vision_tpu.ops.metrics import measure_inactive_units

    d, exp, k, t = 32, 8, 8, 96
    params = init_sae("batch_topk_sae", jax.random.key(0), d, exp)
    tok = jax.random.normal(jax.random.key(1), (t, d))

    fast = fast_batch_topk_sae_loss_terms(params, tok, 0.0, exp, k)
    stock = sae_inference_and_loss("batch_topk_sae", params, tok, 0.0, topk=k)
    dead_s, sparsity_s, _ = measure_inactive_units(stock["encoded"], exp)
    for key in ("loss", "rec_loss", "l1_loss", "nrmse_loss", "rmse_loss",
                "batch_topk_min_pos"):
        np.testing.assert_allclose(float(fast[key]), float(stock[key]),
                                   rtol=1e-6, err_msg=key)
    np.testing.assert_array_equal(np.asarray(fast["encoded"]),
                                  np.asarray(stock["encoded"]))
    np.testing.assert_array_equal(np.asarray(fast["dead"]), np.asarray(dead_s))
    np.testing.assert_allclose(float(fast["sparsity"]), float(sparsity_s),
                               rtol=1e-6)

    gf = jax.grad(lambda p: fast_batch_topk_sae_loss_terms(p, tok, 0.0, exp, k)["loss"])(params)
    gs = jax.grad(lambda p: sae_inference_and_loss(
        "batch_topk_sae", p, tok, 0.0, topk=k)["loss"])(params)
    for key in gf:
        np.testing.assert_allclose(np.asarray(gf[key]), np.asarray(gs[key]),
                                   rtol=1e-5, atol=1e-7, err_msg=key)


def test_fast_batch_topk_train_step_matches_stock():
    """make_sae_train_step_from_acts(fused=True) routes batch_topk through the
    bisection path and tracks the stock trajectory, threshold EMA included."""
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_step_from_acts,
    )

    d, exp, k = 32, 4, 8
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    mk = lambda: init_sae_train_state(
        init_sae("batch_topk_sae", jax.random.key(0), d, exp), tx, d * exp
    )
    s_stock = make_sae_train_step_from_acts("batch_topk_sae", 0.0, tx, 1000,
                                            exp, fused=False, topk=k)
    s_fast = make_sae_train_step_from_acts("batch_topk_sae", 0.0, tx, 1000,
                                           exp, fused=True, topk=k)
    ts_a, ts_b = mk(), mk()
    for s in range(4):
        x = jnp.asarray(np.random.default_rng(s).normal(size=(64, d)),
                        jnp.float32)
        ts_a, ma = s_stock(ts_a, x)
        ts_b, mb = s_fast(ts_b, x)
        for key in ("sae_loss", "sae_rec_loss", "sparsity"):
            np.testing.assert_allclose(float(mb[key]), float(ma[key]),
                                       rtol=1e-6, err_msg=key)
    for key in ts_a.params:
        np.testing.assert_allclose(
            np.asarray(ts_b.params[key]), np.asarray(ts_a.params[key]),
            rtol=1e-5, atol=1e-7, err_msg=key,
        )


def test_batch_topk_sharded_matches_single_device():
    """8-device data mesh: the distributed-cutoff selection (local top candidates
    -> all_gather -> global (T*k)-th value) reproduces the single-device batch
    selection, threshold EMA included."""
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
        init_sae("batch_topk_sae", jax.random.key(0), d, exp), tx, d * exp
    )
    ref_step = make_sae_train_step_from_acts("batch_topk_sae", 0.0, tx, 1000,
                                             exp, topk=k)
    sh_step = make_sharded_fused_train_step(mesh, 0.0, tx, 1000, exp,
                                            fused=False,
                                            sae_model_name="batch_topk_sae",
                                            topk=k)
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


def test_batch_topk_trains_end_to_end(tmp_path):
    """Pipeline mode 3: reconstruction improves, the exported npz round-trips
    WITH the estimated threshold, and the final eval (deployment activation)
    is finite."""
    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfg = RunConfig(
        directory_path=str(tmp_path), dataset_name="synthetic",
        sae_model_name="batch_topk_sae", sae_lambda_sparse=0.0, sae_topk=8,
        sae_epochs=2, sae_batch_size=64, sae_expansion_factor=2,
        dead_neurons_steps=10_000, log_every=1000,
    )
    pipe = Pipeline(cfg)
    before = pipe.eval_modified(epoch=0, store=False)
    result = pipe.train_sae()
    assert result["sae_rec_loss"] < before["sae_rec_loss"], (before, result)
    assert float(pipe.ts.params["threshold"]) > 0

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


def test_batch_topk_saelens_publishes_as_jumprelu(tmp_path):
    """SAELens export: the community conversion — a jumprelu artifact whose
    per-latent threshold is the broadcast scalar. Loading it back (default
    architecture resolution) reproduces the batch_topk INFERENCE encoding
    through the jumprelu path."""
    from sparse_vision_tpu.models.sae import jumprelu_sae_apply
    from sparse_vision_tpu.train.sae_io import load_sae_saelens, save_sae_saelens

    params = init_sae("batch_topk_sae", jax.random.key(0), D, EXP)
    params = dict(params, threshold=jnp.asarray(0.37))
    folder = save_sae_saelens(params, "batch_topk_sae", str(tmp_path / "sl"))
    loaded, cfg = load_sae_saelens(folder)  # resolves to jumprelu_sae
    assert cfg["architecture"] == "jumprelu"
    np.testing.assert_allclose(np.exp(np.asarray(loaded["log_threshold"])),
                               0.37, rtol=1e-6)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(16, D)), jnp.float32)
    want = batch_topk_sae_apply(params, x, K, training=False)[0]
    got = jumprelu_sae_apply(loaded, x)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)
    # and back into batch_topk form: the scalar is recovered
    back, _ = load_sae_saelens(folder, sae_model_name="batch_topk_sae")
    np.testing.assert_allclose(float(back["threshold"]), 0.37, rtol=1e-6)


def test_batch_topk_not_vmap_sweepable():
    import pytest

    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.sweep_vmap import train_sae_sweep_cached

    cfg = RunConfig(dataset_name="synthetic", sae_model_name="batch_topk_sae",
                    use_activation_cache=True)
    with pytest.raises(ValueError, match="not vmap-sweepable"):
        train_sae_sweep_cached(cfg, [{"sae_lambda_sparse": 0.0}])


def test_batch_topk_e2e_finetune_keeps_threshold_tracking(tmp_path):
    """The KL finetune epochs keep the inference-threshold EMA updating (the
    finetuned encoder's activation scale drifts; a frozen threshold would gate
    against the stale distribution) and the finetune still trains."""
    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfg = RunConfig(
        model_name="custom_mlp_9", sae_model_name="batch_topk_sae",
        sae_layer="fc1", dataset_name="synthetic",
        directory_path=str(tmp_path), sae_epochs=1, sae_batch_size=64,
        sae_topk=8, sae_lambda_sparse=0.0, sae_expansion_factor=2,
        dead_neurons_steps=10_000, log_every=1000,
        sae_e2e_finetune_epochs=1,
    )
    pipe = Pipeline(cfg)
    res = pipe.run()
    assert np.isfinite(res["kld"])
    thr = float(pipe.ts.params["threshold"])
    assert thr > 0
    # one more finetune step from the converged state moves the EMA unless the
    # observation exactly equals it (it will not, on random data)
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.e2e_finetune import make_sae_e2e_finetune_step
    from sparse_vision_tpu.train.steps import init_sae_train_state

    tx = optim.get_optimizer("constrained_adam", 1e-4)
    ts = init_sae_train_state(pipe.ts.params, tx, pipe.num_units)
    step = make_sae_e2e_finetune_step(
        pipe.net, "fc1", "batch_topk_sae", 0.0, tx, topk=8
    )
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(64, 28, 28, 1)),
                       jnp.float32)
    labels = jnp.zeros((64,), jnp.int32)
    ts2, m = step(ts, pipe.frozen_params, pipe.net_state, imgs, labels)
    assert float(ts2.params["threshold"]) != thr
    assert np.isfinite(m["e2e_loss"])


# ---------------------------------------------------------------------------
# AuxK dead-revival loss + final-params threshold calibration (round 4: the
# first chip convergence row hit 81% dead units and deployment L0 = 403 at
# batch_k=32 — the Gao/Bussmann recipe needs the auxiliary loss and the
# converged-params threshold conversion, docs/convergence_variants_v5e.json)
# ---------------------------------------------------------------------------

def test_topk_aux_loss_semantics():
    """Zero when nothing is dead; positive when latents are dead; gradients
    touch ONLY the dead latents' encoder/decoder rows (the live code is
    untouched — Gao et al. 2024 §A.2)."""
    from sparse_vision_tpu.models.sae import topk_aux_loss

    params = init_sae("batch_topk_sae", jax.random.key(0), D, EXP)
    h = D * EXP
    x = jax.random.normal(jax.random.key(1), (32, D))
    recon = jnp.zeros_like(x)
    residual = x - recon

    no_dead = jnp.zeros((h,), bool)
    assert float(topk_aux_loss(params, x, residual, no_dead, 4)) == 0.0

    dead = jnp.zeros((h,), bool).at[:8].set(True)
    loss, grads = jax.value_and_grad(
        lambda p: topk_aux_loss(p, x, residual, dead, 4)
    )(params)
    assert float(loss) > 0
    dwe = np.asarray(grads["W_enc"])  # [d, h]
    dwd = np.asarray(grads["W_dec"])  # [h, d]
    assert np.any(dwe[:, :8] != 0) and np.any(dwd[:8] != 0)
    np.testing.assert_array_equal(dwe[:, 8:], 0)
    np.testing.assert_array_equal(dwd[8:], 0)


def test_aux_objective_is_optimizable_and_wired():
    """(1) Optimizing the aux objective alone drives it down — dead latents
    learn to reconstruct the residual; (2) through the from-acts step the aux
    metric is reported, gated to the mature half of the dead window, and the
    parameter trajectory differs from the aux-off run (the loss really feeds
    gradients). Outcome-level evidence (dead%/L0 on real activations) lives in
    docs/convergence_variants_v5e.json, not a toy assertion."""
    import optax

    from sparse_vision_tpu.models.sae import topk_aux_loss
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_step_from_acts,
    )

    d, ef = 16, 8
    h = d * ef
    params = init_sae("batch_topk_sae", jax.random.key(0), d, ef)
    x = jax.random.normal(jax.random.key(1), (128, d))
    residual = jax.random.normal(jax.random.key(2), (128, d)) * 0.5
    dead = jnp.zeros((h,), bool).at[: h // 2].set(True)

    tx = optax.adam(1e-2)
    opt = tx.init(params)
    p = params
    first = last = None
    for i in range(40):
        val, g = jax.value_and_grad(
            lambda q: topk_aux_loss(q, x, residual, dead, 16)
        )(p)
        upd, opt = tx.update(g, opt, p)
        p = optax.apply_updates(p, upd)
        first = float(val) if first is None else first
        last = float(val)
    assert last < 0.7 * first, (first, last)

    def run(aux_k):
        q = init_sae("batch_topk_sae", jax.random.key(3), d, ef)
        txc = optim.get_optimizer("constrained_adam", 2e-3)
        ts = init_sae_train_state(q, txc, h)
        kw = dict(aux_k=aux_k, aux_alpha=1 / 32) if aux_k else {}
        step = make_sae_train_step_from_acts(
            "batch_topk_sae", 0.0, txc, 20, ef, topk=2, **kw)
        aux_vals = []
        for i in range(25):
            ts, m = step(ts, jax.random.normal(jax.random.key(100 + i), (64, d)))
            if "sae_aux_loss" in m:
                aux_vals.append(float(m["sae_aux_loss"]))
        return ts, aux_vals

    ts_off, _ = run(0)
    ts_on, aux_vals = run(16)
    assert len(aux_vals) == 25 and all(np.isfinite(a) for a in aux_vals)
    # steps 10..19 of each 20-step window are mature -> the aux gradient fired,
    # so the trajectories must diverge
    assert not np.allclose(np.asarray(ts_on.params["W_dec"]),
                           np.asarray(ts_off.params["W_dec"]))


def test_batch_topk_threshold_calibration_unit():
    """calibrate_batch_topk_threshold: gating relu(pre) at the returned value
    reproduces (approximately) the batch-level per-token-average budget k on
    the calibration batch itself."""
    from sparse_vision_tpu.models.sae import calibrate_batch_topk_threshold

    params = init_sae("batch_topk_sae", jax.random.key(3), D, EXP)
    tok = jax.random.normal(jax.random.key(4), (128, D))
    k = 3
    thr = calibrate_batch_topk_threshold(params, tok, k)
    pre = (tok - params["b_dec"]) @ params["W_enc"] + params["b_enc"]
    relu = jnp.maximum(pre, 0.0)
    l0 = float(jnp.mean(jnp.sum(relu * (relu > thr) > 0, axis=-1)))
    assert l0 <= k + 0.5, l0  # the cutoff keeps at most T*k (ties aside)
    assert float(thr) >= 0


def test_batch_topk_cached_run_calibrates_threshold(tmp_path):
    """Cached-mode batch_topk training ends with the calibrated (not EMA)
    threshold: the final params gate at a value consistent with the cached
    distribution, and the checkpoint/export carry it."""
    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.models.sae import calibrate_batch_topk_threshold
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfg = RunConfig(
        directory_path=str(tmp_path), dataset_name="synthetic",
        sae_model_name="batch_topk_sae", sae_lambda_sparse=0.0, sae_topk=4,
        sae_epochs=2, sae_batch_size=64, sae_expansion_factor=2,
        dead_neurons_steps=10_000, log_every=1000,
        use_activation_cache=True, cache_tokens_per_step=128,
        sae_aux_k=16,
    )
    pipe = Pipeline(cfg)
    result = pipe.run()
    assert np.isfinite(result["sae_rec_loss"])
    thr = float(jax.device_get(pipe.ts.params["threshold"]))
    assert thr >= 0
    # re-deriving the calibration at the final params matches what the run set
    from sparse_vision_tpu.data.activation_cache import ActivationCache

    cache = ActivationCache(pipe._cache_dir(cfg.sae_layer))
    tok = next(iter(cache.batches(128, shuffle=True, seed=cfg.seed + 7919,
                                  prefetch=False)))
    expect = float(calibrate_batch_topk_threshold(
        pipe.ts.params, jnp.asarray(np.asarray(tok, np.float32)), cfg.sae_topk
    ))
    assert abs(thr - expect) < 1e-5, (thr, expect)


def test_dead_window_resets_for_non_resampling_variants():
    """Rolling dead measurement (the round-5 AuxK dead-revival fix): for
    non-resampling variants the accumulator resets every dead_neurons_steps,
    so a latent that fired in an EARLIER window but not in the current one
    counts dead again — AuxK can target latents that die after early firing
    (Gao et al. 2024 §A.2 define dead as not-fired-in-N-tokens, a rolling
    property, not fired-never-since-step-0)."""
    import optax

    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_step_from_acts,
    )

    d, ef, n = 8, 2, 4
    h = d * ef
    params = init_sae("batch_topk_sae", jax.random.key(0), d, ef)
    tx = optax.adam(0.0)  # frozen params: only the accumulator dynamics matter
    ts = init_sae_train_state(params, tx, h)
    step = make_sae_train_step_from_acts("batch_topk_sae", 0.0, tx, n, ef, topk=2)

    x = jax.random.normal(jax.random.key(1), (4, d))  # 4*k=8 slots < h=16
    fired_w1 = fired_w2 = None
    for i in range(2 * n - 1):
        ts, _ = step(ts, x)
        if int(ts.step) == n - 1:
            fired_w1 = ~np.asarray(ts.dead_acc)  # latents that fired in window 1
        if int(ts.step) == n:
            # reset boundary: the accumulator starts the new window all-True
            assert bool(np.all(np.asarray(ts.dead_acc)))
    fired_w2 = ~np.asarray(ts.dead_acc)  # step 2n-1: window 2, pre-boundary
    assert fired_w1 is not None and fired_w1.any() and not fired_w1.all()
    # same data, frozen params -> the same latents fire again within window 2;
    # the measurement is per-window, not since-step-0
    np.testing.assert_array_equal(fired_w2, fired_w1)
