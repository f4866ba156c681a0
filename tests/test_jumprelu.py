"""JumpReLU SAE tests (beyond-reference variant; Rajamanoharan et al. 2024):
forward semantics, the STE custom-VJP gradient formulas checked against hand-computed
values, and end-to-end training where λ controls L0."""

import jax
import jax.numpy as jnp
import numpy as np

from sparse_vision_tpu.models.sae import (
    JUMPRELU_BANDWIDTH,
    _jumprelu,
    init_jumprelu_sae,
    jumprelu_l0,
    jumprelu_sae_apply,
    sae_inference_and_loss,
)

C, K, T = 32, 4, 128


def test_forward_semantics():
    params = init_jumprelu_sae(jax.random.key(0), C, K)
    # raise thresholds so the jump actually bites
    params = {**params, "log_threshold": jnp.full((C * K,), jnp.log(0.3))}
    x = jax.random.normal(jax.random.key(1), (T, C))
    post, recon, pre = jumprelu_sae_apply(params, x)
    thr = 0.3
    np.testing.assert_allclose(
        np.asarray(post), np.asarray(pre * (pre > thr)), rtol=1e-6
    )
    assert bool(jnp.all((post == 0) | (post > thr)))  # hard zeros below threshold
    manual_recon = post @ params["W_dec"] + params["b_dec"]
    np.testing.assert_allclose(np.asarray(recon), np.asarray(manual_recon), rtol=1e-6)


def test_ste_gradients_match_formulas():
    eps = JUMPRELU_BANDWIDTH
    thr = jnp.array([0.5, 0.2])
    # craft pre so some entries fall inside the STE window |pre - thr| <= eps/2
    pre = jnp.array([
        [0.5 + 0.2 * eps, 0.2 - 10 * eps],
        [0.5 - 0.4 * eps, 0.2 + 0.1 * eps],
        [2.0, -1.0],
    ])

    g_thr = jax.grad(lambda t: jnp.sum(_jumprelu(pre, t)))(thr)
    window = (jnp.abs(pre - thr) <= eps / 2).astype(jnp.float32)
    expected = jnp.sum(-thr / eps * window, axis=0)
    np.testing.assert_allclose(np.asarray(g_thr), np.asarray(expected), rtol=1e-6)

    g_pre = jax.grad(lambda p: jnp.sum(_jumprelu(p, thr)))(pre)
    np.testing.assert_allclose(np.asarray(g_pre), np.asarray((pre > thr)), rtol=1e-6)

    g_thr_l0 = jax.grad(lambda t: jumprelu_l0(pre, t))(thr)
    expected_l0 = jnp.sum(-window / eps, axis=0) / pre.shape[0]
    np.testing.assert_allclose(np.asarray(g_thr_l0), np.asarray(expected_l0), rtol=1e-6)
    # L0 sends no gradient into the pre-activations
    g_pre_l0 = jax.grad(lambda p: jumprelu_l0(p, thr))(pre)
    np.testing.assert_allclose(np.asarray(g_pre_l0), 0.0)


def test_training_lambda_controls_l0():
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_step_from_acts,
    )

    # structured data so reconstruction is learnable
    rng = np.random.default_rng(0)
    basis = rng.normal(size=(8, C)).astype(np.float32)
    codes = np.abs(rng.normal(size=(T * 8, 8))).astype(np.float32)
    acts = jnp.asarray(codes @ basis)

    def train(lam, steps=150):
        params = init_jumprelu_sae(jax.random.key(0), C, K)
        tx = optim.get_optimizer("constrained_adam", 3e-3)
        ts = init_sae_train_state(params, tx, C * K)
        step = make_sae_train_step_from_acts("jumprelu_sae", lam, tx, 10_000, K)
        batches = np.array_split(np.asarray(acts), steps % 8 + 8)
        m = None
        first = None
        for i in range(steps):
            ts, m = step(ts, jnp.asarray(batches[i % len(batches)]))
            if first is None:
                first = float(m["sae_loss"])
        # average L0 of the final params over the whole dataset
        out = sae_inference_and_loss("jumprelu_sae", ts.params, acts, lam)
        l0 = float(jnp.mean(jnp.sum((out["encoded"] != 0).astype(jnp.float32), axis=1)))
        return first, float(m["sae_loss"]), l0

    first_lo, last_lo, l0_lo = train(lam=1e-4)
    _, _, l0_hi = train(lam=3e-2)
    assert last_lo < first_lo  # it learns
    assert l0_hi < l0_lo  # stronger sparsity penalty -> fewer active latents


def test_splice_and_pipeline_integration(tmp_path):
    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfg = RunConfig(
        model_name="custom_mlp_9", sae_layer="fc1", dataset_name="synthetic",
        sae_model_name="jumprelu_sae", directory_path=str(tmp_path),
        sae_epochs=1, sae_batch_size=64, dead_neurons_steps=1000, log_every=1000,
    )
    result = Pipeline(cfg).run()
    assert np.isfinite(result["sae_rec_loss"])


def test_fused_jumprelu_parity():
    """Fused Pallas JumpReLU kernels vs the stock path (interpret mode, f32):
    forward terms, per-param grads (incl. the STE threshold gradient), one train step."""
    import pytest

    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.ops.fused_jumprelu_sae import fused_jumprelu_sae_loss_terms
    from sparse_vision_tpu.ops.metrics import measure_inactive_units
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_step_from_acts,
    )

    TILES = dict(tile_t=32, tile_h=128, compute_dtype=jnp.float32, interpret=True)
    LAMBDA = 0.01
    params = init_jumprelu_sae(jax.random.key(0), C, K)
    # spread thresholds so some pre-activations land inside the STE window
    params = {**params, "log_threshold": jnp.log(
        jnp.abs(0.2 + 0.1 * jax.random.normal(jax.random.key(7), (C * K,))))}
    x = jax.random.normal(jax.random.key(1), (T, C))

    fused = fused_jumprelu_sae_loss_terms(params, x, LAMBDA, K, **TILES)
    ref = sae_inference_and_loss("jumprelu_sae", params, x, LAMBDA)
    dead, sparsity, freq = measure_inactive_units(ref["encoded"], K)
    for k in ["loss", "rec_loss", "l0_loss", "l1_loss", "nrmse_loss", "rmse_loss"]:
        np.testing.assert_allclose(float(fused[k]), float(ref[k]), rtol=1e-5, err_msg=k)
    np.testing.assert_allclose(np.asarray(fused["decoded"]), np.asarray(ref["decoded"]),
                               rtol=1e-5, atol=1e-6)
    assert bool(jnp.all(fused["dead"] == dead))
    np.testing.assert_allclose(float(fused["sparsity"]), float(sparsity), rtol=1e-6)

    g_fused = jax.grad(
        lambda p: fused_jumprelu_sae_loss_terms(p, x, LAMBDA, K, **TILES)["loss"]
    )(params)
    g_ref = jax.grad(
        lambda p: sae_inference_and_loss("jumprelu_sae", p, x, LAMBDA)["loss"]
    )(params)
    for k in params:
        np.testing.assert_allclose(np.asarray(g_fused[k]), np.asarray(g_ref[k]),
                                   rtol=1e-4, atol=1e-7, err_msg=k)

    tx = optim.get_optimizer("constrained_adam", 1e-3)
    ts0 = init_sae_train_state(params, tx, C * K)
    step_ref = make_sae_train_step_from_acts("jumprelu_sae", LAMBDA, tx, 1000, K)
    step_fused = make_sae_train_step_from_acts(
        "jumprelu_sae", LAMBDA, tx, 1000, K, fused=True, fused_opts=TILES
    )
    ts_a, m_a = step_ref(ts0, x)
    ts_b, m_b = step_fused(ts0, x)
    for k in ["sae_loss", "sae_rec_loss", "sparsity", "perc_dead"]:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]), rtol=1e-5, err_msg=k)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-3, atol=1e-5),
        ts_a.params, ts_b.params,
    )


def test_bandwidth_scaling_unfreezes_thresholds_on_raw_activations():
    """On unnormalized activations (O(10) pre-activations, like raw GoogLeNet taps)
    the paper-default bandwidth 1e-3 leaves the STE window empty — thresholds get
    ZERO gradient and L0 never moves (observed on the chip, round 3). Scaling
    bandwidth + threshold init to the activation distribution restores threshold
    learning. Pins the jumprelu_bandwidth / jumprelu_threshold_init knobs."""
    import jax
    import jax.numpy as jnp

    from sparse_vision_tpu.models.sae import init_sae, sae_inference_and_loss

    d, exp = 16, 4
    x = jnp.asarray(10.0 * np.random.default_rng(0).normal(size=(256, d)),
                    jnp.float32)  # O(10) activations

    def thr_grad(bandwidth, threshold_init):
        params = init_sae("jumprelu_sae", jax.random.key(0), d, exp,
                          jumprelu_threshold_init=threshold_init)

        def loss(p):
            return sae_inference_and_loss(
                "jumprelu_sae", p, x, 0.1, jumprelu_bandwidth=bandwidth
            )["loss"]

        return np.abs(np.asarray(jax.grad(loss)(params)["log_threshold"]))

    frozen = thr_grad(1e-3, 1e-3)  # paper defaults: window ~never hit at this scale
    live = thr_grad(2.0, 1.0)  # scaled to the distribution
    # defaults: only the rare chance landing inside the 1e-3 window gets a gradient
    assert (frozen > 0).mean() < 0.05, "expected ~starved threshold gradients"
    assert (live > 0).mean() > 0.5, "scaled bandwidth should give most thresholds grads"
