"""Fused transcoder kernels (ops/fused_transcoder.py) vs the stock path —
values, gradients, stats, and a multi-step training trajectory (interpret
mode; the compiled kernel gets chip-validated like every Pallas op here)."""

import jax
import jax.numpy as jnp
import numpy as np

from sparse_vision_tpu.models.sae import (
    init_transcoder,
    transcoder_inference_and_loss,
)
from sparse_vision_tpu.ops.fused_transcoder import fused_transcoder_loss_terms
from sparse_vision_tpu.ops.metrics import measure_inactive_units

T, C_IN, EF, C_OUT = 64, 128, 4, 96  # h = 512, rectangular decoder
TILES = dict(tile_t=32, tile_h=128, compute_dtype=jnp.float32, interpret=True)


def _setup(seed=0):
    params = init_transcoder(jax.random.key(seed), C_IN, EF, C_OUT)
    x = jax.random.normal(jax.random.key(seed + 1), (T, C_IN), jnp.float32)
    y = jax.random.normal(jax.random.key(seed + 2), (T, C_OUT), jnp.float32)
    return params, x, y


def test_fused_transcoder_forward_matches_stock():
    params, x, y = _setup()
    fused = fused_transcoder_loss_terms(params, x, y, 0.3, EF, **TILES)
    stock = transcoder_inference_and_loss(params, x, y, 0.3)
    for k in ("loss", "rec_loss", "l1_loss", "nrmse_loss", "rmse_loss"):
        np.testing.assert_allclose(
            float(fused[k]), float(stock[k]), rtol=1e-5, err_msg=k
        )
    np.testing.assert_allclose(
        np.asarray(fused["decoded"]), np.asarray(stock["decoded"]),
        rtol=1e-5, atol=1e-5,
    )
    dead, sparsity, freq = measure_inactive_units(stock["encoded"], EF)
    np.testing.assert_array_equal(np.asarray(fused["dead"]), np.asarray(dead))
    np.testing.assert_allclose(float(fused["sparsity"]), float(sparsity), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(fused["activity_freq"]), np.asarray(freq), rtol=1e-6
    )


def test_fused_transcoder_grads_match_stock():
    params, x, y = _setup(3)

    def loss_fused(p):
        out = fused_transcoder_loss_terms(p, x, y, 0.2, EF, **TILES)
        return out["loss"]

    def loss_stock(p):
        return transcoder_inference_and_loss(p, x, y, 0.2)["loss"]

    g_f = jax.grad(loss_fused)(params)
    g_s = jax.grad(loss_stock)(params)
    for k in g_s:
        np.testing.assert_allclose(
            np.asarray(g_f[k]), np.asarray(g_s[k]), rtol=1e-4, atol=1e-6,
            err_msg=k,
        )


def test_fused_transcoder_training_trajectory_matches_stock():
    """30 constrained_adam steps, fused vs stock — the end-to-end update path
    incl. the d_out-aware resample crossing (dead_neurons_steps=12 -> resample
    at step 25)."""
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import init_sae_train_state
    from sparse_vision_tpu.train.transcoder import (
        make_transcoder_train_step_from_acts,
    )

    rng = np.random.RandomState(7)
    xs = rng.randn(30, T, C_IN).astype(np.float32)
    ys = rng.randn(30, T, C_OUT).astype(np.float32)

    def run(fused):
        tx = optim.get_optimizer("constrained_adam", 1e-3)
        params = init_transcoder(jax.random.key(0), C_IN, EF, C_OUT)
        ts = init_sae_train_state(params, tx, C_IN * EF, seed=0)
        step = make_transcoder_train_step_from_acts(
            0.1, tx, 12, EF, fused=fused, fused_opts=TILES if fused else None,
        )
        for x, y in zip(xs, ys):
            ts, m = step(ts, jnp.asarray(x), jnp.asarray(y))
        return ts, m

    ts_f, m_f = run(True)
    ts_s, m_s = run(False)
    assert int(ts_f.step) == int(ts_s.step) == 30
    np.testing.assert_allclose(float(m_f["sae_loss"]), float(m_s["sae_loss"]), rtol=1e-4)
    for k in ts_s.params:
        np.testing.assert_allclose(
            np.asarray(ts_f.params[k]), np.asarray(ts_s.params[k]),
            rtol=2e-3, atol=5e-5, err_msg=k,
        )
    np.testing.assert_array_equal(
        np.asarray(ts_f.dead_acc), np.asarray(ts_s.dead_acc)
    )
    # decoder rows stay unit norm through the fused path (ConstrainedAdam)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(ts_f.params["W_dec"]), axis=1), 1.0, atol=1e-5
    )
