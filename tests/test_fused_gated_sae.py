"""Fused Gated-SAE kernel parity vs the stock jnp path (interpret mode, f32):
forward loss terms + stats, gradients of loss = rec + λ·l1 + aux w.r.t. every
parameter, and one full ConstrainedAdam train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vision_tpu.models.sae import init_gated_sae, sae_inference_and_loss
from sparse_vision_tpu.ops.fused_gated_sae import fused_gated_sae_loss_terms
from sparse_vision_tpu.ops.metrics import measure_inactive_units

T, C, K = 64, 128, 2
LAMBDA = 0.7
TILES = dict(tile_t=32, tile_h=128, compute_dtype=jnp.float32, interpret=True)


@pytest.fixture(scope="module")
def setup():
    params = init_gated_sae(jax.random.key(0), C, K)
    # non-trivial gate/mag asymmetry and dead patterns
    params = {
        **params,
        "b_gate": params["b_gate"] - 0.05,
        "b_mag": params["b_mag"] + 0.03,
        "r_mag": params["r_mag"] + 0.1 * jax.random.normal(jax.random.key(5), params["r_mag"].shape),
    }
    x = jax.random.normal(jax.random.key(1), (T, C))
    return params, x


def test_forward_parity(setup):
    params, x = setup
    fused = fused_gated_sae_loss_terms(params, x, LAMBDA, K, **TILES)
    ref = sae_inference_and_loss("gated_sae", params, x, LAMBDA)
    dead, sparsity, freq = measure_inactive_units(ref["encoded"], K)
    for k in ["loss", "rec_loss", "l1_loss", "aux_loss", "nrmse_loss", "rmse_loss"]:
        np.testing.assert_allclose(float(fused[k]), float(ref[k]), rtol=1e-5, err_msg=k)
    # the fused op computes pre_mag as (x@W_gate)*exp(r) instead of x@(W_gate*exp(r));
    # mathematically identical, f32 rounding differs slightly
    np.testing.assert_allclose(
        np.asarray(fused["decoded"]), np.asarray(ref["decoded"]), rtol=1e-4, atol=1e-5
    )
    assert bool(jnp.all(fused["dead"] == dead))
    np.testing.assert_allclose(np.asarray(fused["activity_freq"]), np.asarray(freq), rtol=1e-6)
    np.testing.assert_allclose(float(fused["sparsity"]), float(sparsity), rtol=1e-6)


def test_gradient_parity(setup):
    params, x = setup

    def loss_fused(p):
        return fused_gated_sae_loss_terms(p, x, LAMBDA, K, **TILES)["loss"]

    def loss_ref(p):
        return sae_inference_and_loss("gated_sae", p, x, LAMBDA)["loss"]

    g_fused = jax.grad(loss_fused)(params)
    g_ref = jax.grad(loss_ref)(params)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_fused[k]), np.asarray(g_ref[k]),
            rtol=1e-4, atol=1e-7, err_msg=k,
        )


def test_fused_gated_train_step_matches_stock(setup):
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_step_from_acts,
    )

    params, x = setup
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    ts0 = init_sae_train_state(params, tx, C * K)
    step_ref = make_sae_train_step_from_acts("gated_sae", LAMBDA, tx, 1000, K)
    step_fused = make_sae_train_step_from_acts(
        "gated_sae", LAMBDA, tx, 1000, K, fused=True, fused_opts=TILES
    )
    ts_a, m_a = step_ref(ts0, x)
    ts_b, m_b = step_fused(ts0, x)
    for k in ["sae_loss", "sae_rec_loss", "sae_l1_loss", "sparsity", "perc_dead"]:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]), rtol=1e-5, err_msg=k)
    # Adam's g/sqrt(v) normalization amplifies the (mathematically-neutral)
    # reassociation rounding of the fused mag path into ~lr-relative param diffs
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
        ),
        ts_a.params, ts_b.params,
    )
