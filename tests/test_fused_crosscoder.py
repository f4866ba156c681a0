"""Fused crosscoder kernels (ops/fused_crosscoder.py) vs the stock path —
values, gradients (incl. the decoder-norm-weighted L1's two gradient routes:
per-latent zsum cotangent into the kernel backward, n_j path through the jnp
norm graph), stats, and a multi-step training trajectory (interpret mode; the
compiled kernel gets chip-validated like every Pallas op here)."""

import jax
import jax.numpy as jnp
import numpy as np

from sparse_vision_tpu.models.crosscoder import (
    crosscoder_inference_and_loss,
    init_crosscoder,
)
from sparse_vision_tpu.ops.fused_crosscoder import fused_crosscoder_loss_terms
from sparse_vision_tpu.ops.metrics import measure_inactive_units

T, DIMS, EF = 64, (128, 96, 64), 4  # h = 512, three layers
TILES = dict(tile_t=32, tile_h=128, compute_dtype=jnp.float32, interpret=True)


def _setup(seed=0):
    params = init_crosscoder(jax.random.key(seed), DIMS, EF)
    xs = tuple(
        jax.random.normal(jax.random.key(seed + 1 + i), (T, d), jnp.float32)
        for i, d in enumerate(DIMS)
    )
    return params, xs


def test_fused_crosscoder_forward_matches_stock():
    params, xs = _setup()
    fused = fused_crosscoder_loss_terms(params, xs, 0.3, EF, **TILES)
    stock = crosscoder_inference_and_loss(params, xs, 0.3)
    for k in ("loss", "rec_loss", "l1_loss", "nrmse_loss", "rmse_loss"):
        np.testing.assert_allclose(
            float(fused[k]), float(stock[k]), rtol=1e-5, err_msg=k
        )
    dead, sparsity, freq = measure_inactive_units(stock["encoded"], EF)
    np.testing.assert_array_equal(np.asarray(fused["dead"]), np.asarray(dead))
    np.testing.assert_allclose(float(fused["sparsity"]), float(sparsity), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(fused["activity_freq"]), np.asarray(freq), rtol=1e-6
    )


def test_fused_crosscoder_grads_match_stock():
    params, xs = _setup(3)

    def loss_fused(p):
        return fused_crosscoder_loss_terms(p, xs, 0.2, EF, **TILES)["loss"]

    def loss_stock(p):
        return crosscoder_inference_and_loss(p, xs, 0.2)["loss"]

    g_f = jax.grad(loss_fused)(params)
    g_s = jax.grad(loss_stock)(params)
    for k in g_s:
        np.testing.assert_allclose(
            np.asarray(g_f[k]), np.asarray(g_s[k]), rtol=1e-4, atol=1e-6,
            err_msg=k,
        )


def test_fused_crosscoder_training_trajectory_matches_stock():
    """30 adam steps, fused vs stock — the end-to-end update path incl. the
    multi-layer resample crossing (dead_neurons_steps=12 -> resample at 25)."""
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.crosscoder import (
        make_crosscoder_train_step_from_acts,
    )
    from sparse_vision_tpu.train.steps import init_sae_train_state

    rng = np.random.RandomState(7)
    streams = [
        rng.randn(30, T, d).astype(np.float32) for d in DIMS
    ]

    def run(fused):
        tx = optim.get_optimizer("adam", 1e-3)
        params = init_crosscoder(jax.random.key(0), DIMS, EF)
        ts = init_sae_train_state(params, tx, DIMS[0] * EF, seed=0)
        step = make_crosscoder_train_step_from_acts(
            0.1, tx, 12, EF, fused=fused, fused_opts=TILES if fused else None,
        )
        for k in range(30):
            xs = tuple(jnp.asarray(s[k]) for s in streams)
            ts, m = step(ts, xs)
        return ts, m

    ts_f, m_f = run(True)
    ts_s, m_s = run(False)
    assert int(ts_f.step) == int(ts_s.step) == 30
    for k in ("sae_loss", "sae_rec_loss", "sae_l1_loss", "sparsity", "perc_dead"):
        np.testing.assert_allclose(
            float(m_f[k]), float(m_s[k]), rtol=2e-4, err_msg=k
        )
    for k in ts_s.params:
        np.testing.assert_allclose(
            np.asarray(ts_f.params[k]), np.asarray(ts_s.params[k]),
            rtol=2e-4, atol=1e-6, err_msg=k,
        )


def test_pick_tiles_c_vmem_shrink():
    """The cat-space column count must shape the tile pick: 5-layer GoogLeNet
    crosscoders concatenate to 2,896 columns, where the default 2048x2048
    tiles overflow v5e VMEM in the backward (measured scoped-allocation
    failure, chip_queue round 3). Small cat spaces keep the requested tiles."""
    from sparse_vision_tpu.ops.fused_crosscoder import _VMEM_BUDGET, _pick_tiles_c
    from sparse_vision_tpu.ops.fused_sae import _bwd_vmem_bytes

    # the failing bench shape: T=16384, h=8192, sum_c=2896, bf16 compute
    tt, th = _pick_tiles_c(16384, 8192, 2896, 2048, 2048, jnp.bfloat16)
    assert _bwd_vmem_bytes(tt, th, 2896, 2) <= _VMEM_BUDGET, (tt, th)
    assert 16384 % tt == 0 and 8192 % th == 0
    assert tt % 8 == 0 and th % 128 == 0
    assert (tt, th) != (2048, 2048)
    # a small cat space (single-layer-SAE scale) keeps the requested tiles
    assert _pick_tiles_c(16384, 16384, 256, 2048, 2048, jnp.bfloat16) == (
        2048, 2048)
    # f32 compute doubles the block bytes -> at least as small a pick
    tt32, th32 = _pick_tiles_c(16384, 8192, 2896, 2048, 2048, jnp.float32)
    assert _bwd_vmem_bytes(tt32, th32, 2896, 4) <= _VMEM_BUDGET
