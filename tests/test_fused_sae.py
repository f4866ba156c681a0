"""Fused Pallas SAE kernel parity vs the stock jnp path (interpret mode, f32).

Checks forward values (losses, recon, dead/sparsity stats) AND the custom-VJP
gradients of loss = rec + λ·l1 w.r.t. every parameter and the input against
jax.grad of the reference jnp implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vision_tpu.models.sae import init_sae_mlp, sae_inference_and_loss
from sparse_vision_tpu.ops.fused_sae import fused_sae_loss_terms
from sparse_vision_tpu.ops.metrics import measure_inactive_units

T, C, H_EXP = 64, 128, 2
LAMBDA = 0.7
TILES = dict(tile_t=32, tile_h=128, compute_dtype=jnp.float32, interpret=True)


@pytest.fixture(scope="module")
def setup():
    params = init_sae_mlp(jax.random.key(0), C, H_EXP)
    # shift biases so dead/active patterns are non-trivial
    params = {**params, "b_enc": params["b_enc"] - 0.1}
    x = jax.random.normal(jax.random.key(1), (T, C))
    return params, x


def test_forward_parity(setup):
    params, x = setup
    fused = fused_sae_loss_terms(params, x, LAMBDA, H_EXP, **TILES)
    ref = sae_inference_and_loss("sae_mlp", params, x, LAMBDA)
    dead, sparsity, freq = measure_inactive_units(ref["encoded"], H_EXP)

    for k in ["loss", "rec_loss", "l1_loss", "nrmse_loss", "rmse_loss"]:
        np.testing.assert_allclose(float(fused[k]), float(ref[k]), rtol=1e-5, err_msg=k)
    np.testing.assert_allclose(
        np.asarray(fused["decoded"]), np.asarray(ref["decoded"]), rtol=1e-5, atol=1e-6
    )
    assert bool(jnp.all(fused["dead"] == dead))
    np.testing.assert_allclose(np.asarray(fused["activity_freq"]), np.asarray(freq),
                               rtol=1e-6)
    np.testing.assert_allclose(float(fused["sparsity"]), float(sparsity), rtol=1e-6)


def test_gradient_parity(setup):
    params, x = setup

    def loss_fused(p, xx):
        return fused_sae_loss_terms(p, xx, LAMBDA, H_EXP, compute_dx=True, **TILES)["loss"]

    def loss_ref(p, xx):
        return sae_inference_and_loss("sae_mlp", p, xx, LAMBDA)["loss"]

    g_fused_p, g_fused_x = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    g_ref_p, g_ref_x = jax.grad(loss_ref, argnums=(0, 1))(params, x)

    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_fused_p[k]), np.asarray(g_ref_p[k]),
            rtol=1e-4, atol=1e-7, err_msg=k,
        )
    np.testing.assert_allclose(np.asarray(g_fused_x), np.asarray(g_ref_x),
                               rtol=1e-4, atol=1e-7)


def test_fused_train_step_matches_unfused(setup):
    """One full ConstrainedAdam train step through the fused path equals the stock
    path: params, opt state, and reported metrics."""
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_step_from_acts,
    )

    params, x = setup
    tx = optim.get_optimizer("constrained_adam", 1e-3)

    ts0 = init_sae_train_state(params, tx, C * H_EXP)
    step_ref = make_sae_train_step_from_acts("sae_mlp", LAMBDA, tx, 1000, H_EXP)
    step_fused = make_sae_train_step_from_acts(
        "sae_mlp", LAMBDA, tx, 1000, H_EXP, fused=True, fused_opts=TILES
    )
    ts_a, m_a = step_ref(ts0, x)
    ts_b, m_b = step_fused(ts0, x)
    for k in ["sae_loss", "sae_rec_loss", "sae_l1_loss", "sparsity", "perc_dead"]:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]), rtol=1e-5, err_msg=k)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
        ),
        ts_a.params, ts_b.params,
    )
    assert bool(jnp.all(ts_a.dead_acc == ts_b.dead_acc))


def test_indivisible_shapes_raise(setup):
    params, x = setup
    with pytest.raises(ValueError, match="aligned tile"):
        fused_sae_loss_terms(params, x[:50], LAMBDA, H_EXP, **TILES)


def test_tile_picker_finds_aligned_divisors():
    from sparse_vision_tpu.ops.fused_sae import _pick_tiles, can_fuse

    # 1536 is not divisible by the 1024 cap, but 768 divides it
    assert _pick_tiles(1536, 16384, 1024, 512) == (768, 512)
    # small dims fall back to the full dimension (full-dim blocks are always legal)
    assert _pick_tiles(32, 256, 1024, 512) == (32, 256)
    assert _pick_tiles(50, 256, 1024, 512) == (50, 256)
    assert can_fuse(4096, 16384)
    # 1030 = 2*5*103: exceeds the cap and has no multiple-of-8 divisor under it
    assert not can_fuse(1030, 16384)


def test_tile_picker_is_vmem_aware():
    """Wide-residual shapes must keep/shrink tiles by the backward's estimated
    VMEM working set (the measured v5e points: d=768 needs 101.75 MiB at
    2048x2048 — allowed by the 112 MiB limit; d>=1024 would overflow and must
    shrink). The headline d=256 shape must be untouched."""
    import jax.numpy as jnp

    from sparse_vision_tpu.ops.fused_sae import (
        _VMEM_BUDGET,
        _VMEM_LIMIT,
        _bwd_vmem_bytes,
        _pick_tiles_vmem,
    )

    # headline bench shape (bench.py): exact optimal tiles preserved
    assert _pick_tiles_vmem(65536, 16384, 256, 2048, 2048, jnp.bfloat16) == (
        2048, 2048)
    # CLIP ViT-B/16 residual (bench_clip_sae): kept at the optimum — the
    # measured 101.75 MiB compile fits the raised limit
    assert _pick_tiles_vmem(32768, 6144, 768, 2048, 2048, jnp.bfloat16) == (
        2048, 2048)
    assert _bwd_vmem_bytes(2048, 2048, 768, 2) <= _VMEM_BUDGET < _VMEM_LIMIT
    # a ViT-L-width residual must shrink to fit
    tt, th = _pick_tiles_vmem(32768, 8192, 1024, 2048, 2048, jnp.bfloat16)
    assert (tt, th) != (2048, 2048)
    assert 32768 % tt == 0 and 8192 % th == 0
    assert tt % 8 == 0 and th % 128 == 0
    assert _bwd_vmem_bytes(tt, th, 1024, 2) <= _VMEM_BUDGET
