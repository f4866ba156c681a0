"""Fused Pallas Matryoshka-SAE kernel parity vs the stock jnp path (interpret
mode, f32): forward values (prefix losses, recon, stats), custom-VJP gradients
of loss = mean_p(prefix MSE) + λ·l1, one full train step, and the tile gate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vision_tpu.models.sae import init_sae, sae_inference_and_loss
from sparse_vision_tpu.ops.fused_matryoshka_sae import (
    can_fuse_matryoshka,
    fused_matryoshka_sae_loss_terms,
)
from sparse_vision_tpu.ops.metrics import measure_inactive_units

T, C, H_EXP = 64, 128, 4  # h = 512
PREFIXES = (0.25, 0.5, 1.0)  # boundaries (128, 256, 512): gcd 128 = lane quantum
LAMBDA = 0.7
TILES = dict(tile_t=32, tile_h=128, compute_dtype=jnp.float32, interpret=True)


@pytest.fixture(scope="module")
def setup():
    params = init_sae("matryoshka_sae", jax.random.key(0), C, H_EXP)
    params = {**params, "b_enc": params["b_enc"] - 0.1}
    x = jax.random.normal(jax.random.key(1), (T, C))
    return params, x


def test_forward_parity(setup):
    params, x = setup
    fused = fused_matryoshka_sae_loss_terms(
        params, x, LAMBDA, H_EXP, PREFIXES, **TILES
    )
    ref = sae_inference_and_loss("matryoshka_sae", params, x, LAMBDA,
                                 matryoshka_prefixes=PREFIXES)
    dead, sparsity, freq = measure_inactive_units(ref["encoded"], H_EXP)

    for k in ["loss", "rec_loss", "l1_loss", "nrmse_loss", "rmse_loss", "aux_loss"]:
        np.testing.assert_allclose(float(fused[k]), float(ref[k]), rtol=1e-5,
                                   atol=1e-7, err_msg=k)
    # atol 5e-6: the tiled f32 accumulation orders differently than stock's
    # single [T, H] @ [H, C] matmul
    np.testing.assert_allclose(
        np.asarray(fused["decoded"]), np.asarray(ref["decoded"]), rtol=1e-5, atol=5e-6
    )
    assert bool(jnp.all(fused["dead"] == dead))
    np.testing.assert_allclose(np.asarray(fused["activity_freq"]), np.asarray(freq),
                               rtol=1e-6)
    np.testing.assert_allclose(float(fused["sparsity"]), float(sparsity), rtol=1e-6)


def test_prefix_losses_match_stock_prefix_recons(setup):
    """Each snapshot the kernel flushes at a prefix boundary equals the stock
    prefix reconstruction's MSE — the accumulator-passes-through-prefixes claim."""
    from sparse_vision_tpu.models.sae import (
        matryoshka_prefix_counts,
        matryoshka_sae_apply,
    )
    from sparse_vision_tpu.ops.fused_matryoshka_sae import (
        make_fused_matryoshka_sae_op,
    )

    params, x = setup
    counts = matryoshka_prefix_counts(params["b_enc"].shape[0], PREFIXES)
    op = make_fused_matryoshka_sae_op(counts, 32, 128, jnp.float32, True)
    out = op(params, x)
    _, _, _, recons = matryoshka_sae_apply(params, x, counts)
    for p, r in enumerate(recons):
        np.testing.assert_allclose(
            float(out["prefix_losses"][p]),
            float(jnp.mean(jnp.square(r - x))), rtol=1e-5, err_msg=f"prefix {p}",
        )


def test_gradient_parity(setup):
    params, x = setup

    def loss_fused(p, xx):
        return fused_matryoshka_sae_loss_terms(
            p, xx, LAMBDA, H_EXP, PREFIXES, compute_dx=True, **TILES
        )["loss"]

    def loss_ref(p, xx):
        return sae_inference_and_loss("matryoshka_sae", p, xx, LAMBDA,
                                      matryoshka_prefixes=PREFIXES)["loss"]

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
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_step_from_acts,
    )

    params, x = setup
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    ts0 = init_sae_train_state(params, tx, C * H_EXP)
    step_ref = make_sae_train_step_from_acts(
        "matryoshka_sae", LAMBDA, tx, 1000, H_EXP, matryoshka_prefixes=PREFIXES
    )
    step_fused = make_sae_train_step_from_acts(
        "matryoshka_sae", LAMBDA, tx, 1000, H_EXP, fused=True, fused_opts=TILES,
        matryoshka_prefixes=PREFIXES,
    )
    ts_a, m_a = step_ref(ts0, x)
    ts_b, m_b = step_fused(ts0, x)
    for k in ["sae_loss", "sae_rec_loss", "sae_l1_loss", "sparsity", "perc_dead"]:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]), rtol=1e-5, err_msg=k)
    # atol 2e-6: Adam's moment normalization amplifies last-ulp gradient diffs
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-6
        ),
        ts_a.params, ts_b.params,
    )
    assert bool(jnp.all(ts_a.dead_acc == ts_b.dead_acc))


def test_sharded_fused_matches_single_device(setup):
    """shard_map fused matryoshka step over the 8-device CPU mesh equals the
    single-device stock step exactly (interpret kernels)."""
    from jax.sharding import Mesh
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.parallel.sharded_steps import (
        make_sharded_fused_train_step,
        put_sharded,
    )
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_step_from_acts,
    )

    params, x = setup
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    ts0 = init_sae_train_state(params, tx, C * H_EXP)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    step_sh = make_sharded_fused_train_step(
        mesh, LAMBDA, tx, 1000, H_EXP, fused=True,
        fused_opts=dict(tile_t=8, tile_h=128, compute_dtype=jnp.float32,
                        interpret=True),
        sae_model_name="matryoshka_sae", matryoshka_prefixes=PREFIXES,
    )
    step_ref = make_sae_train_step_from_acts(
        "matryoshka_sae", LAMBDA, tx, 1000, H_EXP, matryoshka_prefixes=PREFIXES
    )
    ts_sh, acts_sh = put_sharded(mesh, ts0, x)
    ts_a, m_a = step_ref(ts0, x)
    ts_b, m_b = step_sh(ts_sh, acts_sh)
    for k in ["sae_loss", "sae_rec_loss", "sae_l1_loss"]:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]), rtol=1e-5, err_msg=k)
    # atol 2e-6: Adam's moment normalization amplifies last-ulp gradient diffs
    # (here the pmean-of-shard-means reduction reorders the sum as well)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-6
        ),
        ts_a.params, ts_b.params,
    )


def test_tile_gate():
    # boundaries must all be divisible by an aligned latent tile
    assert can_fuse_matryoshka(4096, 16384, (1024, 4096, 16384))
    assert can_fuse_matryoshka(4096, 512, (128, 256, 512), tile_h=128)
    # 64-latent first prefix: gcd 64 < lane quantum 128 -> stock fallback
    assert not can_fuse_matryoshka(4096, 512, (64, 512))
    # malformed boundary sets never fuse
    assert not can_fuse_matryoshka(4096, 512, (256, 512, 512))
    assert not can_fuse_matryoshka(4096, 512, (128, 256))  # last != h
