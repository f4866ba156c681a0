"""Fused Pallas TPU kernels for JumpReLU-SAE training (Rajamanoharan et al. 2024,
arXiv:2407.14435; stock path in models/sae.py jumprelu_sae_apply + STE custom VJPs).

Same design as ops/fused_sae.py (see its docstring for the memory argument and the
grid-order accumulation rule). Differences from the ReLU kernel pair:
  - activation: post = pre * H(pre - θ) with per-latent thresholds θ = exp(log_θ);
  - sparsity term: L0 = mean per-token count of active latents — computable in jnp
    from the activity partials the forward already emits (no extra kernel output);
  - backward: no L1 term into dpre (the paper's L0 moves ONLY the thresholds); the
    threshold gradient combines both STE paths in one fused expression:
      dθ[j] = Σ_t win[t,j] · (dpost[t,j]·(−θ_j/ε) + c_l0·(−1/ε)),
    win = 1[|pre−θ| ≤ ε/2], emitted as a [1, H] accumulator; d log_θ = dθ·θ in jnp.

Differentiability contract: gradients flow through rec_loss and l0_loss only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_vision_tpu.models.sae import JUMPRELU_BANDWIDTH
from sparse_vision_tpu.ops.fused_sae import _compiler_params, _pick_tiles


def _fwd_kernel(x_ref, w_enc_ref, b_enc_ref, thr_ref, w_dec_ref, b_dec_ref,
                recon_ref, act_part_ref, row_active_ref, l1_ref,
                *, compute_dtype):
    i = pl.program_id(0)
    j = pl.program_id(1)
    x = x_ref[:]
    x_cent = (x - b_dec_ref[:].astype(x.dtype)).astype(compute_dtype)
    pre = jnp.dot(
        x_cent, w_enc_ref[:].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ) + b_enc_ref[:]
    post = jnp.where(pre > thr_ref[:], pre, 0.0)
    part = jnp.dot(
        post.astype(compute_dtype), w_dec_ref[:].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        recon_ref[:] = part + b_dec_ref[:]

    @pl.when(j > 0)
    def _():
        recon_ref[:] += part

    active = (post != 0).astype(jnp.float32)
    row_part = jnp.sum(active, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        row_active_ref[:] = row_part

    @pl.when(j > 0)
    def _():
        row_active_ref[:] += row_part

    col_part = jnp.sum(active, axis=0, keepdims=True) / 8.0
    act_part_ref[:] = jnp.broadcast_to(col_part, act_part_ref.shape)

    l1_part = jnp.sum(post)  # post >= 0 (thresholds are positive), so sum == L1

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        l1_ref[0, 0] = l1_part

    @pl.when(jnp.logical_or(i > 0, j > 0))
    def _():
        l1_ref[0, 0] += l1_part


def _bwd_kernel(x_ref, w_enc_ref, b_enc_ref, thr_ref, w_dec_ref, b_dec_ref,
                err_ref, c_ref,
                dw_enc_ref, db_enc_ref, dthr_ref, dw_dec_ref, db_dec_ref,
                *, compute_dtype, eps=JUMPRELU_BANDWIDTH):
    j = pl.program_id(0)  # H tile (outer)
    i = pl.program_id(1)  # T tile (inner; reductions accumulate in VMEM)
    cd = compute_dtype
    x_cent = (x_ref[:] - b_dec_ref[:].astype(x_ref.dtype)).astype(cd)
    w_enc = w_enc_ref[:]
    thr = thr_ref[:]
    pre = jnp.dot(x_cent, w_enc.astype(cd), preferred_element_type=jnp.float32) + b_enc_ref[:]
    mask = pre > thr
    post = jnp.where(mask, pre, 0.0)
    win = (jnp.abs(pre - thr) <= eps / 2).astype(jnp.float32)

    c_rec = c_ref[0, 0]  # g_rec * 2/(T*C)
    c_l0 = c_ref[0, 1]  # g_l0 / T
    drecon = c_rec * err_ref[:].astype(jnp.float32)
    dpost = jax.lax.dot_general(
        drecon.astype(cd), w_dec_ref[:].astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpre = jnp.where(mask, dpost, 0.0)

    dw_enc_part = jax.lax.dot_general(
        x_cent.astype(cd), dpre.astype(cd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_enc_part = jnp.sum(dpre, axis=0, keepdims=True)
    # STE threshold gradient: recon path + L0 path, fused
    dthr_part = jnp.sum(win * (dpost * (-thr / eps) + c_l0 * (-1.0 / eps)),
                        axis=0, keepdims=True)
    dw_dec_part = jax.lax.dot_general(
        post.astype(cd), drecon.astype(cd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_dec_cent = -jax.lax.dot_general(
        db_enc_part.astype(cd), w_enc.astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _():
        dw_enc_ref[:] = dw_enc_part
        db_enc_ref[:] = db_enc_part
        dthr_ref[:] = dthr_part
        dw_dec_ref[:] = dw_dec_part

    @pl.when(i > 0)
    def _():
        dw_enc_ref[:] += dw_enc_part
        db_enc_ref[:] += db_enc_part
        dthr_ref[:] += dthr_part
        dw_dec_ref[:] += dw_dec_part

    db_dec_rec = jnp.sum(drecon, axis=0, keepdims=True)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        db_dec_ref[:] = db_dec_cent + db_dec_rec

    @pl.when(jnp.logical_and(i > 0, j == 0))
    def _():
        db_dec_ref[:] += db_dec_cent + db_dec_rec

    @pl.when(jnp.logical_and(i == 0, j > 0))
    def _():
        db_dec_ref[:] += db_dec_cent

    @pl.when(jnp.logical_and(i > 0, j > 0))
    def _():
        db_dec_ref[:] += db_dec_cent


@functools.lru_cache(maxsize=None)
def make_fused_jumprelu_sae_op(tile_t: int = 2048, tile_h: int = 2048,
                               compute_dtype=jnp.bfloat16, interpret: bool = False,
                               bandwidth: float = JUMPRELU_BANDWIDTH):
    lowp = compute_dtype != jnp.float32

    def _cast(a):
        return a.astype(compute_dtype) if lowp else a

    def _operands(params, x, h, c):
        return (
            _cast(x), _cast(params["W_enc"]), params["b_enc"].reshape(1, h),
            jnp.exp(params["log_threshold"]).reshape(1, h).astype(jnp.float32),
            _cast(params["W_dec"]), params["b_dec"].reshape(1, c),
        )

    def _in_specs(tt, th, c, t_inner: bool):
        if t_inner:
            xs = pl.BlockSpec((tt, c), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
            hs = lambda shape: pl.BlockSpec(shape, lambda j, i: (0, j), memory_space=pltpu.VMEM)
            ds = pl.BlockSpec((th, c), lambda j, i: (j, 0), memory_space=pltpu.VMEM)
            cs = pl.BlockSpec((1, c), lambda j, i: (0, 0), memory_space=pltpu.VMEM)
        else:
            xs = pl.BlockSpec((tt, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
            hs = lambda shape: pl.BlockSpec(shape, lambda i, j: (0, j), memory_space=pltpu.VMEM)
            ds = pl.BlockSpec((th, c), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
            cs = pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        return [xs, hs((c, th)), hs((1, th)), hs((1, th)), ds, cs]

    def _forward_raw(params, x):
        t, c = x.shape
        h = params["b_enc"].shape[0]
        tt, th = _pick_tiles(t, h, tile_t, tile_h)
        kernel = functools.partial(_fwd_kernel, compute_dtype=compute_dtype)
        recon, act_part, row_active, l1_sum = pl.pallas_call(
            kernel,
            grid=(t // tt, h // th),
            in_specs=_in_specs(tt, th, c, t_inner=False),
            out_specs=[
                pl.BlockSpec((tt, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, th), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((tt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((t, c), jnp.float32),
                jax.ShapeDtypeStruct((8 * t // tt, h), jnp.float32),
                jax.ShapeDtypeStruct((t, 1), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=_compiler_params(interpret),
        )(*_operands(params, x, h, c))
        return recon, jnp.sum(act_part, axis=0), row_active, l1_sum

    def _assemble(params, x, recon, act_count, row_active, l1_sum):
        t, _ = x.shape
        h = params["b_enc"].shape[0]
        return {
            "rec_loss": jnp.mean(jnp.square(recon - x)),
            # L0 = mean per-token active count == sum(act_count)/T == mean(row_active)
            "l0_loss": jnp.sum(act_count) / t,
            "l1_loss": l1_sum[0, 0] / (t * h),
            "recon": recon,
            "dead": act_count == 0,
            "activity_freq": act_count / t,
            "row_active": row_active[:, 0],
        }

    @jax.custom_vjp
    def op(params, x):
        return _assemble(params, x, *_forward_raw(params, x))

    def op_fwd(params, x):
        recon, act_count, row_active, l1_sum = _forward_raw(params, x)
        res = (params, x, recon - x)
        return _assemble(params, x, recon, act_count, row_active, l1_sum), res

    def op_bwd(res, ct):
        params, x, err = res
        t, c = x.shape
        h = params["b_enc"].shape[0]
        tt, th = _pick_tiles(t, h, tile_t, tile_h)
        coeffs = jnp.array(
            [[ct["rec_loss"] * 2.0 / (t * c), ct["l0_loss"] / t]], jnp.float32
        )
        kernel = functools.partial(_bwd_kernel, compute_dtype=compute_dtype,
                                   eps=bandwidth)
        x_spec = pl.BlockSpec((tt, c), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
        hs = lambda shape: pl.BlockSpec(shape, lambda j, i: (0, j), memory_space=pltpu.VMEM)
        dw_enc, db_enc, dthr, dw_dec, db_dec = pl.pallas_call(
            kernel,
            grid=(h // th, t // tt),
            in_specs=_in_specs(tt, th, c, t_inner=True) + [
                x_spec,
                pl.BlockSpec((1, 2), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=[
                hs((c, th)), hs((1, th)), hs((1, th)),
                pl.BlockSpec((th, c), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((c, h), jnp.float32),
                jax.ShapeDtypeStruct((1, h), jnp.float32),
                jax.ShapeDtypeStruct((1, h), jnp.float32),
                jax.ShapeDtypeStruct((h, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=_compiler_params(interpret),
        )(*_operands(params, x, h, c), err, coeffs)
        thr = jnp.exp(params["log_threshold"])
        dparams = {
            "W_enc": dw_enc,
            "b_enc": db_enc[0],
            "W_dec": dw_dec,
            "b_dec": db_dec[0],
            "log_threshold": dthr[0] * thr,  # chain rule through θ = exp(log_θ)
        }
        return dparams, jnp.zeros_like(x)

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_jumprelu_sae_loss_terms(params: dict, x: jax.Array, lambda_sparse: float,
                                  expansion_factor: int, *, tile_t: int = 2048,
                                  tile_h: int = 2048, compute_dtype=jnp.bfloat16,
                                  interpret: bool = False,
                                  bandwidth: float = JUMPRELU_BANDWIDTH) -> dict:
    """Fused equivalent of jumprelu_sae_apply + jumprelu_loss_terms +
    measure_inactive_units on 2-D token input (loss = rec + λ·L0; l1 is a metric)."""
    op = make_fused_jumprelu_sae_op(tile_t, tile_h, compute_dtype, interpret,
                                    bandwidth)
    out = op(params, x)
    h = params["b_enc"].shape[0]
    recon = out["recon"]
    sq = jnp.square(jax.lax.stop_gradient(recon) - jax.lax.stop_gradient(x))
    sample_mse = jnp.mean(sq, axis=0)
    sample_range = jnp.max(x, axis=0) - jnp.min(x, axis=0)
    sample_rmse = jnp.sqrt(sample_mse)
    # zero-range dims excluded from NRMSE, matching ops/losses.rmse_nrmse
    _valid = sample_range > 0
    _nrmse = jnp.sum(jnp.where(_valid, sample_rmse / jnp.where(_valid, sample_range, 1.0), 0.0)) / jnp.maximum(jnp.sum(_valid), 1)
    return {
        "loss": out["rec_loss"] + lambda_sparse * out["l0_loss"],
        "rec_loss": out["rec_loss"],
        "l0_loss": out["l0_loss"],
        "l1_loss": out["l1_loss"],
        "aux_loss": jnp.zeros((), jnp.float32),
        "nrmse_loss": _nrmse,
        "rmse_loss": jnp.mean(sample_rmse),
        "decoded": recon,
        "dead": out["dead"],
        "activity_freq": out["activity_freq"],
        "sparsity": jnp.mean(out["row_active"] / (h / expansion_factor)),
    }
