"""Fused Pallas TPU kernels for transcoder training (models/sae.transcoder_apply):
encode + ReLU + decode-to-TARGET-space + loss + dead-unit stats in one forward,
recomputing backward.

Structure mirrors ops/fused_sae.py (same grid-order rule: an output block only
accumulates across CONSECUTIVE grid steps — reduction axis innermost), with the
transcoder's three differences:
  1. no input centering (b_dec lives in the OUTPUT space, not the input's);
  2. rectangular decoder: W_dec [H, C_out], recon [T, C_out] with C_out != C_in;
  3. the reconstruction error is against a TARGET tensor y (another layer's
     activations), so the op takes (params, x, y) and err = recon - y; b_dec's
     gradient is just sum(drecon) — there is no centering path.

At the production circuit shape (mixed3a->mixed3b: C_in=256, C_out=480, 16k
latents, 32k tokens/step) the latent matrix is the same 2 GB/step HBM liability
the SAE kernel exists for; the backward recomputes pre/post per tile from x and
the saved [T, C_out] error.

Differentiability contract: gradients flow through rec_loss/l1_loss only, into
params (x and y are training data; their cotangents are zero).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_vision_tpu.ops.fused_sae import (
    _compiler_params,
    _pick_tiles,
    can_fuse,  # same (T, H) tiling constraints — re-exported for callers
)

__all__ = ["fused_transcoder_loss_terms", "make_fused_transcoder_op", "can_fuse"]


def _fwd_kernel(x_ref, w_enc_ref, b_enc_ref, w_dec_ref, b_dec_ref,
                recon_ref, act_part_ref, row_active_ref, l1_ref,
                *, compute_dtype):
    i = pl.program_id(0)  # T tile (outer)
    j = pl.program_id(1)  # H tile (inner: recon accumulates in VMEM)
    x = x_ref[:].astype(compute_dtype)
    pre = jnp.dot(
        x, w_enc_ref[:].astype(compute_dtype), preferred_element_type=jnp.float32
    ) + b_enc_ref[:]
    post = jnp.maximum(pre, 0.0)
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

    active = (post > 0).astype(jnp.float32)
    row_part = jnp.sum(active, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        row_active_ref[:] = row_part

    @pl.when(j > 0)
    def _():
        row_active_ref[:] += row_part

    # per-(T tile) activity partial, spread over 8 rows (TPU min block rows);
    # the jnp sum over all rows reassembles the exact count (ops/fused_sae.py)
    col_part = jnp.sum(active, axis=0, keepdims=True) / 8.0
    act_part_ref[:] = jnp.broadcast_to(col_part, act_part_ref.shape)

    l1_part = jnp.sum(post)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        l1_ref[0, 0] = l1_part

    @pl.when(jnp.logical_or(i > 0, j > 0))
    def _():
        l1_ref[0, 0] += l1_part


def _bwd_kernel(x_ref, w_enc_ref, b_enc_ref, w_dec_ref, err_ref, c_ref,
                dw_enc_ref, db_enc_ref, dw_dec_ref, db_dec_ref,
                *, compute_dtype):
    j = pl.program_id(0)  # H tile (outer: dW/db blocks stay resident per j)
    i = pl.program_id(1)  # T tile (inner: token reduction accumulates in VMEM)
    cd = compute_dtype
    x = x_ref[:].astype(cd)
    # recompute pre/post for this tile (never stored in HBM)
    pre = jnp.dot(
        x, w_enc_ref[:].astype(cd), preferred_element_type=jnp.float32
    ) + b_enc_ref[:]
    post = jnp.maximum(pre, 0.0)

    c_rec = c_ref[0, 0]  # g_rec * 2 / (T*C_out)
    c_l1 = c_ref[0, 1]  # g_l1 / (T*H)
    drecon = c_rec * err_ref[:].astype(jnp.float32)  # [TT, C_out]
    dpost = jax.lax.dot_general(
        drecon.astype(cd), w_dec_ref[:].astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + c_l1
    dpre = jnp.where(pre > 0, dpost, 0.0)

    dw_enc_part = jax.lax.dot_general(  # x^T @ dpre -> [C_in, TH]
        x, dpre.astype(cd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_enc_part = jnp.sum(dpre, axis=0, keepdims=True)  # [1, TH]
    dw_dec_part = jax.lax.dot_general(  # post^T @ drecon -> [TH, C_out]
        post.astype(cd), drecon.astype(cd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _():
        dw_enc_ref[:] = dw_enc_part
        db_enc_ref[:] = db_enc_part
        dw_dec_ref[:] = dw_dec_part

    @pl.when(i > 0)
    def _():
        dw_enc_ref[:] += dw_enc_part
        db_enc_ref[:] += db_enc_part
        dw_dec_ref[:] += dw_dec_part

    # db_dec = sum_T(drecon): H-independent — accumulate on the j == 0 sweep only
    # (i is innermost there, so the reduction is revisit-contiguous); j > 0 steps
    # leave the resident block untouched
    @pl.when(jnp.logical_and(j == 0, i == 0))
    def _():
        db_dec_ref[:] = jnp.sum(drecon, axis=0, keepdims=True)

    @pl.when(jnp.logical_and(j == 0, i > 0))
    def _():
        db_dec_ref[:] += jnp.sum(drecon, axis=0, keepdims=True)


@functools.lru_cache(maxsize=None)
def make_fused_transcoder_op(tile_t: int = 2048, tile_h: int = 2048,
                             compute_dtype=jnp.bfloat16, interpret: bool = False):
    """Build the fused transcoder op with a custom VJP.

    Returns ``op(params, x, y) -> dict(rec_loss, l1_loss, recon, dead,
    activity_freq, row_active)``; gradients flow through rec_loss/l1_loss into
    the parameters only."""

    lowp = compute_dtype != jnp.float32

    def _cast(a):
        # pre-cast matmul operands outside the kernels (ops/fused_sae.py rationale)
        return a.astype(compute_dtype) if lowp else a

    def _forward_raw(params, x):
        recon, act_part, row_active, l1_sum = _run_fwd_kernel(
            params, x, tile_t, tile_h, compute_dtype, interpret, _cast
        )
        act_count = jnp.sum(act_part, axis=0)  # [H]
        return recon, act_count, row_active, l1_sum

    def _assemble(params, x, y, recon, act_count, row_active, l1_sum):
        t, _ = x.shape
        h = params["b_enc"].shape[0]
        err = recon - y
        return {
            "rec_loss": jnp.mean(jnp.square(err)),
            "l1_loss": l1_sum[0, 0] / (t * h),
            "recon": recon,
            "dead": act_count == 0,
            "activity_freq": act_count / t,
            "row_active": row_active[:, 0],
        }

    @jax.custom_vjp
    def op(params, x, y):
        out = _forward_raw(params, x)
        return _assemble(params, x, y, *out)

    def op_fwd(params, x, y):
        recon, act_count, row_active, l1_sum = _forward_raw(params, x)
        res = (params, x, recon - y)
        return _assemble(params, x, y, recon, act_count, row_active, l1_sum), res

    def op_bwd(res, ct):
        params, x, err = res
        t, _ = x.shape
        h = params["b_enc"].shape[0]
        c_out = params["b_dec"].shape[0]
        coeffs = jnp.array(
            [[ct["rec_loss"] * 2.0 / (t * c_out), ct["l1_loss"] / (t * h)]],
            jnp.float32,
        )
        dw_enc, db_enc, dw_dec, db_dec = _run_bwd_kernel(
            params, x, err, coeffs, tile_t, tile_h, compute_dtype, interpret, _cast
        )
        dparams = {
            "W_enc": dw_enc,
            "b_enc": db_enc[0],
            "W_dec": dw_dec,
            "b_dec": db_dec[0],
        }
        return dparams, jnp.zeros_like(x), jnp.zeros_like(err)

    op.defvjp(op_fwd, op_bwd)
    return op


def _run_fwd_kernel(params, x, tile_t, tile_h, compute_dtype, interpret, cast):
    """The forward pallas_call on explicit operands (shared by the single-device
    op above and the TP op below, which runs it on local latent shards)."""
    t, c_in = x.shape
    h = params["b_enc"].shape[0]
    c_out = params["b_dec"].shape[0]
    tt, th = _pick_tiles(t, h, tile_t, tile_h)
    kernel = functools.partial(_fwd_kernel, compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=(t // tt, h // th),
        in_specs=[
            pl.BlockSpec((tt, c_in), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, th), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, c_out), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tt, c_out), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, th), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, c_out), jnp.float32),
            jax.ShapeDtypeStruct((8 * t // tt, h), jnp.float32),
            jax.ShapeDtypeStruct((t, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(
        cast(x), cast(params["W_enc"]), params["b_enc"].reshape(1, h),
        cast(params["W_dec"]), params["b_dec"].reshape(1, c_out),
    )


def _run_bwd_kernel(params, x, err, coeffs, tile_t, tile_h, compute_dtype,
                    interpret, cast):
    t, c_in = x.shape
    h = params["b_enc"].shape[0]
    c_out = params["b_dec"].shape[0]
    tt, th = _pick_tiles(t, h, tile_t, tile_h)
    kernel = functools.partial(_bwd_kernel, compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=(h // th, t // tt),
        in_specs=[
            pl.BlockSpec((tt, c_in), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, th), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, c_out), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, c_out), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((c_in, th), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, c_out), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c_in, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((h, c_out), jnp.float32),
            jax.ShapeDtypeStruct((1, c_out), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(
        cast(x), cast(params["W_enc"]), params["b_enc"].reshape(1, h),
        cast(params["W_dec"]), cast(err), coeffs,
    )


@functools.lru_cache(maxsize=None)
def make_fused_transcoder_tp_op(n_data: int, n_model: int, tile_t: int = 2048,
                                tile_h: int = 2048, compute_dtype=jnp.bfloat16,
                                interpret: bool = False, data_axis: str = "data",
                                model_axis: str = "model"):
    """Tensor-parallel fused transcoder op (ops/fused_sae_tp.py decomposition):
    MUST be called from inside a shard_map over a (data, model) mesh.

    Per chip: the unchanged kernels run on the local latent shard producing a
    PARTIAL target prediction; the full prediction is ``psum_model(part) -
    (m-1)*b_dec``; the MSE against y comes after the psum. In the backward,
    dW_enc/db_enc/dW_dec are H-local (psum over 'data' only) and db_dec =
    sum(drecon) is IDENTICAL on every model chip (the error is), so it psums
    over 'data' only — simpler than the SAE op, which also carries a centering
    path. Loss scalars and gradients come out GLOBAL: do not pmean again."""
    lowp = compute_dtype != jnp.float32

    def cast(a):
        return a.astype(compute_dtype) if lowp else a

    axes_both = (data_axis, model_axis)

    def _forward_raw(params, x):
        recon_part, act_part, row_active, l1_sum = _run_fwd_kernel(
            params, x, tile_t, tile_h, compute_dtype, interpret, cast
        )
        recon = jax.lax.psum(recon_part, model_axis) - (n_model - 1) * params[
            "b_dec"
        ].reshape(1, -1)
        act_count = jnp.sum(act_part, axis=0)  # [H_local], local batch
        return recon, act_count, row_active, l1_sum

    def _assemble(params, x, y, recon, act_count, row_active, l1_sum):
        t_l = x.shape[0]
        h_l = params["b_enc"].shape[0]
        t_g = t_l * n_data
        h_g = h_l * n_model
        err = recon - y
        act_count_g = jax.lax.psum(act_count, data_axis)
        return {
            "rec_loss": jax.lax.pmean(jnp.mean(jnp.square(err)), data_axis),
            "l1_loss": jax.lax.psum(l1_sum[0, 0], axes_both) / (t_g * h_g),
            "recon": recon,
            "dead": act_count_g == 0,
            "activity_freq": act_count_g / t_g,
            "row_active": jax.lax.psum(row_active[:, 0], model_axis),
        }

    @jax.custom_vjp
    def op(params, x, y):
        return _assemble(params, x, y, *_forward_raw(params, x))

    def op_fwd(params, x, y):
        recon, act_count, row_active, l1_sum = _forward_raw(params, x)
        out = _assemble(params, x, y, recon, act_count, row_active, l1_sum)
        return out, (params, x, recon - y)

    def op_bwd(res, ct):
        params, x, err = res
        t_l = x.shape[0]
        h_l = params["b_enc"].shape[0]
        c_out = params["b_dec"].shape[0]
        t_g = t_l * n_data
        h_g = h_l * n_model
        c_rec = ct["rec_loss"] * 2.0 / (t_g * c_out)
        c_l1 = ct["l1_loss"] / (t_g * h_g)
        coeffs = jnp.stack([c_rec, c_l1]).reshape(1, 2).astype(jnp.float32)
        dw_enc, db_enc, dw_dec, db_dec = _run_bwd_kernel(
            params, x, err, coeffs, tile_t, tile_h, compute_dtype, interpret, cast
        )
        dparams = {
            "W_enc": jax.lax.psum(dw_enc, data_axis),
            "b_enc": jax.lax.psum(db_enc[0], data_axis),
            "W_dec": jax.lax.psum(dw_dec, data_axis),
            # identical on every model chip (err is): 'data' psum only
            "b_dec": jax.lax.psum(db_dec[0], data_axis),
        }
        return dparams, jnp.zeros_like(x), jnp.zeros_like(err)

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_transcoder_tp_loss_terms(
    params: dict, x: jax.Array, y: jax.Array, lambda_sparse: float,
    expansion_factor: int, n_data: int, n_model: int, *, tile_t: int = 2048,
    tile_h: int = 2048, compute_dtype=jnp.bfloat16, interpret: bool = False,
) -> dict:
    """TP twin of fused_transcoder_loss_terms (call inside shard_map).
    NRMSE/RMSE assemble from the full local-token prediction with 'data'-axis
    collectives: per-dim MSE pmeans and the normalization range uses the GLOBAL
    per-dim max/min (pmax/pmin over 'data'), so the values match the
    single-device op exactly (zero-range dims excluded per ops/losses.rmse_nrmse)."""
    op = make_fused_transcoder_tp_op(
        n_data, n_model, tile_t, tile_h, compute_dtype, interpret
    )
    out = op(params, x, y)
    h_g = params["b_enc"].shape[0] * n_model
    recon = out["recon"]
    sq = jnp.square(jax.lax.stop_gradient(recon) - jax.lax.stop_gradient(y))
    sample_mse = jax.lax.pmean(jnp.mean(sq, axis=0), "data")
    sample_range = jax.lax.pmax(jnp.max(y, axis=0), "data") - jax.lax.pmin(
        jnp.min(y, axis=0), "data"
    )
    sample_rmse = jnp.sqrt(sample_mse)
    _valid = sample_range > 0
    _nrmse = jnp.sum(
        jnp.where(_valid, sample_rmse / jnp.where(_valid, sample_range, 1.0), 0.0)
    ) / jnp.maximum(jnp.sum(_valid), 1)
    return {
        "loss": out["rec_loss"] + lambda_sparse * out["l1_loss"],
        "rec_loss": out["rec_loss"],
        "l1_loss": out["l1_loss"],
        "nrmse_loss": _nrmse,
        "rmse_loss": jnp.mean(sample_rmse),
        "aux_loss": jnp.zeros((), jnp.float32),
        "decoded": recon,
        "dead": out["dead"],
        "activity_freq": out["activity_freq"],
        # GLOBAL batch sparsity (every TP loss-terms fn pmean's over 'data';
        # the value leaves the shard_map through a replicated out_spec)
        "sparsity": jax.lax.pmean(
            jnp.mean(out["row_active"] / (h_g / expansion_factor)), "data"
        ),
    }


def fused_transcoder_loss_terms(
    params: dict, x: jax.Array, y: jax.Array, lambda_sparse: float,
    expansion_factor: int, *, tile_t: int = 2048, tile_h: int = 2048,
    compute_dtype=jnp.bfloat16, interpret: bool = False,
) -> dict:
    """Drop-in fused equivalent of transcoder_inference_and_loss +
    measure_inactive_units on 2-D token input (x [T, C_in], y [T, C_out])."""
    op = make_fused_transcoder_op(tile_t, tile_h, compute_dtype, interpret)
    out = op(params, x, y)
    h = params["b_enc"].shape[0]
    recon = out["recon"]
    sq = jnp.square(jax.lax.stop_gradient(recon) - jax.lax.stop_gradient(y))
    sample_mse = jnp.mean(sq, axis=0)
    sample_range = jnp.max(y, axis=0) - jnp.min(y, axis=0)
    sample_rmse = jnp.sqrt(sample_mse)
    _valid = sample_range > 0
    _nrmse = jnp.sum(
        jnp.where(_valid, sample_rmse / jnp.where(_valid, sample_range, 1.0), 0.0)
    ) / jnp.maximum(jnp.sum(_valid), 1)
    return {
        "loss": out["rec_loss"] + lambda_sparse * out["l1_loss"],
        "rec_loss": out["rec_loss"],
        "l1_loss": out["l1_loss"],
        "nrmse_loss": _nrmse,
        "rmse_loss": jnp.mean(sample_rmse),
        "aux_loss": jnp.zeros((), jnp.float32),
        "decoded": recon,
        "dead": out["dead"],
        "activity_freq": out["activity_freq"],
        "sparsity": jnp.mean(out["row_active"] / (h / expansion_factor)),
    }
