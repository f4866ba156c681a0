"""Tensor-parallel fused SAE op: the ops/fused_sae.py Pallas kernels under a 2-D
(data, model) mesh, with the latent dim sharded over 'model'.

This closes the accumulation split called out in parallel/tensor_parallel.py:19-21
(VERDICT r2 weak #1): the configuration TP exists for (>=16k latents) is exactly
where the fused kernel buys its speedup, so TP must not fall back to stock XLA.

How the split works (per chip, inside shard_map; d = data index, k = model index):
- forward: the UNCHANGED _fwd_kernel runs on the local latent shard
  (W_enc [C, H/m], W_dec [H/m, C]) producing a PARTIAL reconstruction
  ``recon_part = post_k @ W_dec_k + b_dec``; the full reconstruction is
  ``psum_model(recon_part) - (m-1) * b_dec`` (each chip added b_dec once), and the
  MSE is computed AFTER the psum — the only cross-'model' communication in the
  forward, [T_local, C] floats per step over ICI.
- backward: the UNCHANGED _bwd_kernel consumes the FULL-reconstruction error (every
  model chip of a data column holds it identically) plus its local W shards; all of
  dW_enc/db_enc/dW_dec are H-local by construction and only need the 'data'-axis
  psum. db_dec needs two corrections: psum its centering term over 'model', and
  subtract the (m-1) double-counted direct terms (the kernel adds sum(drecon) once
  per chip).
- loss scalars are GLOBAL means (psum/pmean inside the op), so the returned
  gradients are global too — the caller must NOT pmean them again.

Exact-parity contract: with compute_dtype=float32 the op reproduces the
single-device fused op's loss and gradients (tests/test_tensor_parallel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_vision_tpu.ops.fused_gated_sae import (
    _bwd_kernel as _gated_bwd_kernel,
    _fwd_kernel as _gated_fwd_kernel,
)
from sparse_vision_tpu.ops.fused_jumprelu_sae import (
    JUMPRELU_BANDWIDTH,
    _bwd_kernel as _jr_bwd_kernel,
    _fwd_kernel as _jr_fwd_kernel,
)
from sparse_vision_tpu.ops.fused_sae import (
    _bwd_kernel,
    _compiler_params,
    _fwd_kernel,
    _pick_tiles_vmem,
)

# gated/jumprelu backwards carry extra err/state blocks vs the plain-SAE VMEM
# estimator — plan those against a tighter budget (same policy as
# ops/fused_gated_sae.py)
_GATED_BUDGET = 88 * 2**20


def _run_fwd_kernel(params, x, tile_t, tile_h, compute_dtype, interpret, cast):
    t, c = x.shape
    h = params["b_enc"].shape[0]
    tt, th = _pick_tiles_vmem(t, h, c, tile_t, tile_h, compute_dtype)
    grid = (t // tt, h // th)
    kernel = functools.partial(_fwd_kernel, compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tt, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, th), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, c), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
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
    )(
        cast(x), cast(params["W_enc"]), params["b_enc"].reshape(1, h),
        cast(params["W_dec"]), params["b_dec"].reshape(1, c),
    )


def _run_bwd_kernel(params, x, err, coeffs, tile_t, tile_h, compute_dtype,
                    interpret, cast):
    t, c = x.shape
    h = params["b_enc"].shape[0]
    tt, th = _pick_tiles_vmem(t, h, c, tile_t, tile_h, compute_dtype)
    x_spec = pl.BlockSpec((tt, c), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel, compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=(h // th, t // tt),
        in_specs=[
            x_spec,
            pl.BlockSpec((c, th), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, c), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            x_spec,
            pl.BlockSpec((1, 2), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((c, th), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, c), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((h, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(cast(x), cast(params["W_enc"]), params["b_enc"].reshape(1, h),
      cast(params["W_dec"]), params["b_dec"].reshape(1, c), cast(err), coeffs)


@functools.lru_cache(maxsize=None)
def make_fused_sae_tp_op(n_data: int, n_model: int, tile_t: int = 2048,
                         tile_h: int = 2048, compute_dtype=jnp.bfloat16,
                         interpret: bool = False, data_axis: str = "data",
                         model_axis: str = "model"):
    """Build the TP fused op. MUST be called from inside a shard_map over a mesh with
    ``data_axis`` (tokens) and ``model_axis`` (latents) of the given sizes.

    ``op(params_local, x_local) -> dict`` with GLOBAL rec_loss/l1_loss (identical on
    every chip; gradients through them are global — do not pmean again), the full
    reconstruction of the local token shard, local-latent ``dead``/``activity_freq``
    (global-batch statistics of the local latent shard), and per-token
    ``row_active`` summed over all latent shards.
    """
    lowp = compute_dtype != jnp.float32

    def cast(a):
        return a.astype(compute_dtype) if lowp else a

    axes_both = (data_axis, model_axis)

    def _forward_raw(params, x):
        recon_part, act_part, row_active, l1_sum = _run_fwd_kernel(
            params, x, tile_t, tile_h, compute_dtype, interpret, cast
        )
        # full reconstruction: sum partials over latent shards; every chip's kernel
        # added b_dec once, so remove the (m-1) extras
        recon = jax.lax.psum(recon_part, model_axis) - (n_model - 1) * params[
            "b_dec"
        ].reshape(1, -1)
        act_count = jnp.sum(act_part, axis=0)  # [H_local], local batch
        return recon, act_count, row_active, l1_sum

    def _assemble(params, x, recon, act_count, row_active, l1_sum):
        t_l, c = x.shape
        h_l = params["b_enc"].shape[0]
        t_g = t_l * n_data
        h_g = h_l * n_model
        err = recon - x
        act_count_g = jax.lax.psum(act_count, data_axis)  # global batch per unit
        return {
            "rec_loss": jax.lax.pmean(jnp.mean(jnp.square(err)), data_axis),
            "l1_loss": jax.lax.psum(l1_sum[0, 0], axes_both) / (t_g * h_g),
            "recon": recon,
            "dead": act_count_g == 0,
            "activity_freq": act_count_g / t_g,
            "row_active": jax.lax.psum(row_active[:, 0], model_axis),
        }

    @jax.custom_vjp
    def op(params, x):
        return _assemble(params, x, *_forward_raw(params, x))

    def op_fwd(params, x):
        recon, act_count, row_active, l1_sum = _forward_raw(params, x)
        out = _assemble(params, x, recon, act_count, row_active, l1_sum)
        return out, (params, x, recon - x)

    def op_bwd(res, ct):
        params, x, err = res
        t_l, c = x.shape
        h_l = params["b_enc"].shape[0]
        t_g = t_l * n_data
        h_g = h_l * n_model
        # rec_loss = pmean_data(local mean): d/d recon_local = 2 err / (n*T_l*C)
        c_rec = ct["rec_loss"] * 2.0 / (t_g * c)
        c_l1 = ct["l1_loss"] / (t_g * h_g)
        coeffs = jnp.stack([c_rec, c_l1]).reshape(1, 2).astype(jnp.float32)
        dw_enc, db_enc, dw_dec, db_dec = _run_bwd_kernel(
            params, x, err, coeffs, tile_t, tile_h, compute_dtype, interpret, cast
        )
        # the kernel adds the direct b_dec term sum(drecon) once per chip; after the
        # 'model' psum it is counted m times — subtract the (m-1) extras
        direct = c_rec * jnp.sum(err.astype(jnp.float32), axis=0)  # [C]
        dparams = {
            "W_enc": jax.lax.psum(dw_enc, data_axis),
            "b_enc": jax.lax.psum(db_enc[0], data_axis),
            "W_dec": jax.lax.psum(dw_dec, data_axis),
            "b_dec": jax.lax.psum(db_dec[0], axes_both)
            - (n_model - 1) * jax.lax.psum(direct, data_axis),
        }
        return dparams, jnp.zeros_like(x)

    op.defvjp(op_fwd, op_bwd)
    return op


# ---------------------------------------------------------------------------
# Gated SAE under TP: same decomposition as the ReLU op — the gated kernels emit
# TWO partial token-space outputs (recon AND the aux path's via_gate), both psum
# over 'model' with the (m-1)*b_dec correction. The aux path's decoder is FROZEN
# (via = relu_pi @ stopgrad(W_dec) + stopgrad(b_dec)), so the only direct b_dec
# term in the backward is sum(drecon) — the same single correction as the ReLU
# op; via's centering path flows through dg and is H-local (psums over 'data').
# Gated SAEs never resample (reference: reset_encoder_weights is SaeMLP-only), so
# no TP resample is needed.
# ---------------------------------------------------------------------------


def _gated_operands(params, x, h, c, cast):
    return (
        cast(x), cast(params["W_gate"]),
        params["b_gate"].reshape(1, h), params["b_mag"].reshape(1, h),
        jnp.exp(params["r_mag"]).reshape(1, h).astype(jnp.float32),
        cast(params["W_dec"]), params["b_dec"].reshape(1, c),
    )


def _gated_in_specs(tt, th, c, t_inner: bool):
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
    return [xs, hs((c, th)), hs((1, th)), hs((1, th)), hs((1, th)), ds, cs]


@functools.lru_cache(maxsize=None)
def make_fused_gated_sae_tp_op(n_data: int, n_model: int, tile_t: int = 1024,
                               tile_h: int = 2048, compute_dtype=jnp.bfloat16,
                               interpret: bool = False, data_axis: str = "data",
                               model_axis: str = "model"):
    """TP fused Gated-SAE op (see module + section docstrings). Same contract as
    make_fused_sae_tp_op, with gated params {W_gate, b_gate, b_mag, r_mag, W_dec,
    b_dec} and an additional global 'aux_loss'."""
    lowp = compute_dtype != jnp.float32

    def cast(a):
        return a.astype(compute_dtype) if lowp else a

    axes_both = (data_axis, model_axis)

    def _forward_raw(params, x):
        t, c = x.shape
        h = params["b_gate"].shape[0]
        tt, th = _pick_tiles_vmem(t, h, c, tile_t, tile_h, compute_dtype,
                                  budget=_GATED_BUDGET)
        kernel = functools.partial(_gated_fwd_kernel, compute_dtype=compute_dtype)
        recon_p, via_p, act_part, row_active, l1_sum = pl.pallas_call(
            kernel,
            grid=(t // tt, h // th),
            in_specs=_gated_in_specs(tt, th, c, t_inner=False),
            out_specs=[
                pl.BlockSpec((tt, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tt, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, th), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((tt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((t, c), jnp.float32),
                jax.ShapeDtypeStruct((t, c), jnp.float32),
                jax.ShapeDtypeStruct((8 * t // tt, h), jnp.float32),
                jax.ShapeDtypeStruct((t, 1), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=_compiler_params(interpret),
        )(*_gated_operands(params, x, h, c, cast))
        bd = params["b_dec"].reshape(1, -1)
        recon = jax.lax.psum(recon_p, model_axis) - (n_model - 1) * bd
        via = jax.lax.psum(via_p, model_axis) - (n_model - 1) * bd
        return recon, via, jnp.sum(act_part, axis=0), row_active, l1_sum

    def _assemble(params, x, recon, via, act_count, row_active, l1_sum):
        t_l = x.shape[0]
        h_l = params["b_gate"].shape[0]
        t_g = t_l * n_data
        h_g = h_l * n_model
        act_count_g = jax.lax.psum(act_count, data_axis)
        return {
            "rec_loss": jax.lax.pmean(jnp.mean(jnp.square(recon - x)), data_axis),
            "aux_loss": jax.lax.pmean(jnp.mean(jnp.square(via - x)), data_axis),
            "l1_loss": jax.lax.psum(l1_sum[0, 0], axes_both) / (t_g * h_g),
            "recon": recon,
            "dead": act_count_g == 0,
            "activity_freq": act_count_g / t_g,
            "row_active": jax.lax.psum(row_active[:, 0], model_axis),
        }

    @jax.custom_vjp
    def op(params, x):
        return _assemble(params, x, *_forward_raw(params, x))

    def op_fwd(params, x):
        recon, via, act_count, row_active, l1_sum = _forward_raw(params, x)
        out = _assemble(params, x, recon, via, act_count, row_active, l1_sum)
        return out, (params, x, recon - x, via - x)

    def op_bwd(res, ct):
        params, x, err_rec, err_via = res
        t_l, c = x.shape
        h_l = params["b_gate"].shape[0]
        t_g = t_l * n_data
        h_g = h_l * n_model
        tt, th = _pick_tiles_vmem(t_l, h_l, c, tile_t, tile_h, compute_dtype,
                                  budget=_GATED_BUDGET)
        c_rec = ct["rec_loss"] * 2.0 / (t_g * c)
        c_l1 = ct["l1_loss"] / (t_g * h_g)
        c_aux = ct["aux_loss"] * 2.0 / (t_g * c)
        coeffs = jnp.stack([c_rec, c_l1, c_aux]).reshape(1, 3).astype(jnp.float32)
        kernel = functools.partial(_gated_bwd_kernel, compute_dtype=compute_dtype)
        x_spec = pl.BlockSpec((tt, c), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
        hs = lambda shape: pl.BlockSpec(shape, lambda j, i: (0, j), memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            grid=(h_l // th, t_l // tt),
            in_specs=_gated_in_specs(tt, th, c, t_inner=True) + [
                x_spec, x_spec,
                pl.BlockSpec((1, 3), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=[
                hs((c, th)), hs((1, th)), hs((1, th)), hs((1, th)),
                pl.BlockSpec((th, c), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((c, h_l), jnp.float32),
                jax.ShapeDtypeStruct((1, h_l), jnp.float32),
                jax.ShapeDtypeStruct((1, h_l), jnp.float32),
                jax.ShapeDtypeStruct((1, h_l), jnp.float32),
                jax.ShapeDtypeStruct((h_l, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=_compiler_params(interpret),
        )(*_gated_operands(params, x, h_l, c, cast), err_rec, err_via, coeffs)
        dw_gate, db_gate, db_mag, dr_mag, dw_dec, db_dec = outs
        # the kernel adds the direct term sum(drecon) once per chip at j==0; the
        # via path contributes NO direct term (frozen decoder/bias)
        direct = c_rec * jnp.sum(err_rec.astype(jnp.float32), axis=0)
        dparams = {
            "W_gate": jax.lax.psum(dw_gate, data_axis),
            "b_gate": jax.lax.psum(db_gate[0], data_axis),
            "b_mag": jax.lax.psum(db_mag[0], data_axis),
            "r_mag": jax.lax.psum(dr_mag[0], data_axis),
            "W_dec": jax.lax.psum(dw_dec, data_axis),
            "b_dec": jax.lax.psum(db_dec[0], axes_both)
            - (n_model - 1) * jax.lax.psum(direct, data_axis),
        }
        return dparams, jnp.zeros_like(x)

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_gated_sae_tp_loss_terms(params: dict, x: jax.Array, lambda_sparse: float,
                                  expansion_factor: int, n_data: int, n_model: int,
                                  *, tile_t: int = 1024, tile_h: int = 2048,
                                  compute_dtype=jnp.bfloat16,
                                  interpret: bool = False,
                                  data_axis: str = "data",
                                  model_axis: str = "model") -> dict:
    """TP counterpart of fused_gated_sae_loss_terms (loss = rec + λ·l1 + aux)."""
    op = make_fused_gated_sae_tp_op(
        n_data, n_model, tile_t, tile_h, compute_dtype, interpret,
        data_axis=data_axis, model_axis=model_axis,
    )
    out = op(params, x)
    h_g = params["b_gate"].shape[0] * n_model
    sparsity = jax.lax.pmean(
        jnp.mean(out["row_active"] / (h_g / expansion_factor)), data_axis
    )
    return {
        "loss": out["rec_loss"] + lambda_sparse * out["l1_loss"] + out["aux_loss"],
        "rec_loss": out["rec_loss"],
        "l1_loss": out["l1_loss"],
        "aux_loss": out["aux_loss"],
        "decoded": out["recon"],
        "dead": out["dead"],
        "activity_freq": out["activity_freq"],
        "sparsity": sparsity,
    }


# ---------------------------------------------------------------------------
# JumpReLU SAE under TP: single token-space output (recon) like the ReLU op; the
# STE threshold gradients are H-local (thresholds live on their latent shard) and
# only need the 'data' psum; the L0 loss is a global per-token active count —
# psum(sum(act_count)) / T_global over both axes.
# ---------------------------------------------------------------------------


def _jr_operands(params, x, h, c, cast):
    return (
        cast(x), cast(params["W_enc"]), params["b_enc"].reshape(1, h),
        jnp.exp(params["log_threshold"]).reshape(1, h).astype(jnp.float32),
        cast(params["W_dec"]), params["b_dec"].reshape(1, c),
    )


def _jr_in_specs(tt, th, c, t_inner: bool):
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


@functools.lru_cache(maxsize=None)
def make_fused_jumprelu_sae_tp_op(n_data: int, n_model: int, tile_t: int = 2048,
                                  tile_h: int = 2048, compute_dtype=jnp.bfloat16,
                                  interpret: bool = False, data_axis: str = "data",
                                  model_axis: str = "model",
                                  bandwidth: float = JUMPRELU_BANDWIDTH):
    """TP fused JumpReLU op — same contract as make_fused_sae_tp_op with
    'l0_loss' (the training sparsity term) instead of gradient-carrying l1."""
    lowp = compute_dtype != jnp.float32

    def cast(a):
        return a.astype(compute_dtype) if lowp else a

    axes_both = (data_axis, model_axis)

    def _forward_raw(params, x):
        t, c = x.shape
        h = params["b_enc"].shape[0]
        tt, th = _pick_tiles_vmem(t, h, c, tile_t, tile_h, compute_dtype,
                                  budget=_GATED_BUDGET)
        kernel = functools.partial(_jr_fwd_kernel, compute_dtype=compute_dtype)
        recon_p, act_part, row_active, l1_sum = pl.pallas_call(
            kernel,
            grid=(t // tt, h // th),
            in_specs=_jr_in_specs(tt, th, c, t_inner=False),
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
        )(*_jr_operands(params, x, h, c, cast))
        recon = jax.lax.psum(recon_p, model_axis) - (n_model - 1) * params[
            "b_dec"
        ].reshape(1, -1)
        return recon, jnp.sum(act_part, axis=0), row_active, l1_sum

    def _assemble(params, x, recon, act_count, row_active, l1_sum):
        t_l = x.shape[0]
        h_l = params["b_enc"].shape[0]
        t_g = t_l * n_data
        h_g = h_l * n_model
        act_count_g = jax.lax.psum(act_count, data_axis)
        return {
            "rec_loss": jax.lax.pmean(jnp.mean(jnp.square(recon - x)), data_axis),
            "l0_loss": jax.lax.psum(jnp.sum(act_count), axes_both) / t_g,
            "l1_loss": jax.lax.psum(l1_sum[0, 0], axes_both) / (t_g * h_g),
            "recon": recon,
            "dead": act_count_g == 0,
            "activity_freq": act_count_g / t_g,
            "row_active": jax.lax.psum(row_active[:, 0], model_axis),
        }

    @jax.custom_vjp
    def op(params, x):
        return _assemble(params, x, *_forward_raw(params, x))

    def op_fwd(params, x):
        recon, act_count, row_active, l1_sum = _forward_raw(params, x)
        out = _assemble(params, x, recon, act_count, row_active, l1_sum)
        return out, (params, x, recon - x)

    def op_bwd(res, ct):
        params, x, err = res
        t_l, c = x.shape
        h_l = params["b_enc"].shape[0]
        t_g = t_l * n_data
        tt, th = _pick_tiles_vmem(t_l, h_l, c, tile_t, tile_h, compute_dtype,
                                  budget=_GATED_BUDGET)
        c_rec = ct["rec_loss"] * 2.0 / (t_g * c)
        c_l0 = ct["l0_loss"] / t_g
        coeffs = jnp.stack([c_rec, c_l0]).reshape(1, 2).astype(jnp.float32)
        kernel = functools.partial(_jr_bwd_kernel, compute_dtype=compute_dtype,
                                   eps=bandwidth)
        x_spec = pl.BlockSpec((tt, c), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
        hs = lambda shape: pl.BlockSpec(shape, lambda j, i: (0, j), memory_space=pltpu.VMEM)
        dw_enc, db_enc, dthr, dw_dec, db_dec = pl.pallas_call(
            kernel,
            grid=(h_l // th, t_l // tt),
            in_specs=_jr_in_specs(tt, th, c, t_inner=True) + [
                x_spec,
                pl.BlockSpec((1, 2), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=[
                hs((c, th)), hs((1, th)), hs((1, th)),
                pl.BlockSpec((th, c), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((c, h_l), jnp.float32),
                jax.ShapeDtypeStruct((1, h_l), jnp.float32),
                jax.ShapeDtypeStruct((1, h_l), jnp.float32),
                jax.ShapeDtypeStruct((h_l, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=_compiler_params(interpret),
        )(*_jr_operands(params, x, h_l, c, cast), err, coeffs)
        thr = jnp.exp(params["log_threshold"])
        direct = c_rec * jnp.sum(err.astype(jnp.float32), axis=0)
        dparams = {
            "W_enc": jax.lax.psum(dw_enc, data_axis),
            "b_enc": jax.lax.psum(db_enc[0], data_axis),
            "W_dec": jax.lax.psum(dw_dec, data_axis),
            "b_dec": jax.lax.psum(db_dec[0], axes_both)
            - (n_model - 1) * jax.lax.psum(direct, data_axis),
            "log_threshold": jax.lax.psum(dthr[0], data_axis) * thr,
        }
        return dparams, jnp.zeros_like(x)

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_jumprelu_sae_tp_loss_terms(params: dict, x: jax.Array,
                                     lambda_sparse: float, expansion_factor: int,
                                     n_data: int, n_model: int, *,
                                     tile_t: int = 2048, tile_h: int = 2048,
                                     compute_dtype=jnp.bfloat16,
                                     interpret: bool = False,
                                     data_axis: str = "data",
                                     model_axis: str = "model",
                                     bandwidth: float = JUMPRELU_BANDWIDTH) -> dict:
    """TP counterpart of fused_jumprelu_sae_loss_terms (loss = rec + λ·L0)."""
    op = make_fused_jumprelu_sae_tp_op(
        n_data, n_model, tile_t, tile_h, compute_dtype, interpret,
        data_axis=data_axis, model_axis=model_axis, bandwidth=bandwidth,
    )
    out = op(params, x)
    h_g = params["b_enc"].shape[0] * n_model
    sparsity = jax.lax.pmean(
        jnp.mean(out["row_active"] / (h_g / expansion_factor)), data_axis
    )
    return {
        "loss": out["rec_loss"] + lambda_sparse * out["l0_loss"],
        "rec_loss": out["rec_loss"],
        "l0_loss": out["l0_loss"],
        "l1_loss": out["l1_loss"],
        "decoded": out["recon"],
        "dead": out["dead"],
        "activity_freq": out["activity_freq"],
        "sparsity": sparsity,
    }


def fused_sae_tp_loss_terms(params: dict, x: jax.Array, lambda_sparse: float,
                            expansion_factor: int, n_data: int, n_model: int, *,
                            tile_t: int = 2048, tile_h: int = 2048,
                            compute_dtype=jnp.bfloat16,
                            interpret: bool = False,
                            data_axis: str = "data",
                            model_axis: str = "model") -> dict:
    """Shard-local loss terms with GLOBAL loss scalars — the TP counterpart of
    fused_sae_loss_terms, for use inside the TP shard_map step. ``sparsity`` is the
    global relative sparsity (reference utils.py:2063-2067 semantics)."""
    op = make_fused_sae_tp_op(
        n_data, n_model, tile_t, tile_h, compute_dtype, interpret,
        data_axis=data_axis, model_axis=model_axis,
    )
    out = op(params, x)
    h_g = params["b_enc"].shape[0] * n_model
    sparsity = jax.lax.pmean(
        jnp.mean(out["row_active"] / (h_g / expansion_factor)), data_axis
    )
    return {
        "loss": out["rec_loss"] + lambda_sparse * out["l1_loss"],
        "rec_loss": out["rec_loss"],
        "l1_loss": out["l1_loss"],
        "decoded": out["recon"],
        "dead": out["dead"],
        "activity_freq": out["activity_freq"],
        "sparsity": sparsity,
    }


# ---------------------------------------------------------------------------
# Matryoshka SAE under TP: prefix boundaries are GLOBAL latent counts while each
# chip holds a contiguous H/m latent shard, so the boundaries cut through chips.
# SPMD needs static Pallas block maps, so at build time we form the SNAPSHOT
# UNION: every global boundary clipped into local coordinates on every chip
# (e.g. boundaries (128, 512, 1024) on 4 chips of 256 -> union {128, 256}).
# All chips run the SAME matryoshka forward kernel snapshotting the latent-tile
# accumulator at that union; each chip then SELECTS its contribution to global
# prefix p by axis_index — zero when the prefix ends at or before its shard
# start, the clipped snapshot otherwise — and a psum over 'model' assembles
# every global prefix reconstruction (minus the b_dec each contributing chip
# added: ceil(m_p / H_local) chips contribute to prefix p).
# Backward reuses the single-device suffix-weighted-error kernel: tile j's
# cotangent is s_local[q] = sum_p [clip_p >= union_q] * c_p * err_p, built in
# jnp from the traced axis index. The b_dec direct term comes out counted
# ceil(m_p/H_l) times per prefix after the 'model' psum; the (n_p - 1) extras
# are subtracted exactly like the (m - 1) correction in the plain ReLU op.
# ---------------------------------------------------------------------------

from sparse_vision_tpu.ops.fused_matryoshka_sae import (  # noqa: E402
    _bwd_kernel as _mat_bwd_kernel,
    _fwd_kernel as _mat_fwd_kernel,
    _level_fn as _mat_level_fn,
    _pick_tiles as _mat_pick_tiles,
)


def _tp_snapshot_union(boundaries: tuple[int, ...], n_model: int):
    """(union of per-chip clipped boundaries, H_local, per-prefix contributing-chip
    counts). The union is the static local snapshot set shared by every chip."""
    h = boundaries[-1]
    if h % n_model:
        raise ValueError(f"latent count {h} not divisible by model axis {n_model}")
    h_l = h // n_model
    union = set()
    for k in range(n_model):
        for b in boundaries:
            c = min(max(b - k * h_l, 0), h_l)
            if c > 0:
                union.add(c)
    n_contrib = tuple(-(-b // h_l) for b in boundaries)  # ceil(m_p / h_l)
    return tuple(sorted(union)), h_l, n_contrib


def can_fuse_matryoshka_tp(t_local: int, boundaries: tuple[int, ...],
                           n_model: int, tile_t: int = 2048,
                           tile_h: int = 2048) -> bool:
    """True when the TP matryoshka kernels can tile (local tokens, global prefix
    boundaries, model-axis size) — the local tile must divide every clipped
    boundary in the cross-chip union."""
    if (not boundaries or list(boundaries) != sorted(set(boundaries))
            or boundaries[-1] % n_model):
        return False
    try:
        union, h_l, _ = _tp_snapshot_union(boundaries, n_model)
        _mat_pick_tiles(t_local, h_l, union, tile_t, tile_h)
        return True
    except ValueError:
        return False


@functools.lru_cache(maxsize=None)
def make_fused_matryoshka_sae_tp_op(boundaries: tuple[int, ...], n_data: int,
                                    n_model: int, tile_t: int = 2048,
                                    tile_h: int = 2048,
                                    compute_dtype=jnp.bfloat16,
                                    interpret: bool = False,
                                    data_axis: str = "data",
                                    model_axis: str = "model"):
    """TP fused Matryoshka op — same contract as make_fused_sae_tp_op with GLOBAL
    'prefix_losses' [P] (gradient-carrying, like l1_loss) instead of rec_loss.
    ``boundaries`` are the GLOBAL prefix latent counts (last == global H)."""
    if list(boundaries) != sorted(set(boundaries)):
        raise ValueError(f"boundaries must be strictly increasing, got {boundaries}")
    union, h_l, n_contrib = _tp_snapshot_union(boundaries, n_model)
    n_s = len(union)
    n_p = len(boundaries)
    b_arr = jnp.asarray(boundaries, jnp.int32)
    union_arr = jnp.asarray(union, jnp.int32)
    extra_bdec = jnp.asarray(n_contrib, jnp.float32) - 1.0  # [P]
    lowp = compute_dtype != jnp.float32

    def cast(a):
        return a.astype(compute_dtype) if lowp else a

    axes_both = (data_axis, model_axis)

    def _clips():
        k = jax.lax.axis_index(model_axis)
        return jnp.clip(b_arr - k * h_l, 0, h_l)  # [P] traced

    def _forward_raw(params, x):
        t, c = x.shape
        tt, th = _mat_pick_tiles(t, h_l, union, tile_t, tile_h)
        level = _mat_level_fn(union, th)
        kernel = functools.partial(_mat_fwd_kernel, compute_dtype=compute_dtype)
        snap, act_part, row_active, l1_sum = pl.pallas_call(
            kernel,
            grid=(t // tt, h_l // th),
            in_specs=[
                pl.BlockSpec((tt, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, th), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, th), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((th, c), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tt, c), lambda i, j: (level(j), i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, th), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((tt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_s, t, c), jnp.float32),
                jax.ShapeDtypeStruct((8 * t // tt, h_l), jnp.float32),
                jax.ShapeDtypeStruct((t, 1), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((tt, c), jnp.float32)],
            interpret=interpret,
            compiler_params=_compiler_params(interpret),
        )(
            cast(x), cast(params["W_enc"]), params["b_enc"].reshape(1, h_l),
            cast(params["W_dec"]), params["b_dec"].reshape(1, c),
        )
        clips = _clips()
        idx = jnp.sum(union_arr[None, :] < clips[:, None], axis=1)  # [P]
        contrib = jnp.where(
            (clips > 0)[:, None, None], jnp.take(snap, idx, axis=0), 0.0
        )
        # each contributing chip's kernel added b_dec once — remove the extras
        prefix_recon = jax.lax.psum(contrib, model_axis) - extra_bdec[
            :, None, None
        ] * params["b_dec"].reshape(1, 1, -1)
        return prefix_recon, jnp.sum(act_part, axis=0), row_active, l1_sum

    def _assemble(params, x, prefix_recon, act_count, row_active, l1_sum):
        t_l = x.shape[0]
        t_g = t_l * n_data
        h_g = h_l * n_model
        errs = prefix_recon - x[None].astype(jnp.float32)
        act_count_g = jax.lax.psum(act_count, data_axis)
        return {
            "prefix_losses": jax.lax.pmean(
                jnp.mean(jnp.square(errs), axis=(1, 2)), data_axis
            ),
            "l1_loss": jax.lax.psum(l1_sum[0, 0], axes_both) / (t_g * h_g),
            "recon": prefix_recon[-1],
            "dead": act_count_g == 0,
            "activity_freq": act_count_g / t_g,
            "row_active": jax.lax.psum(row_active[:, 0], model_axis),
        }

    @jax.custom_vjp
    def op(params, x):
        return _assemble(params, x, *_forward_raw(params, x))

    def op_fwd(params, x):
        prefix_recon, act_count, row_active, l1_sum = _forward_raw(params, x)
        out = _assemble(params, x, prefix_recon, act_count, row_active, l1_sum)
        return out, (params, x, prefix_recon - x[None].astype(jnp.float32))

    def op_bwd(res, ct):
        params, x, errs = res
        t_l, c = x.shape
        t_g = t_l * n_data
        h_g = h_l * n_model
        tt, th = _mat_pick_tiles(t_l, h_l, union, tile_t, tile_h)
        level = _mat_level_fn(union, th)
        cts = ct["prefix_losses"].astype(jnp.float32) * (2.0 / (t_g * c))  # [P]
        weighted = cts[:, None, None] * errs  # [P, T_l, C]
        # tile q's cotangent sums every prefix whose clipped boundary covers it
        cmask = (_clips()[None, :] >= union_arr[:, None]).astype(jnp.float32)
        s_local = jnp.einsum("qp,ptc->qtc", cmask, weighted)  # [n_s, T_l, C]
        coeffs = (ct["l1_loss"] / (t_g * h_g)).reshape(1, 1).astype(jnp.float32)
        x_spec = pl.BlockSpec((tt, c), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
        kernel = functools.partial(_mat_bwd_kernel, compute_dtype=compute_dtype)
        dw_enc, db_enc, dw_dec, db_dec = pl.pallas_call(
            kernel,
            grid=(h_l // th, t_l // tt),
            in_specs=[
                x_spec,
                pl.BlockSpec((c, th), lambda j, i: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, th), lambda j, i: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((th, c), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tt, c), lambda j, i: (level(j), i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((c, th), lambda j, i: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, th), lambda j, i: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((th, c), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((c, h_l), jnp.float32),
                jax.ShapeDtypeStruct((1, h_l), jnp.float32),
                jax.ShapeDtypeStruct((h_l, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=_compiler_params(interpret),
        )(
            cast(x), cast(params["W_enc"]), params["b_enc"].reshape(1, h_l),
            cast(params["W_dec"]), params["b_dec"].reshape(1, c),
            cast(s_local), coeffs,
        )
        # the kernel adds prefix p's direct b_dec term once per CONTRIBUTING chip
        # (it sums s_local[0] = the prefixes covering the chip's first tile);
        # after the 'model' psum that is n_contrib_p copies — subtract the extras
        direct_extra = jnp.einsum("p,ptc->c", extra_bdec * cts, errs)
        dparams = {
            "W_enc": jax.lax.psum(dw_enc, data_axis),
            "b_enc": jax.lax.psum(db_enc[0], data_axis),
            "W_dec": jax.lax.psum(dw_dec, data_axis),
            "b_dec": jax.lax.psum(db_dec[0], axes_both)
            - jax.lax.psum(direct_extra, data_axis),
        }
        return dparams, jnp.zeros_like(x)

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_matryoshka_sae_tp_loss_terms(
    params: dict, x: jax.Array, lambda_sparse: float, expansion_factor: int,
    n_data: int, n_model: int, prefixes: tuple[float, ...] = (0.0625, 0.25, 1.0),
    *, tile_t: int = 2048, tile_h: int = 2048, compute_dtype=jnp.bfloat16,
    interpret: bool = False, data_axis: str = "data", model_axis: str = "model",
) -> dict:
    """TP counterpart of fused_matryoshka_sae_loss_terms (loss = mean_p prefix MSE
    + λ·l1; rec_loss = full-dictionary MSE; aux_loss = the prefix surcharge)."""
    from sparse_vision_tpu.models.sae import matryoshka_prefix_counts

    h_g = params["b_enc"].shape[0] * n_model
    boundaries = matryoshka_prefix_counts(h_g, tuple(prefixes))
    op = make_fused_matryoshka_sae_tp_op(
        boundaries, n_data, n_model, tile_t, tile_h, compute_dtype, interpret,
        data_axis=data_axis, model_axis=model_axis,
    )
    out = op(params, x)
    prefix_mean = jnp.mean(out["prefix_losses"])
    rec = out["prefix_losses"][-1]
    sparsity = jax.lax.pmean(
        jnp.mean(out["row_active"] / (h_g / expansion_factor)), data_axis
    )
    return {
        "loss": prefix_mean + lambda_sparse * out["l1_loss"],
        "rec_loss": rec,
        "l1_loss": out["l1_loss"],
        "aux_loss": prefix_mean - rec,
        "decoded": out["recon"],
        "dead": out["dead"],
        "activity_freq": out["activity_freq"],
        "sparsity": sparsity,
    }
