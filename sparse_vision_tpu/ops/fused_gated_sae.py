"""Fused Pallas TPU kernels for Gated-SAE training (Rajamanoharan et al.; reference
models/gated_sae.py:33-56 + losses/sparse_loss.py:64-75).

Same design as ops/fused_sae.py (see its docstring for the memory argument and the
grid-order accumulation rule): latents never reach HBM, the backward recomputes them
per tile, bf16 MXU compute with f32 accumulation.

Algebraic fusion: the weight-shared magnitude path ``x_cent @ (W_gate ⊙ exp(r_mag))``
equals ``(x_cent @ W_gate) ⊙ exp(r_mag)`` because exp(r_mag) rescales COLUMNS — so ONE
gate matmul feeds both paths (the stock path runs two [T,d]x[d,h] matmuls).

Loss: total = rec + λ·l1 + aux with
  rec = mse(decoded, x),  l1 = mean(relu(pi_gate)),  aux = mse(via_gate, x),
  via_gate = relu(pi_gate) @ stopgrad(W_dec) + stopgrad(b_dec).

Gradient notes (all verified against jax.grad of the stock path):
  - f_gate is a detached heaviside -> no gradient through the gate VALUE;
  - via_gate's decoder is frozen -> W_dec/b_dec get no gradient from aux;
  - b_dec gets: +Σ drecon (decoded's bias) − Σ_rows(dg) @ W_gate^T (the centering);
    the via centering path DOES flow: via depends on x_cent via pi_gate.

Differentiability contract: gradients flow through rec_loss/l1_loss/aux_loss only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_vision_tpu.ops.fused_sae import _compiler_params, _pick_tiles_vmem


def _gate(pre_gate):
    # detached heaviside with 0.5 at exactly 0 (gated_sae.py:39)
    return jnp.where(pre_gate > 0, 1.0, jnp.where(pre_gate == 0, 0.5, 0.0))


def _fwd_kernel(x_ref, w_gate_ref, b_gate_ref, b_mag_ref, er_ref, w_dec_ref, b_dec_ref,
                recon_ref, via_ref, act_part_ref, row_active_ref, l1_ref,
                *, compute_dtype):
    i = pl.program_id(0)  # T tile (outer)
    j = pl.program_id(1)  # H tile (inner; recon/via accumulate in VMEM)
    x = x_ref[:]
    x_cent = (x - b_dec_ref[:].astype(x.dtype)).astype(compute_dtype)
    g = jnp.dot(x_cent, w_gate_ref[:].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    pre_gate = g + b_gate_ref[:]
    pre_mag = g * er_ref[:] + b_mag_ref[:]
    f_mag = jnp.maximum(pre_mag, 0.0)
    enc = _gate(pre_gate) * f_mag
    relu_pi = jnp.maximum(pre_gate, 0.0)

    w_dec = w_dec_ref[:].astype(compute_dtype)
    recon_part = jnp.dot(enc.astype(compute_dtype), w_dec,
                         preferred_element_type=jnp.float32)
    via_part = jnp.dot(relu_pi.astype(compute_dtype), w_dec,
                       preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        recon_ref[:] = recon_part + b_dec_ref[:]
        via_ref[:] = via_part + b_dec_ref[:]

    @pl.when(j > 0)
    def _():
        recon_ref[:] += recon_part
        via_ref[:] += via_part

    active = (enc != 0).astype(jnp.float32)
    row_part = jnp.sum(active, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        row_active_ref[:] = row_part

    @pl.when(j > 0)
    def _():
        row_active_ref[:] += row_part

    col_part = jnp.sum(active, axis=0, keepdims=True) / 8.0
    act_part_ref[:] = jnp.broadcast_to(col_part, act_part_ref.shape)

    l1_part = jnp.sum(relu_pi)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        l1_ref[0, 0] = l1_part

    @pl.when(jnp.logical_or(i > 0, j > 0))
    def _():
        l1_ref[0, 0] += l1_part


def _bwd_kernel(x_ref, w_gate_ref, b_gate_ref, b_mag_ref, er_ref, w_dec_ref, b_dec_ref,
                err_rec_ref, err_via_ref, c_ref,
                dw_gate_ref, db_gate_ref, db_mag_ref, dr_mag_ref, dw_dec_ref,
                db_dec_ref, *, compute_dtype):
    j = pl.program_id(0)  # H tile (outer; dW accumulate over inner T)
    i = pl.program_id(1)
    cd = compute_dtype
    x = x_ref[:]
    x_cent = (x - b_dec_ref[:].astype(x.dtype)).astype(cd)
    w_gate = w_gate_ref[:]
    er = er_ref[:]
    g = jnp.dot(x_cent, w_gate.astype(cd), preferred_element_type=jnp.float32)
    pre_gate = g + b_gate_ref[:]
    pre_mag = g * er + b_mag_ref[:]
    f_mag = jnp.maximum(pre_mag, 0.0)
    gate = _gate(pre_gate)
    enc = gate * f_mag
    relu_pi = jnp.maximum(pre_gate, 0.0)

    c_rec = c_ref[0, 0]  # g_rec * 2/(T*C)
    c_l1 = c_ref[0, 1]  # g_l1 / (T*H)
    c_aux = c_ref[0, 2]  # g_aux * 2/(T*C)
    drecon = c_rec * err_rec_ref[:].astype(jnp.float32)
    dvia = c_aux * err_via_ref[:].astype(jnp.float32)

    w_dec = w_dec_ref[:]
    denc = jax.lax.dot_general(
        drecon.astype(cd), w_dec.astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_relu_pi = jax.lax.dot_general(
        dvia.astype(cd), w_dec.astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + c_l1
    d_premag = denc * gate * (pre_mag > 0)
    d_pregate = jnp.where(pre_gate > 0, d_relu_pi, 0.0)
    dg = d_premag * er + d_pregate

    dw_gate_part = jax.lax.dot_general(  # x_cent^T @ dg -> [C, TH]
        x_cent.astype(cd), dg.astype(cd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_gate_part = jnp.sum(d_pregate, axis=0, keepdims=True)
    db_mag_part = jnp.sum(d_premag, axis=0, keepdims=True)
    dr_mag_part = jnp.sum(d_premag * g, axis=0, keepdims=True) * er
    dw_dec_part = jax.lax.dot_general(  # enc^T @ drecon -> [TH, C]
        enc.astype(cd), drecon.astype(cd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dg_rowsum = jnp.sum(dg, axis=0, keepdims=True)  # [1, TH]
    db_dec_cent = -jax.lax.dot_general(
        dg_rowsum.astype(cd), w_gate.astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _():
        dw_gate_ref[:] = dw_gate_part
        db_gate_ref[:] = db_gate_part
        db_mag_ref[:] = db_mag_part
        dr_mag_ref[:] = dr_mag_part
        dw_dec_ref[:] = dw_dec_part

    @pl.when(i > 0)
    def _():
        dw_gate_ref[:] += dw_gate_part
        db_gate_ref[:] += db_gate_part
        db_mag_ref[:] += db_mag_part
        dr_mag_ref[:] += dr_mag_part
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
def make_fused_gated_sae_op(tile_t: int = 1024, tile_h: int = 2048,
                            compute_dtype=jnp.bfloat16, interpret: bool = False):
    """Fused Gated-SAE forward+loss op with custom VJP (no dx: training treats the
    activations as data; the gated path has no splice-training consumer needing it)."""

    lowp = compute_dtype != jnp.float32

    def _cast(a):
        return a.astype(compute_dtype) if lowp else a

    def _operands(params, x, h, c):
        return (
            _cast(x), _cast(params["W_gate"]),
            params["b_gate"].reshape(1, h), params["b_mag"].reshape(1, h),
            jnp.exp(params["r_mag"]).reshape(1, h).astype(jnp.float32),
            _cast(params["W_dec"]), params["b_dec"].reshape(1, c),
        )

    def _in_specs(tt, th, c, t_inner: bool):
        # index maps for (outer, inner) grid; x-like blocks follow the T index
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

    def _forward_raw(params, x):
        t, c = x.shape
        h = params["b_gate"].shape[0]
        # gated backward carries an extra err/via block pair vs the plain SAE's
        # estimator — plan against a tighter budget so wide-model tiles shrink early
        tt, th = _pick_tiles_vmem(t, h, c, tile_t, tile_h, compute_dtype,
                                  budget=88 * 2**20)
        kernel = functools.partial(_fwd_kernel, compute_dtype=compute_dtype)
        recon, via, act_part, row_active, l1_sum = pl.pallas_call(
            kernel,
            grid=(t // tt, h // th),  # H innermost
            in_specs=_in_specs(tt, th, c, t_inner=False),
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
        )(*_operands(params, x, h, c))
        return recon, via, jnp.sum(act_part, axis=0), row_active, l1_sum

    def _assemble(params, x, recon, via, act_count, row_active, l1_sum):
        t, c = x.shape
        h = params["b_gate"].shape[0]
        return {
            "rec_loss": jnp.mean(jnp.square(recon - x)),
            "l1_loss": l1_sum[0, 0] / (t * h),
            "aux_loss": jnp.mean(jnp.square(via - x)),
            "recon": recon,
            "dead": act_count == 0,
            "activity_freq": act_count / t,
            "row_active": row_active[:, 0],
        }

    @jax.custom_vjp
    def op(params, x):
        return _assemble(params, x, *_forward_raw(params, x))

    def op_fwd(params, x):
        recon, via, act_count, row_active, l1_sum = _forward_raw(params, x)
        res = (params, x, recon - x, via - x)
        return _assemble(params, x, recon, via, act_count, row_active, l1_sum), res

    def op_bwd(res, ct):
        params, x, err_rec, err_via = res
        t, c = x.shape
        h = params["b_gate"].shape[0]
        tt, th = _pick_tiles_vmem(t, h, c, tile_t, tile_h, compute_dtype,
                                  budget=88 * 2**20)
        coeffs = jnp.array(
            [[ct["rec_loss"] * 2.0 / (t * c), ct["l1_loss"] / (t * h),
              ct["aux_loss"] * 2.0 / (t * c)]], jnp.float32,
        )
        kernel = functools.partial(_bwd_kernel, compute_dtype=compute_dtype)
        x_spec = pl.BlockSpec((tt, c), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
        hs = lambda shape: pl.BlockSpec(shape, lambda j, i: (0, j), memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            grid=(h // th, t // tt),  # T innermost
            in_specs=_in_specs(tt, th, c, t_inner=True) + [
                x_spec, x_spec,
                pl.BlockSpec((1, 3), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=[
                hs((c, th)), hs((1, th)), hs((1, th)), hs((1, th)),
                pl.BlockSpec((th, c), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((c, h), jnp.float32),
                jax.ShapeDtypeStruct((1, h), jnp.float32),
                jax.ShapeDtypeStruct((1, h), jnp.float32),
                jax.ShapeDtypeStruct((1, h), jnp.float32),
                jax.ShapeDtypeStruct((h, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=_compiler_params(interpret),
        )(*_operands(params, x, h, c), err_rec, err_via, coeffs)
        dw_gate, db_gate, db_mag, dr_mag, dw_dec, db_dec = outs
        dparams = {
            "W_gate": dw_gate,
            "b_gate": db_gate[0],
            "b_mag": db_mag[0],
            "r_mag": dr_mag[0],
            "W_dec": dw_dec,
            "b_dec": db_dec[0],
        }
        return dparams, jnp.zeros_like(x)

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_gated_sae_loss_terms(params: dict, x: jax.Array, lambda_sparse: float,
                               expansion_factor: int, *, tile_t: int = 1024,
                               tile_h: int = 2048, compute_dtype=jnp.bfloat16,
                               interpret: bool = False) -> dict:
    """Fused equivalent of gated_sae_apply + gated_sae_loss_terms +
    measure_inactive_units on 2-D token input (loss = rec + λ·l1 + aux)."""
    op = make_fused_gated_sae_op(tile_t, tile_h, compute_dtype, interpret)
    out = op(params, x)
    h = params["b_gate"].shape[0]
    recon = out["recon"]
    sq = jnp.square(jax.lax.stop_gradient(recon) - jax.lax.stop_gradient(x))
    sample_mse = jnp.mean(sq, axis=0)
    sample_range = jnp.max(x, axis=0) - jnp.min(x, axis=0)
    sample_rmse = jnp.sqrt(sample_mse)
    # zero-range dims excluded from NRMSE, matching ops/losses.rmse_nrmse
    _valid = sample_range > 0
    _nrmse = jnp.sum(jnp.where(_valid, sample_rmse / jnp.where(_valid, sample_range, 1.0), 0.0)) / jnp.maximum(jnp.sum(_valid), 1)
    return {
        "loss": out["rec_loss"] + lambda_sparse * out["l1_loss"] + out["aux_loss"],
        "rec_loss": out["rec_loss"],
        "l1_loss": out["l1_loss"],
        "aux_loss": out["aux_loss"],
        "nrmse_loss": _nrmse,
        "rmse_loss": jnp.mean(sample_rmse),
        "decoded": recon,
        "dead": out["dead"],
        "activity_freq": out["activity_freq"],
        "sparsity": jnp.mean(out["row_active"] / (h / expansion_factor)),
    }
