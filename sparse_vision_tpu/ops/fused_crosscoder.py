"""Fused Pallas TPU kernels for crosscoder training (models/crosscoder.py):
L-layer encode + ReLU + L-layer decode + per-layer MSE + decoder-norm-weighted
L1 + dead-unit stats in one forward, recomputing backward.

The crosscoder REDUCES to one transcoder-shaped kernel pair by concatenation
and per-column scaling — no per-layer loops inside the kernel:

  x_cat [T, ΣC]  =  concat_l(x_l)          W_enc_cat [ΣC, h] = concat rows
  recon_cat      =  z W_dec_cat + b_dec    W_dec_cat [h, ΣC] = concat cols
  scale s_c      =  sqrt(ΣC / C_l)   for column c in layer l

Scaling BOTH the prediction and the target by s (folded into W_dec/b_dec and
y) turns the plain concatenated mean  mean_{T,ΣC}((s·err)²)  into exactly the
crosscoder's summed per-layer MSE  Σ_l mean_{T,C_l}(err²):
  (1/(T·ΣC)) Σ_l (ΣC/C_l) Σ_{T,c∈l} err² = Σ_l MSE_l.
The concat/scale graph lives OUTSIDE the kernels in plain jnp, so jax autodiff
routes the kernel's cat-space gradients back to the flat per-layer parameters
(slice + rescale) for free.

Two genuine kernel differences from ops/fused_transcoder.py:
  1. the forward emits PER-LATENT activation sums ``zsum [h] = Σ_T z_j``
     (replacing the scalar Σ|z|) — the decoder-norm-weighted L1
     ``mean_T Σ_j z_j n_j / h`` and its gradients assemble outside from zsum
     and n_j = Σ_l ||W_dec^l[j]||, which autodiff differentiates into W_dec;
  2. the backward takes a PER-LATENT L1 cotangent vector (ct_zsum [h], tiled
     like b_enc) instead of a scalar c_l1 — dpost += ct_zsum[j-block].

Same grid-order rule as every kernel here: an output block only accumulates
across CONSECUTIVE grid steps — reduction axis innermost (ops/fused_sae.py).

Differentiability contract: gradients flow through rec_loss and zsum only,
into the parameters (inputs are training data; their cotangents are zero).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_vision_tpu.ops.fused_sae import (
    _compiler_params,
    _pick_tiles_vmem,
    can_fuse,  # same (T, H) tiling constraints — re-exported for callers
)

__all__ = ["fused_crosscoder_loss_terms", "make_fused_crosscoder_op", "can_fuse"]

# v5e VMEM is 128 MiB; keep the round-3-tuned conservative budget for the cat
# space (ΣC=2,896 for the 5-layer GoogLeNet set): the measured 'input window
# allocation ... bf16[2896, 2048]' scoped-allocation failure calibrated it
_VMEM_BUDGET = 96 * 2**20


def _pick_tiles_c(t: int, h: int, c: int, tile_t: int, tile_h: int,
                  compute_dtype) -> tuple[int, int]:
    """Crosscoder tiles must respect ΣC: the cat space for 5 GoogLeNet layers
    is 2,896 columns, where fixed 2048x2048 tiles overflow VMEM in the
    backward. Delegates to the shared VMEM-aware picker (ops/fused_sae.py)
    with this module's tighter budget."""
    return _pick_tiles_vmem(t, h, c, tile_t, tile_h, compute_dtype,
                            budget=_VMEM_BUDGET)


def _fwd_kernel(x_ref, w_enc_ref, b_enc_ref, w_dec_ref, b_dec_ref,
                recon_ref, act_part_ref, row_active_ref, zsum_part_ref,
                *, compute_dtype):
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

    # per-(T tile) per-latent partials, spread over 8 rows (TPU min block rows);
    # the jnp sum over all rows reassembles the exact totals (ops/fused_sae.py)
    col_act = jnp.sum(active, axis=0, keepdims=True) / 8.0
    act_part_ref[:] = jnp.broadcast_to(col_act, act_part_ref.shape)
    col_z = jnp.sum(post, axis=0, keepdims=True) / 8.0
    zsum_part_ref[:] = jnp.broadcast_to(col_z, zsum_part_ref.shape)


def _bwd_kernel(x_ref, w_enc_ref, b_enc_ref, w_dec_ref, err_ref, c_ref,
                ct_zsum_ref,
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

    c_rec = c_ref[0, 0]  # g_rec * 2 / (T*ΣC)
    drecon = c_rec * err_ref[:].astype(jnp.float32)  # [TT, ΣC]
    dpost = jax.lax.dot_general(
        drecon.astype(cd), w_dec_ref[:].astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + ct_zsum_ref[:]  # per-latent L1 cotangent: d zsum_j / d post[t, j] = 1
    dpre = jnp.where(pre > 0, dpost, 0.0)

    dw_enc_part = jax.lax.dot_general(  # x^T @ dpre -> [ΣC, TH]
        x, dpre.astype(cd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_enc_part = jnp.sum(dpre, axis=0, keepdims=True)  # [1, TH]
    dw_dec_part = jax.lax.dot_general(  # post^T @ drecon -> [TH, ΣC]
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
    @pl.when(jnp.logical_and(j == 0, i == 0))
    def _():
        db_dec_ref[:] = jnp.sum(drecon, axis=0, keepdims=True)

    @pl.when(jnp.logical_and(j == 0, i > 0))
    def _():
        db_dec_ref[:] += jnp.sum(drecon, axis=0, keepdims=True)


@functools.lru_cache(maxsize=None)
def make_fused_crosscoder_op(tile_t: int = 2048, tile_h: int = 2048,
                             compute_dtype=jnp.bfloat16, interpret: bool = False):
    """Build the fused cat-space crosscoder op with a custom VJP.

    Returns ``op(cat_params, x_cat, y_scaled) -> dict(rec_loss, zsum, recon,
    dead, activity_freq, row_active)``; gradients flow through rec_loss and
    zsum into the (cat-space) parameters only. Callers do the concat/scale
    outside (fused_crosscoder_loss_terms)."""
    lowp = compute_dtype != jnp.float32

    def _cast(a):
        return a.astype(compute_dtype) if lowp else a

    def _forward_raw(params, x):
        recon, act_part, row_active, zsum_part = _run_fwd(
            params, x, tile_t, tile_h, compute_dtype, interpret, _cast
        )
        act_count = jnp.sum(act_part, axis=0)  # [H]
        zsum = jnp.sum(zsum_part, axis=0)  # [H] = Σ_T z_j
        return recon, act_count, row_active, zsum

    def _assemble(x, y, recon, act_count, row_active, zsum):
        t = x.shape[0]
        err = recon - y
        return {
            "rec_loss": jnp.mean(jnp.square(err)),
            "zsum": zsum,
            "recon": recon,
            "dead": act_count == 0,
            "activity_freq": act_count / t,
            "row_active": row_active[:, 0],
        }

    @jax.custom_vjp
    def op(params, x, y):
        return _assemble(x, y, *_forward_raw(params, x))

    def op_fwd(params, x, y):
        recon, act_count, row_active, zsum = _forward_raw(params, x)
        out = _assemble(x, y, recon, act_count, row_active, zsum)
        return out, (params, x, recon - y)

    def op_bwd(res, ct):
        params, x, err = res
        t, c = x.shape
        h = params["b_enc"].shape[0]
        coeffs = jnp.array([[ct["rec_loss"] * 2.0 / (t * c)]], jnp.float32)
        ct_zsum = ct["zsum"].astype(jnp.float32).reshape(1, h)
        dw_enc, db_enc, dw_dec, db_dec = _run_bwd(
            params, x, err, coeffs, ct_zsum, tile_t, tile_h, compute_dtype,
            interpret, _cast,
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


def _run_fwd(params, x, tile_t, tile_h, compute_dtype, interpret, cast):
    """The forward pallas_call on explicit cat-space operands (shared by the
    single-device op and the TP op, which runs it on local latent shards)."""
    t, c = x.shape
    h = params["b_enc"].shape[0]
    tt, th = _pick_tiles_c(t, h, c, tile_t, tile_h, compute_dtype)
    kernel = functools.partial(_fwd_kernel, compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=(t // tt, h // th),
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
            pl.BlockSpec((8, th), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, c), jnp.float32),
            jax.ShapeDtypeStruct((8 * t // tt, h), jnp.float32),
            jax.ShapeDtypeStruct((t, 1), jnp.float32),
            jax.ShapeDtypeStruct((8 * t // tt, h), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(
        cast(x), cast(params["W_enc"]), params["b_enc"].reshape(1, h),
        cast(params["W_dec"]), params["b_dec"].reshape(1, c),
    )


def _run_bwd(params, x, err, coeffs, ct_zsum, tile_t, tile_h, compute_dtype,
             interpret, cast):
    t, c = x.shape
    h = params["b_enc"].shape[0]
    tt, th = _pick_tiles_c(t, h, c, tile_t, tile_h, compute_dtype)
    kernel = functools.partial(_bwd_kernel, compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=(h // th, t // tt),
        in_specs=[
            pl.BlockSpec((tt, c), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, th), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, c), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, c), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, th), lambda j, i: (0, j), memory_space=pltpu.VMEM),
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
    )(
        cast(x), cast(params["W_enc"]), params["b_enc"].reshape(1, h),
        cast(params["W_dec"]), cast(err), coeffs, ct_zsum,
    )


def fused_crosscoder_loss_terms(
    params: dict, xs: tuple, lambda_sparse: float, expansion_factor: int, *,
    tile_t: int = 2048, tile_h: int = 2048, compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> dict:
    """Drop-in fused equivalent of crosscoder_inference_and_loss +
    measure_inactive_units on per-layer 2-D token inputs (module docstring for
    the concat/scale reduction). NRMSE/RMSE are reported on the ANCHOR layer
    (models/crosscoder.crosscoder_loss_terms convention)."""
    from sparse_vision_tpu.models.crosscoder import crosscoder_num_layers

    n_layers = crosscoder_num_layers(params)
    assert len(xs) == n_layers, (len(xs), n_layers)
    dims = tuple(int(x.shape[1]) for x in xs)
    csum = sum(dims)
    h = params["b_enc"].shape[0]
    t = xs[0].shape[0]
    # per-column scale sqrt(ΣC / C_l): static, baked at trace time
    s = jnp.concatenate(
        [jnp.full((d,), (csum / d) ** 0.5, jnp.float32) for d in dims]
    )
    w_dec_cat = jnp.concatenate(
        [params[f"W_dec_{i}"] for i in range(n_layers)], axis=1
    )
    cat_params = {
        "W_enc": jnp.concatenate(
            [params[f"W_enc_{i}"] for i in range(n_layers)], axis=0
        ),
        "b_enc": params["b_enc"],
        "W_dec": w_dec_cat * s[None, :],
        "b_dec": jnp.concatenate(
            [params[f"b_dec_{i}"] for i in range(n_layers)]
        ) * s,
    }
    x_cat = jnp.concatenate(xs, axis=1)
    op = make_fused_crosscoder_op(tile_t, tile_h, compute_dtype, interpret)
    out = op(cat_params, x_cat, x_cat * s[None, :])
    # decoder-norm-weighted L1 from the differentiable per-latent sums: the
    # zsum cotangent drives the kernel backward; the n_j path reaches W_dec
    # through this jnp norm graph (models/crosscoder.crosscoder_loss_terms)
    n_j = sum(
        jnp.linalg.norm(params[f"W_dec_{i}"], axis=1) for i in range(n_layers)
    )
    l1 = jnp.dot(out["zsum"], n_j) / (t * h)
    # anchor-layer RMSE/NRMSE: unscale the first C_0 columns (s is constant
    # per layer) and compare against the anchor input — the shared metric
    # (ops/losses.rmse_nrmse), gradients stopped like every fused op's metrics
    from sparse_vision_tpu.ops.losses import rmse_nrmse

    recon0 = jax.lax.stop_gradient(out["recon"][:, : dims[0]]) / s[0]
    rmse, nrmse = rmse_nrmse(recon0, jax.lax.stop_gradient(xs[0]))
    return {
        "loss": out["rec_loss"] + lambda_sparse * l1,
        "rec_loss": out["rec_loss"],
        "l1_loss": l1,
        "nrmse_loss": nrmse,
        "rmse_loss": rmse,
        "aux_loss": jnp.zeros((), jnp.float32),
        "dead": out["dead"],
        "activity_freq": out["activity_freq"],
        "sparsity": jnp.mean(out["row_active"] / (h / expansion_factor)),
    }


@functools.lru_cache(maxsize=None)
def make_fused_crosscoder_tp_op(n_data: int, n_model: int, tile_t: int = 2048,
                                tile_h: int = 2048, compute_dtype=jnp.bfloat16,
                                interpret: bool = False, data_axis: str = "data",
                                model_axis: str = "model"):
    """Tensor-parallel fused cat-space crosscoder op — MUST be called from
    inside a shard_map over a (data, model) mesh.

    ``op(cat_params_local, x_local, y_local, n_local)`` with the latent dim
    sharded over 'model' (W_enc [ΣC, h_l], b_enc [h_l], W_dec [h_l, ΣC];
    b_dec and the token shard's x/y replicated over 'model'). Per chip the
    unchanged kernels produce a PARTIAL reconstruction; the full one is
    ``psum_model(part) - (m-1)*b_dec``. ``n_local [h_l]`` is the per-latent
    decoder-norm weight as a DIFFERENTIABLE argument: all collectives the
    weighted L1 needs live inside this op's custom VJP (shard_map runs with
    check_vma=False, where a differentiable psum outside a custom_vjp would
    transpose to another psum and over-count replicated cotangents — the
    reason every TP op here hand-writes its backward collectives). The n_j
    -> W_dec gradient route continues OUTSIDE through the caller's local jnp
    norm graph (collective-free). Loss scalars and gradients come out GLOBAL:
    do not pmean again."""
    lowp = compute_dtype != jnp.float32

    def cast(a):
        return a.astype(compute_dtype) if lowp else a

    axes_both = (data_axis, model_axis)

    def _forward_raw(params, x):
        recon_part, act_part, row_active, zsum_part = _run_fwd(
            params, x, tile_t, tile_h, compute_dtype, interpret, cast
        )
        recon = jax.lax.psum(recon_part, model_axis) - (n_model - 1) * params[
            "b_dec"
        ].reshape(1, -1)
        act_count = jnp.sum(act_part, axis=0)  # [H_local], local batch
        zsum = jnp.sum(zsum_part, axis=0)  # [H_local], local tokens
        return recon, act_count, row_active, zsum

    def _assemble(params, x, y, n_local, recon, act_count, row_active, zsum):
        t_l = x.shape[0]
        h_l = params["b_enc"].shape[0]
        t_g = t_l * n_data
        h_g = h_l * n_model
        err = recon - y
        return {
            "rec_loss": jax.lax.pmean(jnp.mean(jnp.square(err)), data_axis),
            # decoder-norm-weighted L1: global over tokens AND latent shards
            "l1_loss": jax.lax.psum(jnp.dot(zsum, n_local), axes_both)
            / (t_g * h_g),
            "recon": recon,
            "dead": jax.lax.psum(act_count, data_axis) == 0,
            "activity_freq": jax.lax.psum(act_count, data_axis) / t_g,
            "row_active": jax.lax.psum(row_active[:, 0], model_axis),
        }

    @jax.custom_vjp
    def op(params, x, y, n_local):
        return _assemble(params, x, y, n_local, *_forward_raw(params, x))

    def op_fwd(params, x, y, n_local):
        recon, act_count, row_active, zsum = _forward_raw(params, x)
        out = _assemble(params, x, y, n_local, recon, act_count, row_active,
                        zsum)
        return out, (params, x, recon - y, n_local, zsum)

    def op_bwd(res, ct):
        params, x, err, n_local, zsum = res
        t_l = x.shape[0]
        h_l = params["b_enc"].shape[0]
        c = x.shape[1]
        t_g = t_l * n_data
        h_g = h_l * n_model
        coeffs = jnp.array(
            [[ct["rec_loss"] * 2.0 / (t_g * c)]], jnp.float32
        )
        # d l1 / d z[t, j] = n_j / (t_g * h_g): per-latent vector, local
        ct_zsum = (
            ct["l1_loss"] * n_local / (t_g * h_g)
        ).astype(jnp.float32).reshape(1, h_l)
        dw_enc, db_enc, dw_dec, db_dec = _run_bwd(
            params, x, err, coeffs, ct_zsum, tile_t, tile_h, compute_dtype,
            interpret, cast,
        )
        dparams = {
            "W_enc": jax.lax.psum(dw_enc, data_axis),
            "b_enc": jax.lax.psum(db_enc[0], data_axis),
            "W_dec": jax.lax.psum(dw_dec, data_axis),
            # identical on every model chip (err is): 'data' psum only
            "b_dec": jax.lax.psum(db_dec[0], data_axis),
        }
        # d l1 / d n_j = psum_data(zsum_j) / (t_g * h_g): each data chip's
        # token sum multiplies the same (h-local) weight
        dn = ct["l1_loss"] * jax.lax.psum(zsum, data_axis) / (t_g * h_g)
        return dparams, jnp.zeros_like(x), jnp.zeros_like(err), dn

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_crosscoder_tp_loss_terms(
    params: dict, xs: tuple, lambda_sparse: float, expansion_factor: int,
    n_data: int, n_model: int, *, tile_t: int = 2048, tile_h: int = 2048,
    compute_dtype=jnp.bfloat16, interpret: bool = False,
) -> dict:
    """TP twin of fused_crosscoder_loss_terms (call inside shard_map over a
    (data, model) mesh; ``params`` are the flat per-layer LOCAL latent shards,
    ``xs`` the per-layer local token shards replicated over 'model'). The
    concat/scale reduction and the n_j weight graph are local jnp; the
    collectives live inside make_fused_crosscoder_tp_op. NRMSE/RMSE report the
    ANCHOR layer with 'data'-axis collectives (global per-dim max/min), so the
    values match the single-device op exactly."""
    from sparse_vision_tpu.models.crosscoder import crosscoder_num_layers

    n_layers = crosscoder_num_layers(params)
    assert len(xs) == n_layers, (len(xs), n_layers)
    dims = tuple(int(x.shape[1]) for x in xs)
    csum = sum(dims)
    h_l = params["b_enc"].shape[0]
    h_g = h_l * n_model
    s = jnp.concatenate(
        [jnp.full((d,), (csum / d) ** 0.5, jnp.float32) for d in dims]
    )
    w_dec_cat = jnp.concatenate(
        [params[f"W_dec_{i}"] for i in range(n_layers)], axis=1
    )
    cat_params = {
        "W_enc": jnp.concatenate(
            [params[f"W_enc_{i}"] for i in range(n_layers)], axis=0
        ),
        "b_enc": params["b_enc"],
        "W_dec": w_dec_cat * s[None, :],
        "b_dec": jnp.concatenate(
            [params[f"b_dec_{i}"] for i in range(n_layers)]
        ) * s,
    }
    x_cat = jnp.concatenate(xs, axis=1)
    n_local = sum(
        jnp.linalg.norm(params[f"W_dec_{i}"], axis=1) for i in range(n_layers)
    )
    op = make_fused_crosscoder_tp_op(
        n_data, n_model, tile_t, tile_h, compute_dtype, interpret
    )
    out = op(cat_params, x_cat, x_cat * s[None, :], n_local)
    # anchor-layer RMSE/NRMSE (global over 'data'; stop-grad metrics)
    s0 = (csum / dims[0]) ** 0.5
    recon0 = jax.lax.stop_gradient(out["recon"][:, : dims[0]]) / s0
    y0 = xs[0]
    sq = jnp.square(recon0 - jax.lax.stop_gradient(y0))
    sample_mse = jax.lax.pmean(jnp.mean(sq, axis=0), "data")
    sample_range = jax.lax.pmax(jnp.max(y0, axis=0), "data") - jax.lax.pmin(
        jnp.min(y0, axis=0), "data"
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
        "dead": out["dead"],
        "activity_freq": out["activity_freq"],
        "sparsity": jax.lax.pmean(
            jnp.mean(out["row_active"] / (h_g / expansion_factor)), "data"
        ),
    }
