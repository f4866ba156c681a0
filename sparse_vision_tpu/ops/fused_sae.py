"""Fused Pallas TPU kernels for ReLU-SAE training: encode + ReLU + decode + loss +
dead-unit statistics in one forward pass, and a recomputing backward pass.

Why: at production shape (C=256 channels, 16k latents, 32k tokens/step) the latent
matrix ``post`` is [T, H] = 2 GB in f32. The stock XLA path materializes it in HBM for
the backward (plus ``pre`` for the ReLU mask), so the step is HBM-bandwidth-bound, not
MXU-bound. These kernels tile [T, H] through VMEM, never write it to HBM, and the
backward RECOMPUTES pre/post per tile from the saved residuals (x and the [T, C]
reconstruction error) — a rematerialization trade the TPU favors heavily (matmul FLOPs
are cheap on the MXU; HBM bytes are not). Matmul operands are cast to a compute dtype
(bfloat16 by default) with float32 accumulation (preferred_element_type).

Grid-order rule (learned the hard way; the compiled path silently corrupts
accumulators otherwise): an output block may only be ACCUMULATED across grid steps
whose indices are consecutive — i.e. the reduction axis must be the innermost grid
dimension for that output. Hence:
  - forward: grid (T, H) with H innermost — ``recon`` (T-indexed) accumulates its
    H-reduction in VMEM; per-latent activity is emitted as per-T-tile PARTIALS
    (written once each) and summed in jnp.
  - backward: grid (H, T) with T innermost — dW/db (H-indexed) accumulate their
    T-reduction in VMEM.
  - dx (optional, off in training): its own small kernel on the forward's grid order.

The op is the fused equivalent of sae_mlp_apply + sae_loss_terms +
measure_inactive_units on token input (models/sae.py, ops/losses.py, ops/metrics.py;
reference semantics: sae_mlp.py:42-53, sparse_loss.py:30-61, utils.py:2032-2069).

Differentiability contract: gradients flow through ``rec_loss`` and ``l1_loss`` ONLY
(the SAE training loss is ``rec + λ·l1``). Cotangents arriving on any other output
(recon, stats) are ignored by the custom_vjp — callers must treat those as metrics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(x_ref, w_enc_ref, b_enc_ref, w_dec_ref, b_dec_ref,
                recon_ref, act_part_ref, row_active_ref, l1_ref,
                *, compute_dtype):
    i = pl.program_id(0)  # T tile (outer: x/recon blocks stay resident per i)
    j = pl.program_id(1)  # H tile (inner: W blocks stream; recon accumulates in VMEM)
    x = x_ref[:]
    x_cent = (x - b_dec_ref[:].astype(x.dtype)).astype(compute_dtype)
    pre = jnp.dot(
        x_cent, w_enc_ref[:].astype(compute_dtype),
        preferred_element_type=jnp.float32,
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

    # per-(T tile) activity partial: each (i, j) block is written exactly once.
    # Blocks must be >= 8 rows on TPU, so spread the count over 8 rows (the jnp
    # reduction over ALL rows reassembles the exact count).
    col_part = jnp.sum(active, axis=0, keepdims=True) / 8.0
    act_part_ref[:] = jnp.broadcast_to(col_part, act_part_ref.shape)

    l1_part = jnp.sum(post)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        l1_ref[0, 0] = l1_part

    @pl.when(jnp.logical_or(i > 0, j > 0))
    def _():
        l1_ref[0, 0] += l1_part


def _bwd_kernel(x_ref, w_enc_ref, b_enc_ref, w_dec_ref, b_dec_ref, err_ref, c_ref,
                dw_enc_ref, db_enc_ref, dw_dec_ref, db_dec_ref,
                *, compute_dtype):
    j = pl.program_id(0)  # H tile (outer: dW/db blocks stay resident per j)
    i = pl.program_id(1)  # T tile (inner: reduction over tokens accumulates in VMEM)
    cd = compute_dtype
    x_cent = (x_ref[:] - b_dec_ref[:].astype(x_ref.dtype)).astype(cd)
    w_enc = w_enc_ref[:]
    # recompute pre/post for this tile (never stored in HBM)
    pre = jnp.dot(
        x_cent, w_enc.astype(cd), preferred_element_type=jnp.float32
    ) + b_enc_ref[:]
    post = jnp.maximum(pre, 0.0)

    c_rec = c_ref[0, 0]  # g_rec * 2 / (T*C)
    c_l1 = c_ref[0, 1]  # g_l1 / (T*H)
    drecon = c_rec * err_ref[:].astype(jnp.float32)  # [TT, C]
    dpost = jax.lax.dot_general(
        drecon.astype(cd), w_dec_ref[:].astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + c_l1
    dpre = jnp.where(pre > 0, dpost, 0.0)

    dw_enc_part = jax.lax.dot_general(  # x_cent^T @ dpre -> [C, TH]
        x_cent.astype(cd), dpre.astype(cd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_enc_part = jnp.sum(dpre, axis=0, keepdims=True)  # [1, TH]
    dw_dec_part = jax.lax.dot_general(  # post^T @ drecon -> [TH, C]
        post.astype(cd), drecon.astype(cd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # b_dec gradient: +sum(drecon) once per T tile (direct path through recon's bias),
    # -sum_rows(dpre) @ W_enc^T (through the centering x - b_dec)
    db_dec_cent = -jax.lax.dot_general(
        db_enc_part.astype(cd), w_enc.astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
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

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        db_dec_ref[:] = db_dec_cent + jnp.sum(drecon, axis=0, keepdims=True)

    @pl.when(jnp.logical_and(i > 0, j == 0))
    def _():
        db_dec_ref[:] += db_dec_cent + jnp.sum(drecon, axis=0, keepdims=True)

    @pl.when(jnp.logical_and(i == 0, j > 0))
    def _():
        db_dec_ref[:] += db_dec_cent

    @pl.when(jnp.logical_and(i > 0, j > 0))
    def _():
        db_dec_ref[:] += db_dec_cent


def _dx_kernel(x_ref, w_enc_ref, b_enc_ref, w_dec_ref, b_dec_ref, err_ref, c_ref,
               dx_ref, *, compute_dtype):
    """dx = dpre @ W_enc^T - drecon. Separate kernel on the forward grid order (T
    outer, H inner) so the H-reduction into dx is revisit-contiguous. Only used when
    differentiating w.r.t. the activations (training treats them as data)."""
    j = pl.program_id(1)
    cd = compute_dtype
    x_cent = (x_ref[:] - b_dec_ref[:].astype(x_ref.dtype)).astype(cd)
    w_enc = w_enc_ref[:]
    pre = jnp.dot(
        x_cent, w_enc.astype(cd), preferred_element_type=jnp.float32
    ) + b_enc_ref[:]
    c_rec = c_ref[0, 0]
    c_l1 = c_ref[0, 1]
    drecon = c_rec * err_ref[:].astype(jnp.float32)
    dpost = jax.lax.dot_general(
        drecon.astype(cd), w_dec_ref[:].astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + c_l1
    dpre = jnp.where(pre > 0, dpost, 0.0)
    dx_part = jax.lax.dot_general(
        dpre.astype(cd), w_enc.astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        dx_ref[:] = dx_part - drecon

    @pl.when(j > 0)
    def _():
        dx_ref[:] += dx_part


# v5e cores have far more physical VMEM than Mosaic's 16 MiB default scoped limit;
# raising it lets the kernels run larger tiles (fewer W-block reload sweeps).
# 112 MiB: the d=768 (CLIP ViT-B residual) backward needs 101.75 MiB at the
# tile-sweep-optimal 2048x2048 tiles (measured on the v5e, chip_queue round 4);
# the same chip compiles and runs at a 120 MiB limit (round-3 tile sweep), so
# 112 keeps the optimal tiles for every production width with headroom.
_VMEM_LIMIT = 112 * 2**20

# planning budget for the tile picker: keep the backward's estimated working set
# under this so the compile-time scoped allocation (which the estimate tracks
# within ~5%, calibrated on the measured 101.75 MiB / 98 MiB-estimate d=768 point)
# stays below _VMEM_LIMIT
_VMEM_BUDGET = 104 * 2**20


def _bwd_vmem_bytes(tt: int, th: int, c: int, itemsize: int) -> int:
    """Conservative VMEM working-set estimate for the BACKWARD kernel (the fat
    one): 4 double-buffered [tile, C]/[C, tile] input blocks, 2 f32 gradient
    output blocks, plus the recompute temporaries (pre/post [tt, th], drecon
    [tt, C], the two dot partials)."""
    blocks = 2 * itemsize * (2 * tt * c + 2 * c * th)  # x, err, W_enc, W_dec
    outs = 2 * 4 * (2 * c * th)  # dw_enc, dw_dec (f32)
    temps = 4 * (2 * tt * th + tt * c + 2 * c * th)
    return blocks + outs + temps


def _pick_tiles_vmem(t: int, h: int, c: int, tile_t: int, tile_h: int,
                     compute_dtype, budget: int | None = None) -> tuple[int, int]:
    """(token, latent) tiles that both divide (t, h) AND keep the backward's
    estimated VMEM working set under budget. Wide models (d_model >= ~1024 at
    the default 2048x2048 caps) would otherwise overflow the scoped-VMEM limit
    at compile time; halve the larger tile until the estimate fits."""
    tt, th = _pick_tiles(t, h, tile_t, tile_h)
    itemsize = jnp.dtype(compute_dtype).itemsize
    budget = _VMEM_BUDGET if budget is None else budget

    def _shrink(n: int, cur: int, quantum: int):
        nxt = _largest_aligned_divisor(n, max(cur // 2, quantum), quantum)
        return nxt if nxt is not None and nxt < cur else None

    while _bwd_vmem_bytes(tt, th, c, itemsize) > budget:
        first_t = tt >= th
        cand_t = _shrink(t, tt, 8)
        cand_h = _shrink(h, th, 128)
        if first_t and cand_t:
            tt = cand_t
        elif cand_h:
            th = cand_h
        elif cand_t:
            tt = cand_t
        else:
            break
    return tt, th


def _compiler_params(interpret: bool):
    return None if interpret else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _largest_aligned_divisor(n: int, cap: int, quantum: int) -> int | None:
    """Largest divisor of n that is <= cap and a multiple of quantum (None if none)."""
    start = min(cap, n)
    for cand in range(start - start % quantum, 0, -quantum):
        if n % cand == 0:
            return cand
    return None


def _pick_tiles(t: int, h: int, tile_t: int, tile_h: int) -> tuple[int, int]:
    """Pick (token, latent) tile sizes: the largest divisors of (t, h) within the
    requested caps, aligned to the TPU sublane/lane quanta (8, 128). Falls back to the
    full dimension when it is itself small enough."""
    tt = t if t <= tile_t else _largest_aligned_divisor(t, tile_t, 8)
    th = h if h <= tile_h else _largest_aligned_divisor(h, tile_h, 128)
    if tt is None or th is None:
        raise ValueError(
            f"fused SAE kernel: no aligned tile divides T={t} (cap {tile_t}, quantum 8)"
            f" / H={h} (cap {tile_h}, quantum 128)"
        )
    return tt, th


def can_fuse(t: int, h: int, tile_t: int = 1024, tile_h: int = 512) -> bool:
    """True when the fused kernels can tile this (tokens, latents) shape."""
    try:
        _pick_tiles(t, h, tile_t, tile_h)
        return True
    except ValueError:
        return False


@functools.lru_cache(maxsize=None)
def make_fused_sae_op(tile_t: int = 2048, tile_h: int = 2048,
                      compute_dtype=jnp.bfloat16, interpret: bool = False,
                      compute_dx: bool = False):
    """Build the fused SAE forward+loss op with a custom VJP.

    Returns ``op(params, x) -> dict(rec_loss, l1_loss, recon, dead, activity_freq,
    row_active)``; gradients flow through rec_loss/l1_loss into the parameters (and
    into x when compute_dx=True; otherwise the x cotangent is zero).
    """

    lowp = compute_dtype != jnp.float32

    def _cast(a):
        # pre-cast matmul operands OUTSIDE the kernels: halves their HBM streaming
        # traffic and removes the in-kernel cast buffers (the in-kernel .astype then
        # becomes a no-op); numerics are identical — operands were quantized to the
        # compute dtype before every matmul anyway
        return a.astype(compute_dtype) if lowp else a

    def _forward_raw(params, x):
        t, c = x.shape
        h = params["b_enc"].shape[0]
        tt, th = _pick_tiles_vmem(t, h, c, tile_t, tile_h, compute_dtype)
        grid = (t // tt, h // th)  # H innermost: recon accumulates contiguously
        kernel = functools.partial(_fwd_kernel, compute_dtype=compute_dtype)
        recon, act_part, row_active, l1_sum = pl.pallas_call(
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
                jax.ShapeDtypeStruct((8 * t // tt, h), jnp.float32),  # per-T-tile partials
                jax.ShapeDtypeStruct((t, 1), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=_compiler_params(interpret),
        )(
            _cast(x), _cast(params["W_enc"]), params["b_enc"].reshape(1, h),
            _cast(params["W_dec"]), params["b_dec"].reshape(1, c),
        )
        act_count = jnp.sum(act_part, axis=0)  # [H]
        return recon, act_count, row_active, l1_sum

    def _assemble(params, x, recon, act_count, row_active, l1_sum):
        t, c = x.shape
        h = params["b_enc"].shape[0]
        err = recon - x
        return {
            "rec_loss": jnp.mean(jnp.square(err)),
            "l1_loss": l1_sum[0, 0] / (t * h),
            "recon": recon,
            "dead": act_count == 0,
            "activity_freq": act_count / t,
            "row_active": row_active[:, 0],
        }

    @jax.custom_vjp
    def op(params, x):
        out = _forward_raw(params, x)
        return _assemble(params, x, *out)

    def op_fwd(params, x):
        recon, act_count, row_active, l1_sum = _forward_raw(params, x)
        res = (params, x, recon - x)
        return _assemble(params, x, recon, act_count, row_active, l1_sum), res

    def op_bwd(res, ct):
        params, x, err = res
        t, c = x.shape
        h = params["b_enc"].shape[0]
        tt, th = _pick_tiles_vmem(t, h, c, tile_t, tile_h, compute_dtype)
        # only rec_loss / l1_loss cotangents participate (see module docstring)
        coeffs = jnp.array(
            [[ct["rec_loss"] * 2.0 / (t * c), ct["l1_loss"] / (t * h)]], jnp.float32
        )
        operands = (
            _cast(x), _cast(params["W_enc"]), params["b_enc"].reshape(1, h),
            _cast(params["W_dec"]), params["b_dec"].reshape(1, c),
            _cast(err), coeffs,
        )
        x_spec_t_inner = pl.BlockSpec((tt, c), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
        kernel = functools.partial(_bwd_kernel, compute_dtype=compute_dtype)
        dw_enc, db_enc, dw_dec, db_dec = pl.pallas_call(
            kernel,
            grid=(h // th, t // tt),  # T innermost: dW accumulates contiguously
            in_specs=[
                x_spec_t_inner,
                pl.BlockSpec((c, th), lambda j, i: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, th), lambda j, i: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((th, c), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
                x_spec_t_inner,
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
        )(*operands)

        if compute_dx:
            dx_kernel = functools.partial(_dx_kernel, compute_dtype=compute_dtype)
            x_spec_h_inner = pl.BlockSpec((tt, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
            dx = pl.pallas_call(
                dx_kernel,
                grid=(t // tt, h // th),  # H innermost: dx accumulates contiguously
                in_specs=[
                    x_spec_h_inner,
                    pl.BlockSpec((c, th), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, th), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                    pl.BlockSpec((th, c), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                    x_spec_h_inner,
                    pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((tt, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((t, c), jnp.float32),
                interpret=interpret,
                compiler_params=_compiler_params(interpret),
            )(*operands)
        else:
            dx = jnp.zeros_like(x)

        dparams = {
            "W_enc": dw_enc,
            "b_enc": db_enc[0],
            "W_dec": dw_dec,
            "b_dec": db_dec[0],
        }
        return dparams, dx

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_sae_loss_terms(params: dict, x: jax.Array, lambda_sparse: float,
                         expansion_factor: int, *, tile_t: int = 2048,
                         tile_h: int = 2048, compute_dtype=jnp.bfloat16,
                         interpret: bool = False, compute_dx: bool = False) -> dict:
    """Drop-in fused equivalent of sae_inference_and_loss + measure_inactive_units on
    2-D token input: loss terms (loss = rec + λ·l1), recon, and dead/sparsity stats
    computed in-kernel. NRMSE/RMSE metrics are assembled from the [T, C] reconstruction
    in stock jnp (cheap; XLA fuses them).

    ``compute_dx=False`` (default) returns a ZERO cotangent for ``x`` — training treats
    activations as data; set True when differentiating w.r.t. the input."""
    op = make_fused_sae_op(tile_t, tile_h, compute_dtype, interpret, compute_dx)
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
