"""Fused Pallas TPU kernels for Matryoshka-SAE training (Bussmann et al. 2024).

The Matryoshka objective averages reconstruction MSE over nested latent PREFIXES
(models/sae.matryoshka_sae_apply): loss = mean_p MSE(x̂_p, x) + λ·L1, where
x̂_p uses only the first m_p latents. Run stock, that is P full [T, H] latent
materializations. Run fused, it is almost free: the ReLU-SAE forward kernel
(ops/fused_sae.py) already accumulates the reconstruction over latent (H) tiles
with H as the innermost grid axis — so the accumulator PASSES THROUGH every
prefix reconstruction on its way to the full one. This module snapshots it.

Forward (grid (T, H), H innermost, one VMEM scratch accumulator):
  - every step writes the accumulator into a [1, tile_t, C] output block whose
    index is the CURRENT prefix level; Pallas's block-revisit rule keeps the block
    resident across the level's consecutive H tiles and flushes it to HBM exactly
    when the level changes — carrying the accumulator state at the boundary tile,
    i.e. the finished prefix reconstruction. Output: prefix_recon [P, T, C].
  - prefix losses are assembled from prefix_recon in stock jnp (reading P·T·C
    floats once; negligible next to the 2·T·H·C matmul FLOPs).

Backward (grid (H, T), T innermost, recompute-backward like ops/fused_sae.py):
  d loss/d post_tile(j) sums the error of every prefix CONTAINING tile j, so the
  effective recon cotangent for tile j is the suffix-weighted error
  S_q = Σ_{p≥q} c_p·err_p (c_p = ct_p·2/(T·C)), with q = level(j). S [P, T, C]
  is precomputed in jnp from the saved prefix reconstructions; the kernel selects
  S[level(j)] through the block index map. level(0)=0 means the j==0 direct
  b_dec term sums S_0 = Σ_p c_p·err_p — exactly Σ_p of each prefix's bias path.

Tile constraint: the latent tile must divide every prefix boundary (prefix sizes
must be multiples of 128 for lane alignment); `can_fuse_matryoshka` gates the
Pipeline, which falls back to the stock XLA path otherwise.

Differentiability contract: gradients flow through ``prefix_losses`` and
``l1_loss`` ONLY; all other outputs are metrics (cotangents ignored), matching
the fused_sae contract. Parity vs the stock path: tests/test_fused_matryoshka.py
(interpret mode) + on-chip compiled trajectory.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_vision_tpu.ops.fused_sae import (
    _VMEM_LIMIT,
    _compiler_params,
    _largest_aligned_divisor,
)


def _pick_tiles(t: int, h: int, boundaries: tuple[int, ...],
                tile_t: int, tile_h: int) -> tuple[int, int]:
    """(token, latent) tiles: largest aligned divisors within caps, with the latent
    tile additionally dividing every prefix boundary (so each prefix ends exactly at
    a tile boundary and the accumulator snapshot is the prefix reconstruction)."""
    g = 0
    for b in boundaries:
        g = math.gcd(g, b)
    tt = t if t <= tile_t else _largest_aligned_divisor(t, tile_t, 8)
    th = _largest_aligned_divisor(g, tile_h, 128)
    if tt is None or th is None:
        raise ValueError(
            f"fused matryoshka kernel: no aligned tile divides T={t} (cap {tile_t},"
            f" quantum 8) / gcd(boundaries)={g} (cap {tile_h}, quantum 128)"
        )
    return tt, th


def can_fuse_matryoshka(t: int, h: int, boundaries: tuple[int, ...],
                        tile_t: int = 2048, tile_h: int = 2048) -> bool:
    """True when the fused kernels can tile this (tokens, prefix boundaries) shape."""
    if not boundaries or boundaries[-1] != h or list(boundaries) != sorted(set(boundaries)):
        return False
    try:
        _pick_tiles(t, h, boundaries, tile_t, tile_h)
        return True
    except ValueError:
        return False


def _level_fn(boundaries: tuple[int, ...], th: int):
    """Static prefix-level lookup for the block index maps: level(j) = index of the
    smallest prefix containing H tile j. bt_p = last tile of prefix p."""
    bts = tuple(b // th - 1 for b in boundaries[:-1])

    def level(j):
        lvl = 0
        for bt in bts:
            lvl = lvl + jnp.where(j > bt, 1, 0)
        return lvl

    return level


def _fwd_kernel(x_ref, w_enc_ref, b_enc_ref, w_dec_ref, b_dec_ref,
                prefix_recon_ref, act_part_ref, row_active_ref, l1_ref,
                recon_acc, *, compute_dtype):
    i = pl.program_id(0)  # T tile (outer)
    j = pl.program_id(1)  # H tile (inner: accumulator sweeps the latent dim)
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
        recon_acc[:] = part + b_dec_ref[:]

    @pl.when(j > 0)
    def _():
        recon_acc[:] += part

    # resident block for the CURRENT level; flushed at the level change carrying the
    # boundary-tile accumulator = the prefix reconstruction (module docstring)
    prefix_recon_ref[0] = recon_acc[:]

    active = (post > 0).astype(jnp.float32)
    row_part = jnp.sum(active, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        row_active_ref[:] = row_part

    @pl.when(j > 0)
    def _():
        row_active_ref[:] += row_part

    # per-(T tile) activity partial, written exactly once per (i, j); >=8-row blocks
    # spread the count over 8 rows (jnp reduction over rows reassembles it)
    col_part = jnp.sum(active, axis=0, keepdims=True) / 8.0
    act_part_ref[:] = jnp.broadcast_to(col_part, act_part_ref.shape)

    l1_part = jnp.sum(post)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        l1_ref[0, 0] = l1_part

    @pl.when(jnp.logical_or(i > 0, j > 0))
    def _():
        l1_ref[0, 0] += l1_part


def _bwd_kernel(x_ref, w_enc_ref, b_enc_ref, w_dec_ref, b_dec_ref, s_ref, c_ref,
                dw_enc_ref, db_enc_ref, dw_dec_ref, db_dec_ref,
                *, compute_dtype):
    j = pl.program_id(0)  # H tile (outer: dW/db blocks stay resident per j)
    i = pl.program_id(1)  # T tile (inner: token reduction accumulates in VMEM)
    cd = compute_dtype
    x_cent = (x_ref[:] - b_dec_ref[:].astype(x_ref.dtype)).astype(cd)
    w_enc = w_enc_ref[:]
    pre = jnp.dot(
        x_cent, w_enc.astype(cd), preferred_element_type=jnp.float32
    ) + b_enc_ref[:]
    post = jnp.maximum(pre, 0.0)

    c_l1 = c_ref[0, 0]  # g_l1 / (T*H)
    # suffix-weighted error for this tile's level (already carries the Σ_p c_p
    # weighting; see module docstring)
    drecon = s_ref[0].astype(jnp.float32)  # [TT, C]
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
    # b_dec: direct path = Σ_t S_0 (level(0)=0, so the j==0 drecon IS S_0);
    # centering path = -Σ_rows(dpre) @ W_enc^T, accumulated over every tile
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


def _dx_kernel(x_ref, w_enc_ref, b_enc_ref, w_dec_ref, b_dec_ref, s_ref, c_ref,
               dx_ref, *, compute_dtype):
    """dx = Σ_j dpre_j @ W_enc_j^T − S_0, on the forward grid order (T outer, H
    inner) so the H-reduction into dx is revisit-contiguous."""
    j = pl.program_id(1)
    cd = compute_dtype
    x_cent = (x_ref[:] - b_dec_ref[:].astype(x_ref.dtype)).astype(cd)
    w_enc = w_enc_ref[:]
    pre = jnp.dot(
        x_cent, w_enc.astype(cd), preferred_element_type=jnp.float32
    ) + b_enc_ref[:]
    c_l1 = c_ref[0, 0]
    drecon = s_ref[0].astype(jnp.float32)
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
        dx_ref[:] = dx_part - drecon  # level(0)=0: the j==0 drecon is S_0

    @pl.when(j > 0)
    def _():
        dx_ref[:] += dx_part


@functools.lru_cache(maxsize=None)
def make_fused_matryoshka_sae_op(boundaries: tuple[int, ...], tile_t: int = 2048,
                                 tile_h: int = 2048, compute_dtype=jnp.bfloat16,
                                 interpret: bool = False,
                                 compute_dx: bool = False):
    """Build the fused Matryoshka-SAE forward+loss op with a custom VJP.

    ``boundaries`` are the prefix latent counts (strictly increasing, last == H;
    models/sae.matryoshka_prefix_counts). Returns ``op(params, x) -> dict(
    prefix_losses [P], l1_loss, recon, dead, activity_freq, row_active)``;
    gradients flow through prefix_losses/l1_loss into the parameters (and into x
    when compute_dx=True; otherwise the x cotangent is zero).
    """
    if list(boundaries) != sorted(set(boundaries)):
        raise ValueError(f"boundaries must be strictly increasing, got {boundaries}")
    n_prefix = len(boundaries)
    lowp = compute_dtype != jnp.float32

    def _cast(a):
        # pre-cast matmul operands outside the kernels (see ops/fused_sae.py)
        return a.astype(compute_dtype) if lowp else a

    def _forward_raw(params, x):
        t, c = x.shape
        h = params["b_enc"].shape[0]
        if boundaries[-1] != h:
            raise ValueError(f"last boundary {boundaries[-1]} != latent count {h}")
        tt, th = _pick_tiles(t, h, boundaries, tile_t, tile_h)
        level = _level_fn(boundaries, th)
        grid = (t // tt, h // th)  # H innermost: the accumulator sweeps the latents
        kernel = functools.partial(_fwd_kernel, compute_dtype=compute_dtype)
        prefix_recon, act_part, row_active, l1_sum = pl.pallas_call(
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
                pl.BlockSpec((1, tt, c), lambda i, j: (level(j), i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, th), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((tt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_prefix, t, c), jnp.float32),
                jax.ShapeDtypeStruct((8 * t // tt, h), jnp.float32),
                jax.ShapeDtypeStruct((t, 1), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((tt, c), jnp.float32)],
            interpret=interpret,
            compiler_params=_compiler_params(interpret),
        )(
            _cast(x), _cast(params["W_enc"]), params["b_enc"].reshape(1, h),
            _cast(params["W_dec"]), params["b_dec"].reshape(1, c),
        )
        act_count = jnp.sum(act_part, axis=0)  # [H]
        return prefix_recon, act_count, row_active, l1_sum

    def _assemble(params, x, prefix_recon, act_count, row_active, l1_sum):
        t, c = x.shape
        h = params["b_enc"].shape[0]
        # full-precision x here (the kernel saw the compute-dtype cast, matching
        # fused_sae's outside-the-kernel error assembly)
        errs = prefix_recon - x[None].astype(jnp.float32)
        return {
            "prefix_losses": jnp.mean(jnp.square(errs), axis=(1, 2)),  # [P]
            "l1_loss": l1_sum[0, 0] / (t * h),
            "recon": prefix_recon[-1],
            "dead": act_count == 0,
            "activity_freq": act_count / t,
            "row_active": row_active[:, 0],
        }

    @jax.custom_vjp
    def op(params, x):
        out = _forward_raw(params, x)
        return _assemble(params, x, *out)

    def op_fwd(params, x):
        prefix_recon, act_count, row_active, l1_sum = _forward_raw(params, x)
        res = (params, x, prefix_recon)
        return _assemble(params, x, prefix_recon, act_count, row_active, l1_sum), res

    def op_bwd(res, ct):
        params, x, prefix_recon = res
        t, c = x.shape
        h = params["b_enc"].shape[0]
        tt, th = _pick_tiles(t, h, boundaries, tile_t, tile_h)
        level = _level_fn(boundaries, th)
        # only prefix_losses / l1_loss cotangents participate (module docstring)
        cts = ct["prefix_losses"].astype(jnp.float32) * (2.0 / (t * c))  # [P]
        errs = prefix_recon - x[None].astype(jnp.float32)
        weighted = cts[:, None, None] * errs
        # S_q = Σ_{p>=q} c_p·err_p: reverse cumulative sum over the prefix axis
        s = jnp.flip(jnp.cumsum(jnp.flip(weighted, axis=0), axis=0), axis=0)
        coeffs = jnp.array([[ct["l1_loss"] / (t * h)]], jnp.float32)
        x_spec_t_inner = pl.BlockSpec((tt, c), lambda j, i: (i, 0),
                                      memory_space=pltpu.VMEM)
        operands = (
            _cast(x), _cast(params["W_enc"]), params["b_enc"].reshape(1, h),
            _cast(params["W_dec"]), params["b_dec"].reshape(1, c),
            _cast(s), coeffs,
        )
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
            x_spec_h_inner = pl.BlockSpec((tt, c), lambda i, j: (i, 0),
                                          memory_space=pltpu.VMEM)
            dx = pl.pallas_call(
                dx_kernel,
                grid=(t // tt, h // th),  # H innermost: dx accumulates contiguously
                in_specs=[
                    x_spec_h_inner,
                    pl.BlockSpec((c, th), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, th), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                    pl.BlockSpec((th, c), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tt, c), lambda i, j: (level(j), i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((tt, c), lambda i, j: (i, 0),
                                       memory_space=pltpu.VMEM),
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


def fused_matryoshka_sae_loss_terms(
    params: dict, x: jax.Array, lambda_sparse: float, expansion_factor: int,
    prefixes: tuple[float, ...] = (0.0625, 0.25, 1.0), *, tile_t: int = 2048,
    tile_h: int = 2048, compute_dtype=jnp.bfloat16, interpret: bool = False,
    compute_dx: bool = False,
) -> dict:
    """Drop-in fused equivalent of sae_inference_and_loss("matryoshka_sae", ...) +
    measure_inactive_units on 2-D token input. Loss/metric decomposition matches
    ops/losses.matryoshka_loss_terms: loss = mean_p(prefix MSE) + λ·l1, rec_loss =
    full-dictionary MSE, aux_loss = the prefix surcharge (may be negative early)."""
    from sparse_vision_tpu.models.sae import matryoshka_prefix_counts

    h = params["b_enc"].shape[0]
    boundaries = matryoshka_prefix_counts(h, tuple(prefixes))
    op = make_fused_matryoshka_sae_op(
        boundaries, tile_t, tile_h, compute_dtype, interpret, compute_dx
    )
    out = op(params, x)
    prefix_mean = jnp.mean(out["prefix_losses"])
    rec = out["prefix_losses"][-1]
    recon = out["recon"]
    sq = jnp.square(jax.lax.stop_gradient(recon) - jax.lax.stop_gradient(x))
    sample_mse = jnp.mean(sq, axis=0)
    sample_range = jnp.max(x, axis=0) - jnp.min(x, axis=0)
    sample_rmse = jnp.sqrt(sample_mse)
    _valid = sample_range > 0
    _nrmse = jnp.sum(
        jnp.where(_valid, sample_rmse / jnp.where(_valid, sample_range, 1.0), 0.0)
    ) / jnp.maximum(jnp.sum(_valid), 1)
    return {
        "loss": prefix_mean + lambda_sparse * out["l1_loss"],
        "rec_loss": rec,
        "l1_loss": out["l1_loss"],
        "nrmse_loss": _nrmse,
        "rmse_loss": jnp.mean(sample_rmse),
        "aux_loss": prefix_mean - rec,
        "decoded": recon,
        "dead": out["dead"],
        "activity_freq": out["activity_freq"],
        "sparsity": jnp.mean(out["row_active"] / (h / expansion_factor)),
    }
