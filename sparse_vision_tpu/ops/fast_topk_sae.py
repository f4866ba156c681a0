"""Fast TopK-SAE train path: gather-based decode + index-based statistics.

A Pallas TopK kernel is blocked (lax.top_k has no TPU Pallas lowering — probed on
chip), but the stock TopK step's cost is NOT the selection alone: it scatters the
dense [T, H] latent matrix, decodes it densely, and computes dead/frequency stats
with full [T, H] passes. For k << H all of that is wasted: only k latents per token
are nonzero.

This module is the TopK counterpart of the fused Pallas paths — pure XLA, but with
the same design goal (never materialize [T, H] in the forward):
- decode: ``recon = einsum('tk,tkc->tc', relu(vals), W_dec[idx]) + b_dec`` — a
  [T, k, C] gather instead of a [T, H] scatter + dense [T,H]x[H,C] matmul
  (k=32 vs H=16384: 512x fewer decode FLOPs);
- stats: dead/activity from a [T*k] scatter-add onto [H] counts; row-activity from
  the [T, k] values directly;
- backward: XLA AD transposes the gather into a scatter-add for dW_dec and a sparse
  dpre scatter for the encoder grads (the encode matmul itself stays dense — it is
  irreducible).

Measured on v5e at (T=16k, C=256, H=16k, k=32): loss+grad 33.8 ms vs 56.8 ms stock
(1.68x), gradients equal to ~1e-6; with approx selection the full train step reaches
~2.9x the exact-stock rate (PARITY.md). Gradient/value parity vs the stock path:
tests/test_topk_sae.py.

``approx=True`` selects via lax.approx_max_k (recall_target 0.95; see
models/sae.topk_sae_apply) — the production setting for large H.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sparse_vision_tpu.ops.losses import rmse_nrmse


def fast_topk_sae_loss_terms(
    params: dict,
    x: jax.Array,  # [T, C] tokens
    lambda_sparse: float,
    expansion_factor: int,
    k: int,
    approx: bool = False,
) -> dict:
    """Loss terms + stats with the fused-path contract (loss/rec_loss/l1_loss/
    nrmse/rmse/aux/decoded/dead/activity_freq/sparsity). The L1 term is force-zero
    in the loss like the stock TopK branch (Gao et al. recipe; l1_loss stays
    reported), so ``lambda_sparse`` only documents intent."""
    del lambda_sparse  # TopK trains on pure MSE (models/sae.sae_inference_and_loss)
    t, c = x.shape
    h = params["b_enc"].shape[0]
    if k > h:
        raise ValueError(f"sae_topk={k} exceeds the latent count {h}")
    x_cent = x - params["b_dec"]
    pre = x_cent @ params["W_enc"] + params["b_enc"]
    if approx:
        vals, idx = jax.lax.approx_max_k(pre, k, recall_target=0.95)
    else:
        vals, idx = jax.lax.top_k(pre, k)
    act = jax.nn.relu(vals)  # [T, k]
    w_sel = params["W_dec"][idx]  # [T, k, C] gather
    recon = jnp.einsum("tk,tkc->tc", act, w_sel) + params["b_dec"]
    err = recon - x
    rec = jnp.mean(jnp.square(err))
    # mean |encoded| over the DENSE [T, H] matrix: unselected entries are zero, so
    # the sum is just the selected ReLU values
    l1 = jnp.sum(act) / (t * h)

    # ---- statistics (metrics only; no gradients) ----
    active = jax.lax.stop_gradient(vals) > 0  # [T, k]
    act_count = jnp.zeros((h,), jnp.int32).at[
        jax.lax.stop_gradient(idx).reshape(-1)
    ].add(active.reshape(-1).astype(jnp.int32))
    row_active = jnp.sum(active, axis=1)  # [T]
    rmse, nrmse = rmse_nrmse(jax.lax.stop_gradient(recon), x)
    return {
        "loss": rec,
        "rec_loss": rec,
        "l1_loss": l1,
        "nrmse_loss": nrmse,
        "rmse_loss": rmse,
        "aux_loss": jnp.zeros((), x.dtype),
        "decoded": recon,
        "dead": act_count == 0,
        "activity_freq": act_count / t,
        "sparsity": jnp.mean(row_active / (h / expansion_factor)),
    }


# ---------------------------------------------------------------------------
# TopK under tensor parallelism: the latent dim shards over 'model', but top-k
# selection is GLOBAL across shards. GSPMD's fallback for a sharded-axis top_k
# is an all-gather of the dense [T, H] pre-activations (T=16k, H=16k -> ~1 GB
# per step over ICI). The distributed selection here moves only the candidates:
#
#   1. each chip takes its LOCAL top-k over [T_local, H_local]   (no comm)
#   2. all-gather the m*k candidate (value, global-index) pairs  (m*T*k*8 B)
#   3. re-top-k among m*k candidates -> the exact global top-k   (no comm)
#
# Exactness: every global top-k element is its shard's local top-<=k element, so
# the union of local top-ks always contains the global top-k; tie-breaking also
# matches lax.top_k's lowest-index-first because candidates are ordered by shard
# then local index. With approx=True step 1 uses lax.approx_max_k (recall 0.95)
# and the result is approximate exactly like the single-chip approx path.
#
# Gradients: the integer selection is stop-gradient; each chip RECOMPUTES the
# pre-activations of the selected latents it owns (recompute-backward, like the
# Pallas kernels), so the only gradient-carrying collective is the [T_local, C]
# partial-reconstruction psum — its transpose (broadcast) and the explicit
# data/model-axis grad psums live in a custom VJP, mirroring ops/fused_sae_tp.py.
# ---------------------------------------------------------------------------

import functools


@functools.lru_cache(maxsize=None)
def make_fast_topk_sae_tp_op(n_data: int, n_model: int, k: int,
                             approx: bool = False, compute_dtype=None,
                             data_axis: str = "data", model_axis: str = "model"):
    """Build the TP fast-TopK op. MUST be called from inside a shard_map over a
    mesh with ``data_axis`` (tokens) and ``model_axis`` (latents). Same contract
    as ops/fused_sae_tp.make_fused_sae_tp_op: global loss scalars, do not pmean
    the gradients again. ``compute_dtype`` casts the encode matmul operands
    (accumulation stays f32)."""
    axes_both = (data_axis, model_axis)

    def _cast(a):
        return a.astype(compute_dtype) if compute_dtype is not None else a

    def _pre(params, x):
        x_cent = x - params["b_dec"]
        return jnp.dot(
            _cast(x_cent), _cast(params["W_enc"]),
            preferred_element_type=jnp.float32,
        ) + params["b_enc"]

    def _select(params, x):
        h_l = params["b_enc"].shape[0]
        kk = jax.lax.axis_index(model_axis)
        pre = _pre(params, x)  # [T_l, H_l]
        if approx:
            vals, idx = jax.lax.approx_max_k(pre, k, recall_target=0.95)
        else:
            vals, idx = jax.lax.top_k(pre, k)
        g_idx = idx.astype(jnp.int32) + kk.astype(jnp.int32) * h_l
        cand_vals = jax.lax.all_gather(vals, model_axis, axis=1, tiled=True)
        cand_idx = jax.lax.all_gather(g_idx, model_axis, axis=1, tiled=True)
        top_vals, pos = jax.lax.top_k(cand_vals, k)  # exact among candidates
        top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)  # [T_l, k] global
        return jax.lax.stop_gradient(top_vals), jax.lax.stop_gradient(top_idx)

    def _owned_decode(params, x, top_idx):
        """Differentiable and strictly LOCAL: recompute the selected
        pre-activations this chip owns, decode them against its W_dec shard."""
        h_l = params["b_enc"].shape[0]
        kk = jax.lax.axis_index(model_axis)
        own = (top_idx // h_l) == kk
        rows = jnp.where(own, top_idx - kk * h_l, 0)
        pre = _pre(params, x)
        act = jnp.where(own, jnp.take_along_axis(pre, rows, axis=1), 0.0)
        act = jax.nn.relu(act)  # [T_l, k], zero on un-owned entries
        recon_part = jnp.einsum("tk,tkc->tc", act, params["W_dec"][rows])
        return recon_part, act

    def _forward(params, x):
        top_vals, top_idx = _select(params, x)
        recon_part, act_own = _owned_decode(params, x, top_idx)
        recon = jax.lax.psum(recon_part, model_axis) + params["b_dec"]
        return top_vals, top_idx, recon, act_own

    def _assemble(params, x, top_vals, top_idx, recon, act_own):
        t_l, c = x.shape
        h_l = params["b_enc"].shape[0]
        t_g, h_g = t_l * n_data, h_l * n_model
        kk = jax.lax.axis_index(model_axis)
        err = recon - x
        own = (top_idx // h_l) == kk
        rows = jnp.where(own, top_idx - kk * h_l, 0)
        active_own = jnp.logical_and(own, top_vals > 0)
        act_count = jnp.zeros((h_l,), jnp.int32).at[rows.reshape(-1)].add(
            active_own.reshape(-1).astype(jnp.int32)
        )
        act_count_g = jax.lax.psum(act_count, data_axis)
        return {
            "rec_loss": jax.lax.pmean(jnp.mean(jnp.square(err)), data_axis),
            "l1_loss": jax.lax.psum(jnp.sum(act_own), axes_both) / (t_g * h_g),
            "recon": recon,
            "dead": act_count_g == 0,
            "activity_freq": act_count_g / t_g,
            "row_active": jnp.sum(top_vals > 0, axis=1).astype(jnp.float32),
        }

    @jax.custom_vjp
    def op(params, x):
        tv, ti, recon, act_own = _forward(params, x)
        return _assemble(params, x, tv, ti, recon, act_own)

    def op_fwd(params, x):
        tv, ti, recon, act_own = _forward(params, x)
        return _assemble(params, x, tv, ti, recon, act_own), (
            params, x, ti, recon - x,
        )

    def op_bwd(res, ct):
        params, x, top_idx, err = res
        t_l, c = x.shape
        t_g = t_l * n_data
        # rec_loss = pmean_data(local mean); psum's transpose broadcasts the
        # error cotangent to every model chip identically
        c_rec = ct["rec_loss"] * (2.0 / (t_g * c))
        drecon_part = (c_rec * err).astype(jnp.float32)
        _, vjp = jax.vjp(lambda p: _owned_decode(p, x, top_idx)[0], params)
        (dp,) = vjp(drecon_part)
        direct = c_rec * jnp.sum(err, axis=0)  # recon adds b_dec exactly once
        dparams = {
            "W_enc": jax.lax.psum(dp["W_enc"], data_axis),
            "b_enc": jax.lax.psum(dp["b_enc"], data_axis),
            "W_dec": jax.lax.psum(dp["W_dec"], data_axis),
            # dp["b_dec"] is the centering path through this chip's latents
            "b_dec": jax.lax.psum(dp["b_dec"], axes_both)
            + jax.lax.psum(direct, data_axis),
        }
        return dparams, jnp.zeros_like(x)

    op.defvjp(op_fwd, op_bwd)
    return op


def fast_topk_sae_tp_loss_terms(
    params: dict, x: jax.Array, lambda_sparse: float, expansion_factor: int,
    n_data: int, n_model: int, *, k: int = 32, approx: bool = False,
    compute_dtype=None, interpret: bool = False, data_axis: str = "data",
    model_axis: str = "model",
) -> dict:
    """TP counterpart of fast_topk_sae_loss_terms (pure-MSE training loss; the
    L1 is reported, never trained on — Gao et al. recipe). ``interpret`` is
    accepted for option-dict compatibility with the Pallas TP variants and
    ignored (this path is stock XLA)."""
    del lambda_sparse, interpret
    h_l = params["b_enc"].shape[0]
    h_g = h_l * n_model
    if k > h_l:
        raise ValueError(
            f"sae_topk={k} exceeds the local latent shard {h_l} — the two-stage"
            f" selection needs k <= H/model_axis (H={h_g}, model={n_model})"
        )
    op = make_fast_topk_sae_tp_op(
        n_data, n_model, k, approx, compute_dtype, data_axis, model_axis
    )
    out = op(params, x)
    sparsity = jax.lax.pmean(
        jnp.mean(out["row_active"] / (h_g / expansion_factor)), data_axis
    )
    return {
        "loss": out["rec_loss"],
        "rec_loss": out["rec_loss"],
        "l1_loss": out["l1_loss"],
        "aux_loss": jnp.zeros((), x.dtype),
        "decoded": out["recon"],
        "dead": out["dead"],
        "activity_freq": out["activity_freq"],
        "sparsity": sparsity,
    }
