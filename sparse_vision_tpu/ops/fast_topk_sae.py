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
