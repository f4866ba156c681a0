"""Fast batch-level TopK selection via radix bisection (BatchTopK SAEs,
models/sae.batch_topk_sae_apply semantics).

BatchTopK training needs the T*k largest pre-activations of the WHOLE batch —
a top-n over the flattened [T*H] matrix. At the production shape (32k tokens x
16k latents = 5.4e8 elements, n = 1M) ``lax.top_k`` is a full sort: seconds on
the chip and O(T*H) scratch. But the SELECTION only needs the cutoff VALUE
(the n-th largest element); masking ``pre >= cutoff`` reproduces the selected
set exactly (up to value ties at the cutoff, measure-zero for continuous
activations — same caveat as the sharded path, parallel/sharded_steps.py).

The cutoff comes from radix bisection on the IEEE-754 total order:
``f32 -> uint32`` keys via the classic monotonic transform (flip all bits of
negatives, flip the sign bit of positives), then decide the cutoff's 32 bits
MSB-first — bit b is set iff at least n elements match the prefix with b set,
i.e. ``count(keys >= prefix|bit) >= n``. 32 vectorized count-reductions
(HBM-bound elementwise passes, ~32x the array bytes) replace the sort; the
final prefix is EXACTLY the n-th order statistic's bit pattern, duplicates
included.

Distributed for free: under shard_map the counts become ``psum`` over the
'data' axis — every chip bisects the same global cutoff with 32 scalar
collectives and ZERO candidate gathering (the all-gather alternative moves
T*k*n_chips candidate values per step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["kth_largest", "fast_batch_topk_sae_loss_terms"]

_SIGN = jnp.uint32(0x80000000)


def _ordered_bits(x: jax.Array) -> jax.Array:
    """f32 -> uint32 with the same total order (NaNs excluded by contract)."""
    b = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jnp.where(b & _SIGN != 0, ~b, b | _SIGN)


def _bits_to_float(key: jax.Array) -> jax.Array:
    b = jnp.where(key & _SIGN != 0, key ^ _SIGN, ~key)
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def kth_largest(flat: jax.Array, n: int, axis_name: str | None = None) -> jax.Array:
    """Exact value of the ``n``-th largest element of ``flat`` (f32, 1-D).

    With ``axis_name`` (inside shard_map), ``flat`` is the LOCAL shard and the
    result is the global order statistic over all shards — counts are psum'd.
    Returns a scalar f32; gradients do not flow (order statistics are
    piecewise-constant in the inputs almost everywhere)."""
    keys = _ordered_bits(jax.lax.stop_gradient(flat))

    def count_ge(cand):
        c = jnp.sum((keys >= cand).astype(jnp.int32))
        if axis_name is not None:
            c = jax.lax.psum(c, axis_name)
        return c

    def body(i, prefix):
        cand = prefix | (jnp.uint32(1) << (31 - i))
        return jnp.where(count_ge(cand) >= n, cand, prefix)

    prefix = jax.lax.fori_loop(0, 32, body, jnp.uint32(0))
    return _bits_to_float(prefix)


def fast_batch_topk_sae_loss_terms(
    params: dict, x: jax.Array, lambda_sparse: float, expansion_factor: int,
    k: int, *, axis_name: str | None = None, n_shards: int = 1,
) -> dict:
    """Drop-in fast equivalent of sae_inference_and_loss("batch_topk_sae", ...)
    on token input [T, C] — cutoff-mask selection instead of the top-n
    scatter, plus the dead/activity stats the fused-style train steps expect.
    TopK-family recipe: no L1 in the loss (``lambda_sparse`` documents intent).

    ``axis_name``/``n_shards``: inside shard_map, select against the GLOBAL
    (T*n_shards)*k budget with psum'd bisection counts; loss terms stay local
    means (the caller pmeans gradients/metrics, parallel/sharded_steps.py)."""
    del lambda_sparse  # TopK family trains on pure MSE (models/sae.py)
    from sparse_vision_tpu.ops import losses

    t = x.shape[0]
    h = params["b_enc"].shape[0]
    if k > h:
        raise ValueError(f"sae_topk={k} exceeds the latent count {h}")
    pre = (x - params["b_dec"]) @ params["W_enc"] + params["b_enc"]
    n_g = t * n_shards * k
    cutoff = kth_largest(pre.reshape(-1), n_g, axis_name=axis_name)
    keep = pre >= cutoff
    post = jnp.where(keep, jax.nn.relu(pre), 0.0)
    recon = post @ params["W_dec"] + params["b_dec"]
    out = losses.sae_loss_terms(post, recon, x, 0.0)
    mp = jnp.min(jnp.where(keep & (post > 0), post, jnp.inf))
    out["batch_topk_min_pos"] = jax.lax.stop_gradient(
        jnp.where(jnp.isfinite(mp), mp, 0.0)
    )
    active = post > 0
    act_count = jnp.sum(active, axis=0)
    out.update(
        encoded=post,
        encoded_pre=pre,
        decoded=recon,
        dead=act_count == 0,
        activity_freq=act_count / t,
        sparsity=jnp.mean(
            jnp.sum(active, axis=1).astype(jnp.float32) / (h / expansion_factor)
        ),
    )
    return out
