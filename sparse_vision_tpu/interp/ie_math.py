"""Indirect-effect (IE) math kernels, pure jnp.

Layout: NHWC activations, token matrices ``[T, C] = [B*H*W, C]`` (same token set as the
reference's ``(b c h w) -> (b h w) c``); dataset averages are per-position ``[H, W, C]``
for conv taps (the reference stores ``[C, H, W]``) or ``[C]`` for 2-D taps.

Parity targets (verified against torch goldens in tests/test_ie_math.py):
- ie_channel_wise   utils.py:2606-2660 compute_ie_channel_wise —
                    ``ie[c] = mean_t |grad[t,c] * (avg[t,c] - act[t,c])|``
- ie_all_channels   utils.py:2574-2602 compute_ie_all_channels —
                    ``ie = mean_t |sum_c grad[t,c] * (avg[t,c] - err[t,c])|``
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def broadcast_average(avg: jax.Array, batch_size: int) -> jax.Array:
    """Tile a per-position average over the batch and flatten to tokens.

    [H, W, C] -> [B*H*W, C] (reference reshape_encoder_output_average, utils.py:2780-2786
    repeats [C, H, W] over N then unfolds); [C] -> [1, C] (broadcasts against any [T, C]).
    """
    if avg.ndim == 3:
        h, w, c = avg.shape
        return jnp.broadcast_to(avg[None], (batch_size, h, w, c)).reshape(-1, c)
    if avg.ndim == 2:  # [N, C] per-token-position average (ViT residual stream)
        n, c = avg.shape
        return jnp.broadcast_to(avg[None], (batch_size, n, c)).reshape(-1, c)
    if avg.ndim == 1:
        return avg[None, :]
    raise ValueError(f"Unexpected average rank {avg.ndim}")


def ie_channel_wise(
    act_tok: jax.Array, avg: jax.Array, grad_tok: jax.Array, batch_size: int
) -> jax.Array:
    """Per-channel IE: ``mean over tokens of |grad ⊙ (avg - act)|`` -> [C]
    (reference: utils.py:2606-2660; its einsum 'nic,inc->nc' with singleton i is an
    elementwise product)."""
    avg_tok = broadcast_average(avg, batch_size)
    ie = jnp.abs(grad_tok * (avg_tok - act_tok))
    return jnp.mean(ie, axis=0)


def ie_all_channels(
    act_tok: jax.Array, avg: jax.Array, grad_tok: jax.Array, batch_size: int
) -> jax.Array:
    """Single-node IE: per-token dot product over channels, abs, mean -> scalar
    (reference: utils.py:2574-2602)."""
    avg_tok = broadcast_average(avg, batch_size)
    ie = jnp.abs(jnp.sum(grad_tok * (avg_tok - act_tok), axis=-1))
    return jnp.mean(ie)


def running_mean(old: jax.Array | None, new: jax.Array, n_old: int, n_new: int):
    """Sample-count-weighted running mean (reference: compute_ie.py:203-207, 459-462)."""
    if old is None:
        return new
    total = n_old + n_new
    return (old * n_old + new * n_new) / total
