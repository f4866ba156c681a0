"""Evaluation metrics as pure jitted reductions.

Layout convention: conv activations are NHWC ``[B, H, W, C]`` (the reference is NCHW;
each function documents the reference's semantics it reproduces).

Parity targets:
- average_over_W_H            utils.py:1996-2010
- variance_explained          utils.py:2012-2030  (torch.var default = ddof=1)
- measure_inactive_units      utils.py:2032-2069
- KLD / %same / loss-diff     model_pipeline.py:690-714
- compute_number_dead_neurons model_pipeline.py / utils.py:1206-1215
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spatial_mean(x: jax.Array) -> jax.Array:
    """Channel-average over H, W if 4-D NHWC; over the token axis if 3-D [B, N, D]
    (ViT residual stream); identity if 2-D (utils.py:1996-2010)."""
    if x.ndim == 4:
        return jnp.mean(x, axis=(1, 2))
    if x.ndim == 3:
        return jnp.mean(x, axis=1)
    if x.ndim == 2:
        return x
    raise ValueError(f"Unexpected rank {x.ndim}")


def variance_explained(x: jax.Array, recon: jax.Array) -> jax.Array:
    """1 - Var(recon)/Var(x).

    4-D NHWC: variance over (H, W) per (batch, channel), then mean (reference takes var
    over dims (2,3) of NCHW — the same spatial axes). 2-D: variance over units per
    sample, then mean. torch.var is unbiased by default, so ddof=1.
    (reference: utils.py:2012-2030)
    """
    if x.ndim == 4:
        var = jnp.mean(jnp.var(x, axis=(1, 2), ddof=1))
        mod_var = jnp.mean(jnp.var(recon, axis=(1, 2), ddof=1))
    elif x.ndim == 3:  # [B, N, D]: variance over the token axis per (batch, dim)
        var = jnp.mean(jnp.var(x, axis=1, ddof=1))
        mod_var = jnp.mean(jnp.var(recon, axis=1, ddof=1))
    elif x.ndim == 2:
        var = jnp.mean(jnp.var(x, axis=1, ddof=1))
        mod_var = jnp.mean(jnp.var(recon, axis=1, ddof=1))
    else:
        raise ValueError(f"Unexpected rank {x.ndim}")
    return 1.0 - mod_var / var


def measure_inactive_units(x: jax.Array, expansion_factor: int) -> tuple:
    """Dead-unit / sparsity statistics for one batch (reference: utils.py:2032-2069).

    A unit (channel for conv NHWC, neuron for 2-D) is inactive for a sample iff its
    activation is exactly zero everywhere spatially. Returns:
      batch_dead_units  bool [U]   unit inactive across the whole batch
      batch_sparsity    scalar     mean over samples of active_units / (U / expansion)
      activity_freq     [U]        per-unit fraction of samples where the unit is active
    """
    zero = x == 0
    if x.ndim == 4:
        sample_inactive = jnp.all(zero, axis=(1, 2))  # [B, C]
    elif x.ndim == 3:  # [B, N, D]: a dim is inactive iff zero at every token
        sample_inactive = jnp.all(zero, axis=1)
    elif x.ndim == 2:
        sample_inactive = zero
    else:
        raise ValueError(f"Unexpected rank {x.ndim}")
    num_units = sample_inactive.shape[1]
    batch_dead_units = jnp.all(sample_inactive, axis=0)
    activity_freq = 1.0 - jnp.mean(sample_inactive.astype(jnp.float32), axis=0)
    n_inactive = jnp.sum(sample_inactive, axis=1)
    n_active = num_units - n_inactive
    batch_sparsity = jnp.mean(n_active / (num_units / expansion_factor))
    return batch_dead_units, batch_sparsity, activity_freq


def perc_dead(dead_units: jax.Array) -> jax.Array:
    """Fraction of dead units (reference: utils.py:1206-1215)."""
    return jnp.sum(dead_units) / dead_units.shape[0]


def kld_original_vs_modified(logits_original: jax.Array, logits_modified: jax.Array) -> jax.Array:
    """KL divergence between the modified and original model's output distributions.

    The reference calls F.kl_div(input=log_softmax(original), target=log_softmax(modified),
    reduction='sum', log_target=True) / batch_size (model_pipeline.py:698-706), which is
    sum over classes of p_mod * (log p_mod - log p_orig), i.e. KL(modified || original),
    averaged over the batch.
    """
    logp_orig = jax.nn.log_softmax(logits_original, axis=1)
    logp_mod = jax.nn.log_softmax(logits_modified, axis=1)
    kl = jnp.sum(jnp.exp(logp_mod) * (logp_mod - logp_orig))
    return kl / logits_original.shape[0]


def perc_same_classification(logits_a: jax.Array, logits_b: jax.Array) -> jax.Array:
    """Fraction of samples where both models predict the same class
    (model_pipeline.py:708-711)."""
    return jnp.mean(
        (jnp.argmax(logits_a, axis=1) == jnp.argmax(logits_b, axis=1)).astype(jnp.float32)
    )


def accuracy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.mean((jnp.argmax(logits, axis=1) == targets).astype(jnp.float32))


def update_dead_accumulator(acc: jax.Array | None, batch_dead: jax.Array) -> jax.Array:
    """Running AND across batches: dead iff dead in every batch seen so far
    (model_pipeline.py:744-750 uses pointwise multiplication of booleans)."""
    if acc is None:
        return batch_dead
    return jnp.logical_and(acc, batch_dead)
