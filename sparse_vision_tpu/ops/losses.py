"""Loss functions as pure jitted-friendly functions.

Parity targets (semantics, not code) in the reference:
- SparseLoss / compute_rmse_nrmse        losses/sparse_loss.py:4-61
- GatedSAELoss                            losses/sparse_loss.py:64-75
- total-loss assembly                     utils.py:2467-2475
- CustomCrossEntropyLoss (NLL on already-softmaxed outputs)  utils.py:99-125
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rmse_nrmse(decoded: jax.Array, targets: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-dimension RMSE over the batch axis, and range-normalized NRMSE.

    Matches reference compute_rmse_nrmse (losses/sparse_loss.py:4-21): MSE per output
    dimension over axis 0, normalized by (max-min) per dimension, then averaged.
    """
    sq = jnp.square(decoded - targets)
    sample_mse = jnp.mean(sq, axis=0)
    sample_range = jnp.max(targets, axis=0) - jnp.min(targets, axis=0)
    sample_rmse = jnp.sqrt(sample_mse)
    # dimensions constant across the batch (range 0 — routine once units die) are
    # excluded from the NRMSE mean; the reference divides unguarded and reports inf
    # (sparse_loss.py:18) — documented deviation, the metric stays finite here
    valid = sample_range > 0
    nrmse = jnp.sum(jnp.where(valid, sample_rmse / jnp.where(valid, sample_range, 1.0), 0.0)) / jnp.maximum(jnp.sum(valid), 1)
    rmse = jnp.mean(sample_rmse)
    return rmse, nrmse


def sae_loss_terms(
    encoded: jax.Array, decoded: jax.Array, targets: jax.Array, lambda_sparse: float
) -> dict:
    """ReLU-SAE loss: MSE reconstruction + mean(|encoded|) L1, plus RMSE/NRMSE metrics.

    total = rec + lambda * l1 (reference: utils.py:2467-2470).
    """
    rec = jnp.mean(jnp.square(decoded - targets))
    l1 = jnp.mean(jnp.abs(encoded))
    rmse, nrmse = rmse_nrmse(decoded, targets)
    total = rec + lambda_sparse * l1
    return {
        "loss": total,
        "rec_loss": rec,
        "l1_loss": l1,
        "nrmse_loss": nrmse,
        "rmse_loss": rmse,
        "aux_loss": jnp.zeros((), decoded.dtype),
    }


def matryoshka_loss_terms(
    encoded: jax.Array, prefix_recons: list, targets: jax.Array,
    lambda_sparse: float,
) -> dict:
    """Matryoshka-SAE loss (Bussmann et al. 2024): mean over latent-prefix
    reconstructions of the MSE, + lambda * mean|encoded| L1.

    total = mean_i MSE(recon_i, x) + lambda * l1. ``rec_loss`` reports the
    FULL-dictionary MSE (the quantity eval/NRMSE/ranking compare across variants);
    the extra prefix terms ride in ``aux_loss`` so the reported decomposition
    still sums to the trained objective (loss = rec + lambda*l1 + aux).
    """
    full = prefix_recons[-1]
    rec = jnp.mean(jnp.square(full - targets))
    prefix_mean = sum(
        jnp.mean(jnp.square(r - targets)) for r in prefix_recons
    ) / len(prefix_recons)
    l1 = jnp.mean(jnp.abs(encoded))
    rmse, nrmse = rmse_nrmse(full, targets)
    return {
        "loss": prefix_mean + lambda_sparse * l1,
        "rec_loss": rec,
        "l1_loss": l1,
        "nrmse_loss": nrmse,
        "rmse_loss": rmse,
        "aux_loss": prefix_mean - rec,
    }


def gated_sae_loss_terms(
    relu_pi_gate: jax.Array,
    via_gate: jax.Array,
    decoded: jax.Array,
    targets: jax.Array,
    lambda_sparse: float,
) -> dict:
    """Gated-SAE loss (Rajamanoharan et al.): rec + lambda*mean|relu(pi_gate)| + aux MSE.

    total = rec + lambda * l1 + aux (reference: losses/sparse_loss.py:64-75 assembled at
    utils.py:2471-2473). ``via_gate`` is relu(pi_gate) through the FROZEN decoder.
    """
    rec = jnp.mean(jnp.square(decoded - targets))
    l1 = jnp.mean(jnp.abs(relu_pi_gate))
    aux = jnp.mean(jnp.square(via_gate - targets))
    rmse, nrmse = rmse_nrmse(decoded, targets)
    total = rec + lambda_sparse * l1 + aux
    return {
        "loss": total,
        "rec_loss": rec,
        "l1_loss": l1,
        "nrmse_loss": nrmse,
        "rmse_loss": rmse,
        "aux_loss": aux,
    }


def jumprelu_loss_terms(
    encoded: jax.Array, decoded: jax.Array, targets: jax.Array, pre: jax.Array,
    log_threshold: jax.Array, lambda_sparse: float, bandwidth: float = 1e-3,
) -> dict:
    """JumpReLU-SAE loss (Rajamanoharan et al. 2024): MSE reconstruction + λ·L0,
    with the L0 gradient flowing into the thresholds via the STE estimator
    (models/sae.jumprelu_l0). ``l1_loss`` is reported as a metric for the shared
    results schema; it does not enter the loss."""
    from sparse_vision_tpu.models.sae import jumprelu_l0

    rec = jnp.mean(jnp.square(decoded - targets))
    l0 = jumprelu_l0(pre, jnp.exp(log_threshold), bandwidth)
    rmse, nrmse = rmse_nrmse(decoded, targets)
    return {
        "loss": rec + lambda_sparse * l0,
        "rec_loss": rec,
        "l0_loss": l0,
        "l1_loss": jnp.mean(jnp.abs(encoded)),
        "nrmse_loss": nrmse,
        "rmse_loss": rmse,
        "aux_loss": jnp.zeros((), decoded.dtype),
    }


def cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy over integer labels (torch nn.CrossEntropyLoss)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def negative_log_likelihood(probs: jax.Array, targets: jax.Array) -> jax.Array:
    """NLL over ALREADY-SOFTMAXED outputs: -log(p[target] + 1e-40), averaged.

    The reference introduced this (utils.py:99-125) because its tracing tool choked on
    an assert inside CrossEntropyLoss; we keep it for parity with IE runs that feed
    softmaxed model outputs.
    """
    p = jnp.take_along_axis(probs, targets[:, None], axis=-1)[:, 0]
    return jnp.mean(-jnp.log(p + 1e-40))


def get_criterion(name: str):
    """Criterion factory (reference: utils.py:127-137)."""
    if name == "cross_entropy":
        return cross_entropy
    if name == "negative_log_likelihood":
        return negative_log_likelihood
    raise ValueError(f"Unsupported criterion: {name}")
