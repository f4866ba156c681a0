"""Optimizers as optax gradient transformations.

Parity targets:
- ConstrainedAdam      utils.py:50-82 (project out the gradient component parallel to
                       each decoder direction before the Adam step; renormalize the
                       directions to unit norm after it; betas (0.9, 0.999))
- get_optimizer        utils.py:84-97 ('adam' with the reference's nonstandard
                       beta2=0.9999, 'sgd', 'sgd_w_scheduler' = momentum 0.9 +
                       StepLR(step_size=7, gamma=0.1) stepped per EPOCH)

The post-step renormalization is expressed as an update adjustment: the transform emits
``u' = normalize(p + u) - p`` so that ``optax.apply_updates`` lands exactly on the
renormalized point — equivalent to torch's in-place ``p /= ||p||`` after the step.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


def _row_norms(w: jax.Array) -> jax.Array:
    return jnp.linalg.norm(w, axis=-1, keepdims=True)


def project_away_parallel_grad(grad: jax.Array, param: jax.Array) -> jax.Array:
    """Remove the gradient component parallel to each unit row of ``param``.

    Our W_dec rows are the reference's decoder-weight columns (utils.py:73-76 projects
    per column over dim=0; we project per row over the last axis).
    """
    normed = param / _row_norms(param)
    return grad - jnp.sum(grad * normed, axis=-1, keepdims=True) * normed


def constrained_adam(
    learning_rate: float,
    constrained: Callable[[Any], Any],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam where leaves selected by ``constrained(params) -> bool pytree`` keep
    unit-norm rows (reference ConstrainedAdam, utils.py:50-82; from saprmarks/
    dictionary_learning). eps_root=0 matches torch Adam's denominator exactly."""
    adam = optax.scale_by_adam(b1=b1, b2=b2, eps=eps, eps_root=0.0)

    def init(params):
        return adam.init(params)

    def update(grads, state, params):
        mask = constrained(params)
        grads = jax.tree.map(
            lambda g, p, m: project_away_parallel_grad(g, p) if m else g,
            grads, params, mask,
        )
        updates, state = adam.update(grads, state, params)
        updates = jax.tree.map(lambda u: -learning_rate * u, updates)

        def renorm(u, p, m):
            if not m:
                return u
            new_p = p + u
            new_p = new_p / _row_norms(new_p)
            return new_p - p

        updates = jax.tree.map(renorm, updates, params, mask)
        return updates, state

    return optax.GradientTransformation(init, update)


class EpochLRState(NamedTuple):
    inner: Any
    epoch: jax.Array  # int32 scalar; advanced by the pipeline at epoch boundaries


def sgd_with_step_lr(
    learning_rate: float, momentum: float = 0.9, step_size: int = 7, gamma: float = 0.1
) -> optax.GradientTransformation:
    """SGD + per-epoch StepLR (reference: utils.py:89-93). The LR at epoch e is
    ``lr * gamma^(e // step_size)``; the pipeline calls :func:`advance_epoch` once per
    train epoch (mirroring ``scheduler.step()``, model_pipeline.py:963-965)."""
    base = optax.trace(decay=momentum, nesterov=False)

    def init(params):
        return EpochLRState(inner=base.init(params), epoch=jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        updates, inner = base.update(grads, state.inner, params)
        scale = learning_rate * gamma ** (state.epoch // step_size)
        updates = jax.tree.map(lambda u: -scale * u, updates)
        return updates, EpochLRState(inner=inner, epoch=state.epoch)

    return optax.GradientTransformation(init, update)


def advance_epoch(opt_state):
    """Advance the StepLR epoch counter (no-op for other optimizers)."""
    if isinstance(opt_state, EpochLRState):
        return EpochLRState(inner=opt_state.inner, epoch=opt_state.epoch + 1)
    return opt_state


def sae_constrained_mask(params: dict) -> dict:
    """ConstrainedAdam is applied to the decoder weight only (utils.py:96 passes
    model.decoder.weight; the bias is excluded because it starts at zero)."""
    return {k: (k == "W_dec") for k in params}


def get_optimizer(name: str, learning_rate: float) -> optax.GradientTransformation:
    """Optimizer factory (reference: utils.py:84-97)."""
    if name == "adam":
        # the reference's nonstandard beta2 (utils.py:86) — kept for behavior parity
        return optax.adam(learning_rate, b1=0.9, b2=0.9999, eps=1e-8, eps_root=0.0)
    if name == "sgd":
        return optax.sgd(learning_rate)
    if name == "sgd_w_scheduler":
        return sgd_with_step_lr(learning_rate)
    if name == "constrained_adam":
        return constrained_adam(learning_rate, sae_constrained_mask)
    raise ValueError(f"Unsupported optimizer: {name}")
