"""Attribution-patching gradient primitives.

The reference implements attribution patching (Marks et al. "Sparse Feature Circuits")
with nnsight runtime interventions: splice ``decoder_out + sae_error.detach()`` into a
layer's output and overwrite that output's gradient with the clean model's gradient
(compute_ie.py:242-267 ``intervention``). The semantics it relies on are spelled out in
the reference's informal check suite (supplementary_files_2/nnsight_intervention_check.py):

  1. without stop-gradient, the gradient w.r.t. the SAE encoder output is exactly zero
     (the splice is the identity, so no gradient flows through the reconstruction path);
  2. with stop-gradient, the encoder-output gradient equals the layer-output gradient
     chained through the decoder;
  3. with pass-through, the gradient arriving at the spliced layer output equals the
     clean model's gradient regardless of downstream interventions.

Here these are two pure-JAX primitives — a stop-gradient splice and a custom_vjp
pass-through — plus an epsilon-injection helper that returns the loss gradient w.r.t.
every tapped intermediate in ONE backward pass (the reference needs a dedicated nnsight
trace, compute_ie.py:270-311 ``get_grad_original``).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp

from sparse_vision_tpu.models.layers import SeqNet


def splice_with_error(x: jax.Array, recon: jax.Array) -> jax.Array:
    """``recon + stop_gradient(x - recon)``: value is exactly ``x``, gradient flows
    only through ``recon`` (reference: compute_ie.py:253-260 — decoder output plus
    detached SAE error)."""
    return recon + jax.lax.stop_gradient(x - recon)


@jax.custom_vjp
def pass_through(y: jax.Array, grad_clean: jax.Array) -> jax.Array:
    """Identity on ``y`` whose backward REPLACES the incoming cotangent with
    ``grad_clean`` (reference: ``output.grad[:] = grad_original``, compute_ie.py:264-265).

    ``grad_clean`` itself receives a zero cotangent — it is a constant by construction
    (saved from the clean trace)."""
    return y


def _pass_through_fwd(y, grad_clean):
    return y, grad_clean


def _pass_through_bwd(grad_clean, ct):
    del ct
    return grad_clean, jnp.zeros_like(grad_clean)


pass_through.defvjp(_pass_through_fwd, _pass_through_bwd)


def loss_and_tap_grads(
    net: SeqNet,
    params: dict,
    state: Optional[dict],
    images: jax.Array,
    labels: jax.Array,
    criterion: Callable,
    layers: Iterable[str],
) -> tuple[jax.Array, dict, dict]:
    """Clean-model loss, taps, and d(loss)/d(tap) for every layer in ``layers``.

    One forward + one backward: inject a zero perturbation after each requested stage
    (via the multi-splice hook) and differentiate w.r.t. the perturbations. Replaces the
    reference's per-batch clean nnsight trace saving ``output.grad`` of all 8 layers
    (compute_ie.py:270-311).
    """
    layers = list(layers)
    # shapes only — eval_shape avoids running a whole extra backbone forward
    _, taps_shapes, _ = jax.eval_shape(
        lambda p, x: net.apply(p, x, state=state), params, images
    )
    eps0 = {
        name: jnp.zeros(taps_shapes[name].shape, taps_shapes[name].dtype)
        for name in layers
    }

    def f(eps):
        splice = {name: (lambda a, e=eps[name]: a + e) for name in layers}
        logits, taps, _ = net.apply(params, images, state=state, splice=splice)
        return criterion(logits, labels), taps

    (loss, taps), grads = jax.value_and_grad(f, has_aux=True)(eps0)
    return loss, taps, grads
