"""Gradient-semantics property tests for attribution patching.

Ports the reference's informal but mathematically-derived check suite
(supplementary_files_2/nnsight_intervention_check.py, experiments 1-3) to jax.grad
equalities, plus an equivalence proof that the CircuitEngine's fast node-IE gradient
(decoder vjp at the clean layer gradient) matches the literal
stop-gradient + pass-through formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vision_tpu.interp.patching import (
    loss_and_tap_grads,
    pass_through,
    splice_with_error,
)
from sparse_vision_tpu.models.layers import SeqNet, linear, relu
from sparse_vision_tpu.models.sae import init_sae_mlp, sae_mlp_apply


@pytest.fixture(scope="module")
def setup():
    net = SeqNet([linear("layer1", 4), relu("act1"), linear("layer2", 3),
                  relu("act2"), linear("layer3", 2)])
    key = jax.random.key(0)
    params, state = net.init(key, (5,))
    sae1 = init_sae_mlp(jax.random.key(1), 4, 2)
    sae2 = init_sae_mlp(jax.random.key(2), 3, 2)
    x = jax.random.normal(jax.random.key(3), (6, 5))
    y = jax.random.normal(jax.random.key(4), (6, 2))

    def criterion(logits, targets):
        return jnp.mean(jnp.square(logits - targets))

    return net, params, state, {"layer1": sae1, "layer2": sae2}, x, y, criterion


def _splice_fn(sae_params, eps=None, stop_grad=True, grad_clean=None):
    """Reference `intervention` (compute_ie.py:242-267) as a pure splice."""

    def sp(act):
        _, dec, _ = sae_mlp_apply(sae_params, act)
        if eps is not None:
            # expose the encoder output as a differentiable leaf: shift the encoded
            # value before decoding (linear decoder => dec(enc + eps) = dec + eps @ W)
            enc, _, _ = sae_mlp_apply(sae_params, act)
            dec = (enc + eps) @ sae_params["W_dec"] + sae_params["b_dec"]
        if stop_grad:
            out = splice_with_error(act, dec)
        else:
            out = dec + (act - dec)
        if grad_clean is not None:
            out = pass_through(out, grad_clean)
        return out

    return sp


def test_exp1_no_stopgrad_encoder_grad_is_zero(setup):
    """Experiment 1: without stop-gradient, grad w.r.t. the encoder output is exactly
    zero, and the intervened output equals the clean output."""
    net, params, state, saes, x, y, criterion = setup
    enc0, _, _ = sae_mlp_apply(saes["layer1"], net.apply(params, x)[1]["layer1"])

    def f(eps):
        sp = _splice_fn(saes["layer1"], eps=eps, stop_grad=False)
        logits, _, _ = net.apply(params, x, splice={"layer1": sp})
        return criterion(logits, y), logits

    (loss, logits), g = jax.value_and_grad(f, has_aux=True)(jnp.zeros_like(enc0))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-12)
    clean_logits, _, _ = net.apply(params, x)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(clean_logits), rtol=1e-6)


def test_exp2_stopgrad_encoder_grad_chains_through_decoder(setup):
    """Experiment 2: with stop-gradient, the encoder-output gradient equals the layer-
    output gradient chained through the decoder, and (for the deepest intervened layer)
    the layer-output gradient equals the clean gradient."""
    net, params, state, saes, x, y, criterion = setup
    _, taps, _ = net.apply(params, x)
    enc0, _, _ = sae_mlp_apply(saes["layer2"], taps["layer2"])

    # clean gradient w.r.t. layer2 output
    _, _, grads = loss_and_tap_grads(net, params, None, x, y, criterion, ["layer2"])
    g2 = grads["layer2"]

    def f(eps):
        sp = _splice_fn(saes["layer2"], eps=eps, stop_grad=True)
        logits, _, _ = net.apply(params, x, splice={"layer2": sp})
        return criterion(logits, y)

    g_enc = jax.grad(f)(jnp.zeros_like(enc0))
    # chain rule through the (linear) decoder: g_enc = g_layer @ W_dec^T
    expected = g2 @ saes["layer2"]["W_dec"].T
    np.testing.assert_allclose(np.asarray(g_enc), np.asarray(expected), rtol=1e-5)


def test_exp2_upstream_grad_distorted_without_pass_through(setup):
    """Experiment 2 property 5: when a DOWNSTREAM layer is intervened without
    pass-through, the upstream layer's gradient differs from the clean gradient."""
    net, params, state, saes, x, y, criterion = setup
    _, _, clean = loss_and_tap_grads(net, params, None, x, y, criterion, ["layer1"])

    def f(eps1):
        sp1 = lambda act: act + eps1
        sp2 = _splice_fn(saes["layer2"], stop_grad=True)  # no pass-through
        logits, _, _ = net.apply(params, x, splice={"layer1": sp1, "layer2": sp2})
        return criterion(logits, y)

    _, taps, _ = net.apply(params, x)
    g1 = jax.grad(f)(jnp.zeros_like(taps["layer1"]))
    assert not np.allclose(np.asarray(g1), np.asarray(clean["layer1"]), rtol=1e-4)


def test_exp3_pass_through_sets_clean_gradient_at_layer_output(setup):
    """Experiment 3: with stop-gradient AND pass-through, the gradient at the
    intervened layer's output equals the clean model's gradient — even when an
    UPSTREAM intervention would otherwise distort it. Measured by injecting an eps
    after the pass-through node (the cotangent that node emits is exactly what the
    pass-through contract fixes). Also: the intervened forward is value-identical."""
    net, params, state, saes, x, y, criterion = setup
    _, _, clean = loss_and_tap_grads(
        net, params, None, x, y, criterion, ["layer1", "layer2"]
    )
    _, taps, _ = net.apply(params, x)

    def f(eps1):
        # layer1 intervened with stop-grad + pass-through; the eps sits INSIDE the
        # pass-through so its gradient reads the cotangent the pass-through emits.
        sp1_base = _splice_fn(saes["layer1"], stop_grad=True)
        sp1 = lambda act: pass_through(sp1_base(act) + eps1, clean["layer1"])
        sp2 = _splice_fn(saes["layer2"], stop_grad=True, grad_clean=clean["layer2"])
        logits, _, _ = net.apply(params, x, splice={"layer1": sp1, "layer2": sp2})
        return criterion(logits, y), logits

    (loss, logits), g1 = jax.value_and_grad(f, has_aux=True)(
        jnp.zeros_like(taps["layer1"])
    )
    # forward value unchanged by the double intervention
    clean_logits, _, _ = net.apply(params, x)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(clean_logits), rtol=1e-5)
    # the pass-through at layer1 pins the gradient at its output to the clean gradient
    np.testing.assert_allclose(np.asarray(g1), np.asarray(clean["layer1"]), rtol=1e-5)

    def g(eps1):
        # WITHOUT pass-through at layer1 the gradient arriving there is distorted by
        # the layer2 SAE path (exp2 property 5 / exp3 contrast).
        sp1_base = _splice_fn(saes["layer1"], stop_grad=True)
        sp1 = lambda act: sp1_base(act) + eps1
        sp2 = _splice_fn(saes["layer2"], stop_grad=True, grad_clean=clean["layer2"])
        logits, _, _ = net.apply(params, x, splice={"layer1": sp1, "layer2": sp2})
        return criterion(logits, y)

    g1_no_pt = jax.grad(g)(jnp.zeros_like(taps["layer1"]))
    assert not np.allclose(np.asarray(g1_no_pt), np.asarray(clean["layer1"]), rtol=1e-4)


def test_node_ie_gradient_equivalence(setup):
    """The CircuitEngine's fast formulation (decoder vjp applied to the clean layer
    gradient) equals the literal stop-grad + pass-through gradient w.r.t. the encoder
    output (compute_ie.py:420-453)."""
    net, params, state, saes, x, y, criterion = setup
    _, taps, grads = loss_and_tap_grads(net, params, None, x, y, criterion, ["layer1"])
    enc0, _, _ = sae_mlp_apply(saes["layer1"], taps["layer1"])

    # literal: intervened forward with stop-grad + pass-through, grad wrt encoded
    def f(eps):
        sp = _splice_fn(saes["layer1"], eps=eps, stop_grad=True,
                        grad_clean=grads["layer1"])
        logits, _, _ = net.apply(params, x, splice={"layer1": sp})
        return criterion(logits, y)

    g_literal = jax.grad(f)(jnp.zeros_like(enc0))

    # fast: one vjp through the decoder at the clean gradient
    def decode(e):
        return e @ saes["layer1"]["W_dec"] + saes["layer1"]["b_dec"]

    _, vjp_dec = jax.vjp(decode, enc0)
    (g_fast,) = vjp_dec(grads["layer1"])
    np.testing.assert_allclose(np.asarray(g_literal), np.asarray(g_fast), rtol=1e-5)


def test_loss_and_tap_grads_matches_per_layer_grad(setup):
    """The one-backward multi-tap gradient equals per-layer jax.grad."""
    net, params, state, saes, x, y, criterion = setup
    loss, taps, grads = loss_and_tap_grads(
        net, params, None, x, y, criterion, ["layer1", "layer2"]
    )

    for name in ["layer1", "layer2"]:
        def g_single(eps, name=name):
            logits, _, _ = net.apply(
                params, x, splice={name: (lambda a, e=eps: a + e)}
            )
            return criterion(logits, y)

        expected = jax.grad(g_single)(jnp.zeros_like(taps[name]))
        np.testing.assert_allclose(
            np.asarray(grads[name]), np.asarray(expected), rtol=1e-6
        )
