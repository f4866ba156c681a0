"""Cross-framework node-IE parity: an independent PLAIN-TORCH replication of the
reference's intervention mechanism (compute_ie.py:242-311, 365-472 — splice
``decoder_out + sae_error.detach()`` into the layer output, overwrite its gradient
with the clean model's gradient, backprop, apply the IE formulas) is compared
number-for-number against CircuitEngine on identical weights and data.

This validates the riskiest subsystem end-to-end against a second implementation in a
different framework, not just against in-JAX algebra (tests/test_patching.py does
that part)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from sparse_vision_tpu.interp.circuit import CircuitEngine, FrozenSAE
from sparse_vision_tpu.models.layers import SeqNet, linear, relu
from sparse_vision_tpu.models.sae import init_sae_mlp
from sparse_vision_tpu.ops.losses import cross_entropy

D_IN, D_HID, N_CLASSES, B, K = 12, 10, 5, 16, 3

torch.manual_seed(0)


def _build_pair():
    """Identical-weight torch model + SeqNet, torch SAE + our SAE params."""
    net = SeqNet([linear("l1", D_HID), relu("a1"), linear("l2", N_CLASSES)])
    params, _ = net.init(jax.random.key(0), (D_IN,))
    sae_params = init_sae_mlp(jax.random.key(1), D_HID, K)
    # make b_dec/b_enc nontrivial
    sae_params = {
        **sae_params,
        "b_dec": 0.1 * jax.random.normal(jax.random.key(2), (D_HID,)),
        "b_enc": 0.05 * jax.random.normal(jax.random.key(3), (D_HID * K,)),
    }

    tl1 = torch.nn.Linear(D_IN, D_HID)
    tl2 = torch.nn.Linear(D_HID, N_CLASSES)
    with torch.no_grad():
        tl1.weight.copy_(torch.tensor(np.asarray(params["l1"]["w"]).T))
        tl1.bias.copy_(torch.tensor(np.asarray(params["l1"]["b"])))
        tl2.weight.copy_(torch.tensor(np.asarray(params["l2"]["w"]).T))
        tl2.bias.copy_(torch.tensor(np.asarray(params["l2"]["b"])))

    t_sae = {k: torch.tensor(np.asarray(v)) for k, v in sae_params.items()}
    return net, params, sae_params, (tl1, tl2), t_sae


def _torch_sae_forward(t_sae, x):
    x_cent = x - t_sae["b_dec"]
    pre = x_cent @ t_sae["W_enc"] + t_sae["b_enc"]
    post = torch.relu(pre)
    recon = post @ t_sae["W_dec"] + t_sae["b_dec"]
    return post, recon


def _torch_node_ie(tl1, tl2, t_sae, x_np, y_np, enc_avg, err_avg, out_avg):
    """Literal reference mechanism with plain torch autograd."""
    x = torch.tensor(x_np)
    y = torch.tensor(y_np, dtype=torch.long)
    ce = torch.nn.CrossEntropyLoss()

    # clean pass: gradient of the loss w.r.t. the tapped layer output (post-ReLU a1)
    a1 = torch.relu(tl1(x))
    a1.retain_grad()
    ce(tl2(a1), y).backward()
    grad_original = a1.grad.detach().clone()

    # intervened pass: splice dec + err.detach(), pass-through gradient at the splice
    a1 = torch.relu(tl1(x))
    enc, recon = _torch_sae_forward(t_sae, a1)
    enc.retain_grad()
    err = (a1 - recon).detach()
    spliced = recon + err
    spliced.register_hook(lambda g: grad_original)  # output.grad[:] = grad_original
    ce(tl2(spliced), y).backward()
    enc_grad = enc.grad.detach().numpy()

    enc_np = enc.detach().numpy()
    err_np = err.numpy()
    a1_np = a1.detach().numpy()

    # IE formulas (2-D taps: averages are [C]-shaped; utils.py:2574-2660)
    ie_features = np.abs(enc_grad * (enc_avg[None] - enc_np)).mean(axis=0)
    g = grad_original.numpy()
    ie_error = np.abs(((err_avg[None] - err_np) * g).sum(axis=1)).mean()
    ie_model = np.abs(g * (out_avg[None] - a1_np)).mean(axis=0)
    return ie_features, ie_error, ie_model


def test_node_ie_matches_independent_torch_implementation():
    net, params, sae_params, (tl1, tl2), t_sae = _build_pair()
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(B, D_IN)).astype(np.float32)
    y_np = rng.integers(0, N_CLASSES, B).astype(np.int32)

    eng = CircuitEngine(
        net, params, {"a1": FrozenSAE("sae_mlp", sae_params, K)}, cross_entropy
    )
    batches = [(jnp.asarray(x_np), jnp.asarray(y_np))]
    avgs = eng.compute_averages(batches)
    node = eng.compute_node_ie(batches, avgs)

    golden_feat, golden_err, golden_model = _torch_node_ie(
        tl1, tl2, t_sae, x_np, y_np,
        np.asarray(avgs.enc["a1"]), np.asarray(avgs.err["a1"]),
        np.asarray(avgs.out["a1"]),
    )

    np.testing.assert_allclose(
        np.asarray(node.features["a1"]), golden_feat, rtol=1e-4, atol=1e-8
    )
    np.testing.assert_allclose(float(node.error["a1"]), golden_err, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(node.model_neurons["a1"]), golden_model, rtol=1e-4, atol=1e-8
    )
    # sanity: the IEs are not degenerate
    assert float(np.max(golden_feat)) > 0
