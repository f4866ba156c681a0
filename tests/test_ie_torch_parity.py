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


# ---------------------------------------------------------------------------
# edge IE + faithfulness cross-check on a 2-SAE-layer model
# ---------------------------------------------------------------------------

D2_HID = 8


def _build_two_layer_pair():
    net = SeqNet([linear("l1", D_HID), relu("a1"),
                  linear("l2", D2_HID), relu("a2"),
                  linear("l3", N_CLASSES)])
    params, _ = net.init(jax.random.key(10), (D_IN,))
    sae_u = init_sae_mlp(jax.random.key(11), D_HID, K)
    sae_d = init_sae_mlp(jax.random.key(12), D2_HID, K)
    sae_u = {**sae_u, "b_dec": 0.1 * jax.random.normal(jax.random.key(13), (D_HID,))}
    sae_d = {**sae_d, "b_dec": 0.1 * jax.random.normal(jax.random.key(14), (D2_HID,))}

    t = {}
    for name, din, dout in [("l1", D_IN, D_HID), ("l2", D_HID, D2_HID),
                            ("l3", D2_HID, N_CLASSES)]:
        lin = torch.nn.Linear(din, dout)
        with torch.no_grad():
            lin.weight.copy_(torch.tensor(np.asarray(params[name]["w"]).T))
            lin.bias.copy_(torch.tensor(np.asarray(params[name]["b"])))
        t[name] = lin
    t_sae_u = {k: torch.tensor(np.asarray(v)) for k, v in sae_u.items()}
    t_sae_d = {k: torch.tensor(np.asarray(v)) for k, v in sae_d.items()}
    return net, params, sae_u, sae_d, t, t_sae_u, t_sae_d


def test_edge_ie_matches_independent_torch_implementation():
    net, params, sae_u, sae_d, t, t_sae_u, t_sae_d = _build_two_layer_pair()
    rng = np.random.default_rng(1)
    x_np = rng.normal(size=(B, D_IN)).astype(np.float32)
    y_np = rng.integers(0, N_CLASSES, B).astype(np.int32)
    idx_u, idx_d = [0, 5, 11, 20], [1, 4, 7]

    eng = CircuitEngine(
        net, params,
        {"a1": FrozenSAE("sae_mlp", sae_u, K), "a2": FrozenSAE("sae_mlp", sae_d, K)},
        cross_entropy,
    )
    batches = [(jnp.asarray(x_np), jnp.asarray(y_np))]
    avgs = eng.compute_averages(batches)
    edges = eng.compute_edge_ie(batches, avgs, {"a1": idx_u, "a2": idx_d})

    # ---- torch replication (reference compute_edge_ie structure) ----
    x = torch.tensor(x_np)
    y = torch.tensor(y_np, dtype=torch.long)
    ce = torch.nn.CrossEntropyLoss()
    enc_avg_u = np.asarray(avgs.enc["a1"])
    err_avg_u = np.asarray(avgs.err["a1"])

    # clean layer gradients
    a1 = torch.relu(t["l1"](x)); a1.retain_grad()
    a2 = torch.relu(t["l2"](a1)); a2.retain_grad()
    ce(t["l3"](a2), y).backward()
    g_a2 = a2.grad.detach().clone()

    # grad of loss wrt enc_d under standard intervention at d
    a1 = torch.relu(t["l1"](x))
    a2 = torch.relu(t["l2"](a1))
    enc_d, rec_d = _torch_sae_forward(t_sae_d, a2)
    enc_d.retain_grad()
    spliced_d = rec_d + (a2 - rec_d).detach()
    spliced_d.register_hook(lambda g: g_a2)
    ce(t["l3"](spliced_d), y).backward()
    grad_m_d = enc_d.grad.detach().clone()

    # intervened trace: u with stop-grad (no pass-through), d without stop-grad
    a1 = torch.relu(t["l1"](x))
    enc_u, rec_u = _torch_sae_forward(t_sae_u, a1)
    enc_u.retain_grad(); rec_u.retain_grad()
    spliced_u = rec_u + (a1 - rec_u).detach()
    a2v = torch.relu(t["l2"](spliced_u))
    enc_d2, rec_d2 = _torch_sae_forward(t_sae_d, a2v)
    err_d2 = a2v - rec_d2
    err_u_np = (a1 - rec_u).detach().numpy()
    enc_u_np = enc_u.detach().numpy()

    def col_from_grads(g_enc_u, g_rec_u):
        fe = np.abs(g_enc_u[:, idx_u] * (enc_avg_u[None, idx_u] - enc_u_np[:, idx_u])).mean(axis=0)
        er = np.abs(((err_avg_u[None] - err_u_np) * g_rec_u).sum(axis=1)).mean()
        return np.concatenate([fe, [er]])

    cols = []
    for j in idx_d:
        prod = (grad_m_d[:, j] * enc_d2[:, j]).mean()
        prod.backward(retain_graph=True)
        cols.append(col_from_grads(enc_u.grad.numpy(), rec_u.grad.numpy()))
        enc_u.grad.zero_(); rec_u.grad.zero_()
    # downstream SAE-error node (grad_m = clean layer gradient)
    prod_e = (g_a2 * err_d2).sum(dim=1).mean()
    prod_e.backward()
    cols.append(col_from_grads(enc_u.grad.numpy(), rec_u.grad.numpy()))
    golden_u = np.stack(cols, axis=1)  # [U_sel+1, D_sel+1]

    np.testing.assert_allclose(np.asarray(edges["a1"]), golden_u, rtol=2e-4, atol=1e-9)

    # loss-node column for the last layer (u = a2): stop-grad splice, backward loss
    enc_avg_d = np.asarray(avgs.enc["a2"])
    err_avg_d = np.asarray(avgs.err["a2"])
    a1 = torch.relu(t["l1"](x))
    a2 = torch.relu(t["l2"](a1))
    enc_d3, rec_d3 = _torch_sae_forward(t_sae_d, a2)
    enc_d3.retain_grad(); rec_d3.retain_grad()
    spliced = rec_d3 + (a2 - rec_d3).detach()
    ce(t["l3"](spliced), y).backward()
    err_d_np = (a2 - rec_d3).detach().numpy()
    enc_d_np = enc_d3.detach().numpy()
    fe = np.abs(enc_d3.grad.numpy()[:, idx_d] * (enc_avg_d[None, idx_d] - enc_d_np[:, idx_d])).mean(axis=0)
    er = np.abs(((err_avg_d[None] - err_d_np) * rec_d3.grad.numpy()).sum(axis=1)).mean()
    golden_loss_col = np.concatenate([fe, [er]])[:, None]
    np.testing.assert_allclose(np.asarray(edges["a2"]), golden_loss_col, rtol=2e-4, atol=1e-9)


def test_faithfulness_matches_independent_torch_implementation():
    net, params, sae_u, sae_d, t, t_sae_u, t_sae_d = _build_two_layer_pair()
    rng = np.random.default_rng(2)
    x_np = rng.normal(size=(B, D_IN)).astype(np.float32)
    y_np = rng.integers(0, N_CLASSES, B).astype(np.int32)

    eng = CircuitEngine(
        net, params,
        {"a1": FrozenSAE("sae_mlp", sae_u, K), "a2": FrozenSAE("sae_mlp", sae_d, K)},
        cross_entropy,
    )
    batches = [(jnp.asarray(x_np), jnp.asarray(y_np))]
    avgs = eng.compute_averages(batches)
    node = eng.compute_node_ie(batches, avgs)
    thr = float(np.median(np.abs(np.asarray(node.features["a1"]))))  # mid threshold
    r = eng.compute_faithfulness(batches, node, thr, averages=avgs)

    feat_masks, err_keep, _ = eng.circuit_masks(node, thr)
    masks = {n: np.asarray(feat_masks[n]) for n in ("a1", "a2")}
    keeps = {n: bool(err_keep[n]) for n in ("a1", "a2")}
    enc_avg = {n: np.asarray(avgs.enc[n]) for n in ("a1", "a2")}
    err_avg = {n: np.asarray(avgs.err[n]) for n in ("a1", "a2")}

    x = torch.tensor(x_np)
    y = torch.tensor(y_np, dtype=torch.long)
    ce = torch.nn.CrossEntropyLoss()

    def splice(name, t_sae, act, variant, mask):
        enc, dec = _torch_sae_forward(t_sae, act)
        new_enc = torch.where(torch.tensor(mask)[None], enc,
                              torch.tensor(enc_avg[name])[None].expand_as(enc))
        new_dec = new_enc @ t_sae["W_dec"] + t_sae["b_dec"]
        e_avg = torch.tensor(err_avg[name])[None].expand_as(dec)
        if variant == "zero":
            return new_dec
        if variant == "mean":
            return new_dec + e_avg
        err = act - dec
        return new_dec + (err if keeps[name] else e_avg)

    def run(variant, mask_of):
        with torch.no_grad():
            a1 = torch.relu(t["l1"](x))
            s1 = splice("a1", t_sae_u, a1, variant, mask_of("a1"))
            a2 = torch.relu(t["l2"](s1))
            s2 = splice("a2", t_sae_d, a2, variant, mask_of("a2"))
            return float(ce(t["l3"](s2), y))

    m_C = run("circuit", lambda n: masks[n])
    m_zero = run("zero", lambda n: masks[n])
    m_mean = run("mean", lambda n: masks[n])
    m_empty = run("mean", lambda n: np.zeros_like(masks[n]))
    with torch.no_grad():
        m_M = float(ce(t["l3"](torch.relu(t["l2"](torch.relu(t["l1"](x))))), y))

    denom = m_M - m_empty
    np.testing.assert_allclose(r["faithfulness"], (m_C - m_empty) / denom, rtol=1e-3)
    np.testing.assert_allclose(r["faithfulness_sae_errors_zero_ablated"],
                               (m_zero - m_empty) / denom, rtol=1e-3)
    np.testing.assert_allclose(r["faithfulness_sae_errors_mean_ablated"],
                               (m_mean - m_empty) / denom, rtol=1e-3)
