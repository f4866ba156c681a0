"""Circuit-tier tests: IE math goldens vs torch, engine end-to-end properties, and an
edge-IE parity check of the batched-cotangent redesign against a literal per-feature
gradient loop (the reference's backward(retain_graph) structure, compute_ie.py:589-624).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from einops import rearrange

from sparse_vision_tpu.interp import ie_math
from sparse_vision_tpu.interp.circuit import Averages, CircuitEngine, FrozenSAE
from sparse_vision_tpu.interp.patching import loss_and_tap_grads, splice_with_error
from sparse_vision_tpu.models.layers import SeqNet, conv, flatten, linear, relu
from sparse_vision_tpu.models.sae import (
    init_sae_mlp,
    sae_decode,
    sae_encode,
    tokens_from_act,
    act_from_tokens,
)
from sparse_vision_tpu.ops.losses import cross_entropy

B, H, W, C = 3, 4, 4, 5
K = 2  # expansion factor


# ---------------------------------------------------------------------------
# IE math goldens vs the reference's torch formulas
# ---------------------------------------------------------------------------

def _torch_ie_channel_wise(enc_tok, avg_chw, grad_tok, batch):
    """Literal reference compute_ie_channel_wise (utils.py:2606-2660)."""
    avg = avg_chw.unsqueeze(0).repeat(batch, 1, 1, 1)
    avg = rearrange(avg, "b c h w -> (b h w) c").unsqueeze(1).permute(1, 0, 2)
    enc = enc_tok.unsqueeze(0)
    grad = grad_tok.unsqueeze(1)
    ie = torch.einsum("nic,inc->nc", grad, avg - enc).abs()
    return ie.mean(dim=0)


def _torch_ie_all_channels(err_nchw, avg_chw, grad_nchw, batch):
    """Literal reference compute_ie_all_channels (utils.py:2574-2602)."""
    avg = avg_chw.unsqueeze(0).repeat(batch, 1, 1, 1)
    avg = rearrange(avg, "b c h w -> (b h w) c")
    grad = rearrange(grad_nchw, "b c h w -> (b h w) c")
    err = rearrange(err_nchw, "b c h w -> (b h w) c")
    ie = torch.einsum("nc,cn->n", grad, (avg - err).T).abs()
    return ie.mean()


def test_ie_channel_wise_matches_torch(rng):
    ck = C * K
    enc_nchw = rng.standard_normal((B, ck, H, W)).astype(np.float32)
    avg_chw = rng.standard_normal((ck, H, W)).astype(np.float32)
    grad_nchw = rng.standard_normal((B, ck, H, W)).astype(np.float32)

    golden = _torch_ie_channel_wise(
        rearrange(torch.tensor(enc_nchw), "b c h w -> (b h w) c"),
        torch.tensor(avg_chw),
        rearrange(torch.tensor(grad_nchw), "b c h w -> (b h w) c"),
        B,
    )
    # ours: NHWC tokens, [H, W, C] average
    enc_tok = jnp.asarray(rearrange(enc_nchw, "b c h w -> (b h w) c"))
    grad_tok = jnp.asarray(rearrange(grad_nchw, "b c h w -> (b h w) c"))
    avg_hwc = jnp.asarray(np.transpose(avg_chw, (1, 2, 0)))
    ours = ie_math.ie_channel_wise(enc_tok, avg_hwc, grad_tok, B)
    np.testing.assert_allclose(np.asarray(ours), golden.numpy(), rtol=1e-5)


def test_ie_all_channels_matches_torch(rng):
    err = rng.standard_normal((B, C, H, W)).astype(np.float32)
    avg = rng.standard_normal((C, H, W)).astype(np.float32)
    grad = rng.standard_normal((B, C, H, W)).astype(np.float32)
    golden = _torch_ie_all_channels(
        torch.tensor(err), torch.tensor(avg), torch.tensor(grad), B
    )
    err_tok = jnp.asarray(rearrange(err, "b c h w -> (b h w) c"))
    grad_tok = jnp.asarray(rearrange(grad, "b c h w -> (b h w) c"))
    avg_hwc = jnp.asarray(np.transpose(avg, (1, 2, 0)))
    ours = ie_math.ie_all_channels(err_tok, avg_hwc, grad_tok, B)
    np.testing.assert_allclose(float(ours), float(golden), rtol=1e-5)


# ---------------------------------------------------------------------------
# Engine fixtures: a tiny conv backbone with two SAE layers
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def engine():
    net = SeqNet([
        conv("conv1", C, kernel=3, padding=1),
        relu("relu1"),
        conv("conv2", 6, kernel=3, padding=1),
        relu("relu2"),
        flatten("flatten"),
        linear("fc", 4),
    ])
    params, _ = net.init(jax.random.key(0), (H, W, 3))
    saes = {
        "relu1": FrozenSAE("sae_mlp", init_sae_mlp(jax.random.key(1), C, K), K),
        "relu2": FrozenSAE("sae_mlp", init_sae_mlp(jax.random.key(2), 6, K), K),
    }
    eng = CircuitEngine(net, params, saes, cross_entropy)
    key = jax.random.key(3)
    batches = []
    for i in range(3):
        k1, k2, key = jax.random.split(key, 3)
        batches.append((
            jax.random.normal(k1, (B, H, W, 3)),
            jax.random.randint(k2, (B,), 0, 4),
        ))
    return eng, batches


def test_compute_averages(engine):
    eng, batches = engine
    avgs = eng.compute_averages(batches)
    assert avgs.enc["relu1"].shape == (H, W, C * K)
    assert avgs.err["relu1"].shape == (H, W, C)
    assert avgs.out["relu2"].shape == (H, W, 6)
    assert avgs.dead["relu1"].shape == (C * K,)

    # golden: manual mean of encoder outputs over all samples
    all_enc = []
    for images, _ in batches:
        _, taps, _ = eng.net.apply(eng.params, images)
        tok, _ = tokens_from_act(taps["relu1"])
        enc = sae_encode("sae_mlp", eng.saes["relu1"].params, tok)
        all_enc.append(act_from_tokens(enc, taps["relu1"].shape))
    manual = jnp.mean(jnp.concatenate(all_enc, axis=0), axis=0)
    np.testing.assert_allclose(
        np.asarray(avgs.enc["relu1"]), np.asarray(manual), rtol=2e-5, atol=1e-6
    )


def test_node_ie_matches_manual(engine):
    """Node IE against a from-scratch computation using the IE formula directly."""
    eng, batches = engine
    avgs = eng.compute_averages(batches)
    node = eng.compute_node_ie(batches[:1], avgs)
    images, labels = batches[0]

    _, taps, grads = loss_and_tap_grads(
        eng.net, eng.params, None, images, labels, cross_entropy, ["relu1"]
    )
    tok, _ = tokens_from_act(taps["relu1"])
    gtok, _ = tokens_from_act(grads["relu1"])
    p = eng.saes["relu1"].params
    enc = sae_encode("sae_mlp", p, tok)
    dec = sae_decode("sae_mlp", p, enc)
    enc_grad = gtok @ p["W_dec"].T  # linear decoder chain rule
    manual_feat = ie_math.ie_channel_wise(enc, avgs.enc["relu1"], enc_grad, B)
    manual_err = ie_math.ie_all_channels(tok - dec, avgs.err["relu1"], gtok, B)
    np.testing.assert_allclose(
        np.asarray(node.features["relu1"]), np.asarray(manual_feat), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(node.error["relu1"]), float(manual_err), rtol=1e-4
    )
    assert node.model_neurons["relu1"].shape == (C,)


def test_edge_ie_matches_per_feature_loop(engine):
    """The batched-cotangent edge IE equals a literal per-downstream-feature gradient
    loop (the reference's backward(retain_graph=True) structure)."""
    eng, batches = engine
    avgs = eng.compute_averages(batches)
    idx = {"relu1": [0, 3, 7], "relu2": [1, 4]}
    edges = eng.compute_edge_ie(batches[:1], avgs, idx, custom_layers=["relu1", "relu2"])
    assert edges["relu1"].shape == (4, 3)  # [U_sel+1, D_sel+1]
    assert edges["relu2"].shape == (3, 1)  # last layer -> loss node

    # literal slow loop for the (relu1, relu2) pair on batch 0
    images, labels = batches[0]
    _, taps, grads = loss_and_tap_grads(
        eng.net, eng.params, None, images, labels, cross_entropy, ["relu1", "relu2"]
    )
    act_u, act_d = taps["relu1"], taps["relu2"]
    p_u, p_d = eng.saes["relu1"].params, eng.saes["relu2"].params
    gd_tok, _ = tokens_from_act(grads["relu2"])
    tok_d0, _ = tokens_from_act(act_d)
    enc_d0 = sae_encode("sae_mlp", p_d, tok_d0)
    grad_m_d = gd_tok @ p_d["W_dec"].T
    tok_u, _ = tokens_from_act(act_u)
    enc_u0 = sae_encode("sae_mlp", p_u, tok_u)
    err_u = tok_u - sae_decode("sae_mlp", p_u, enc_u0)

    def prod_j(eps_enc, eps_dec, j):
        enc_u = enc_u0 + eps_enc
        dec_u = sae_decode("sae_mlp", p_u, enc_u) + eps_dec
        spliced = splice_with_error(tok_u, dec_u)
        act_sp = act_from_tokens(spliced, act_u.shape)
        act_d2 = eng.net.apply_segment(eng.params, act_sp, after="relu1", upto="relu2")
        tok_d, _ = tokens_from_act(act_d2)
        enc_d = sae_encode("sae_mlp", p_d, tok_d)
        if j == -1:  # downstream error node
            err_d = tok_d - sae_decode("sae_mlp", p_d, enc_d)
            return jnp.mean(jnp.sum(gd_tok * err_d, axis=-1))
        return jnp.mean(grad_m_d[:, j] * enc_d[:, j])

    cols = []
    for j in idx["relu2"] + [-1]:
        g_enc, g_dec = jax.grad(prod_j, argnums=(0, 1))(
            jnp.zeros_like(enc_u0), jnp.zeros_like(tok_u), j
        )
        sel = jnp.asarray(idx["relu1"])
        fe = ie_math.ie_channel_wise(
            enc_u0[:, sel], avgs.enc["relu1"][..., sel], g_enc[:, sel], B
        )
        er = ie_math.ie_all_channels(err_u, avgs.err["relu1"], g_dec, B)
        cols.append(jnp.concatenate([fe, er[None]]))
    manual = jnp.stack(cols, axis=1)
    np.testing.assert_allclose(
        np.asarray(edges["relu1"]), np.asarray(manual), rtol=1e-4, atol=1e-7
    )


def test_faithfulness_bounds(engine):
    """Keeping every node must give faithfulness == 1 (the circuit IS the model:
    ablating nothing and keeping original SAE errors reconstructs the layer output
    exactly); ablating every node must give faithfulness == 0 (m_C == m_empty)."""
    eng, batches = engine
    avgs = eng.compute_averages(batches)
    node = eng.compute_node_ie(batches, avgs)

    full = eng.compute_faithfulness(
        batches, node, feature_threshold=-1.0, averages=avgs
    )
    assert full["faithfulness"] == pytest.approx(1.0, abs=1e-4)
    assert full["m_C"] == pytest.approx(full["m_M"], rel=1e-5)

    empty = eng.compute_faithfulness(
        batches, node, feature_threshold=1e9, averages=avgs
    )
    assert empty["faithfulness"] == pytest.approx(0.0, abs=1e-4)

    model_variant = eng.compute_faithfulness(
        batches, node, feature_threshold=-1.0, model_or_sae="model", averages=avgs
    )
    assert model_variant["faithfulness"] == pytest.approx(1.0, abs=1e-4)


def test_faithfulness_threshold_grid():
    from sparse_vision_tpu.interp.circuit import FAITHFULNESS_THRESHOLDS

    assert len(FAITHFULNESS_THRESHOLDS) == 20
    assert FAITHFULNESS_THRESHOLDS[0] == 1e-10 and FAITHFULNESS_THRESHOLDS[-1] == 1.0


def test_edge_ie_chunked_cotangents_match_unchunked(engine):
    """Feature-chunked edge IE (SURVEY §7.3 #2) equals the single-vmap path."""
    eng, batches = engine
    avgs = eng.compute_averages(batches)
    idx = {"relu1": [0, 3, 7, 9], "relu2": [1, 4, 6, 8, 10]}
    full = eng.compute_edge_ie(batches[:1], avgs, idx,
                               custom_layers=["relu1", "relu2"], cotangent_chunk=64)
    chunked = eng.compute_edge_ie(batches[:1], avgs, idx,
                                  custom_layers=["relu1", "relu2"], cotangent_chunk=2)
    for name in full:
        np.testing.assert_allclose(np.asarray(chunked[name]), np.asarray(full[name]),
                                   rtol=1e-5, atol=1e-8, err_msg=name)


def test_circuit_passes_shard_over_data_mesh(engine):
    """Multi-chip circuit tier: averages + node IE with batches SHARDED over an
    8-device 'data' mesh (GSPMD partitions the jitted passes; batch reductions
    become collectives) match the unsharded results. The IE production loop places
    batches with Pipeline.batch_sharding when cfg.mesh_shape is set, so this is the
    compute_ie scale-out path."""
    from sparse_vision_tpu.parallel.mesh import data_sharding, make_mesh

    eng, _ = engine
    mesh = make_mesh((8,))
    sh = data_sharding(mesh)
    key = jax.random.key(9)
    batches, sharded = [], []
    for i in range(2):
        k1, k2, key = jax.random.split(key, 3)
        img = jax.random.normal(k1, (16, H, W, 3))  # 16 images / 8 chips
        lab = jax.random.randint(k2, (16,), 0, 4)
        batches.append((img, lab))
        sharded.append((jax.device_put(img, sh), jax.device_put(lab, sh)))

    a_ref = eng.compute_averages(batches)
    a_sh = eng.compute_averages(sharded)
    for name in a_ref.enc:
        np.testing.assert_allclose(np.asarray(a_sh.enc[name]),
                                   np.asarray(a_ref.enc[name]), rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(a_sh.dead[name]),
                                      np.asarray(a_ref.dead[name]))

    n_ref = eng.compute_node_ie(batches, a_ref)
    n_sh = eng.compute_node_ie(sharded, a_ref)
    for name in n_ref.features:
        np.testing.assert_allclose(np.asarray(n_sh.features[name]),
                                   np.asarray(n_ref.features[name]),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
        np.testing.assert_allclose(float(n_sh.error[name]),
                                   float(n_ref.error[name]), rtol=1e-5)
