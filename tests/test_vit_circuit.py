"""Circuit tier on ViT/CLIP attention taps (rank-3 [B, N, D] activations).

Round-3 built split-block attention-out/MLP-out tap surfaces for attention-SAE
work (models/vit.py _block_stages); this pins that the full CircuitEngine —
averages, node IE, edge IE, faithfulness (reference capability
compute_ie.py:365-944) — runs on those taps with per-token-position [N, C*K]
averages, mirroring tests/test_circuit.py's conv coverage: manual-formula
parity for node IE, a literal per-feature gradient loop for edge IE, and the
faithfulness anchors (1.0 keeping everything, 0.0 ablating everything)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vision_tpu.interp import ie_math
from sparse_vision_tpu.interp.circuit import CircuitEngine, FrozenSAE
from sparse_vision_tpu.interp.patching import loss_and_tap_grads, splice_with_error
from sparse_vision_tpu.models.backbone import (
    get_sae_input_size,
    init_backbone,
    make_backbone,
)
from sparse_vision_tpu.models.sae import (
    act_from_tokens,
    init_sae_mlp,
    sae_decode,
    sae_encode,
    tokens_from_act,
)
from sparse_vision_tpu.ops.losses import cross_entropy

B = 3
K = 2  # expansion factor
LAYERS = ["block0_attn", "block1_attn"]  # attention-out taps (Kissane et al.)


@pytest.fixture(scope="module", params=["vit_test_split", "clip_vit_test_split"])
def engine(request):
    net = make_backbone(request.param, "cifar_10")
    params, state = init_backbone(net, jax.random.key(0), "cifar_10")
    dim = get_sae_input_size(net, "cifar_10", LAYERS[0])
    saes = {
        n: FrozenSAE("sae_mlp", init_sae_mlp(jax.random.key(i + 1), dim, K), K)
        for i, n in enumerate(LAYERS)
    }
    eng = CircuitEngine(net, params, saes, cross_entropy, state=state or None)
    key = jax.random.key(7)
    batches = []
    for _ in range(3):
        k1, k2, key = jax.random.split(key, 3)
        batches.append((
            jax.random.normal(k1, (B, 32, 32, 3)),
            jax.random.randint(k2, (B,), 0, 10),
        ))
    return eng, batches, dim


def test_vit_averages_are_per_token_position(engine):
    eng, batches, dim = engine
    n_tok = 65  # 32px / patch 4 -> 64 patches + CLS
    avgs = eng.compute_averages(batches)
    assert avgs.enc[LAYERS[0]].shape == (n_tok, dim * K)
    assert avgs.err[LAYERS[0]].shape == (n_tok, dim)
    assert avgs.out[LAYERS[1]].shape == (n_tok, dim)
    assert avgs.dead[LAYERS[0]].shape == (dim * K,)

    # golden: manual mean of encoder outputs over the batch axis only (the
    # token axis is a POSITION axis, like H/W for convs — averages keep it)
    all_enc = []
    for images, _ in batches:
        _, taps, _ = eng.net.apply(eng.params, images, state=eng.state)
        tok, _ = tokens_from_act(taps[LAYERS[0]])
        enc = sae_encode("sae_mlp", eng.saes[LAYERS[0]].params, tok)
        all_enc.append(act_from_tokens(enc, taps[LAYERS[0]].shape))
    manual = jnp.mean(jnp.concatenate(all_enc, axis=0), axis=0)
    np.testing.assert_allclose(
        np.asarray(avgs.enc[LAYERS[0]]), np.asarray(manual), rtol=2e-5, atol=1e-6
    )


def test_vit_node_ie_matches_manual(engine):
    eng, batches, dim = engine
    avgs = eng.compute_averages(batches)
    node = eng.compute_node_ie(batches[:1], avgs)
    images, labels = batches[0]

    _, taps, grads = loss_and_tap_grads(
        eng.net, eng.params, eng.state, images, labels, cross_entropy,
        [LAYERS[0]],
    )
    tok, _ = tokens_from_act(taps[LAYERS[0]])
    gtok, _ = tokens_from_act(grads[LAYERS[0]])
    p = eng.saes[LAYERS[0]].params
    enc = sae_encode("sae_mlp", p, tok)
    dec = sae_decode("sae_mlp", p, enc)
    enc_grad = gtok @ p["W_dec"].T
    manual_feat = ie_math.ie_channel_wise(enc, avgs.enc[LAYERS[0]], enc_grad, B)
    manual_err = ie_math.ie_all_channels(
        tok - dec, avgs.err[LAYERS[0]], gtok, B
    )
    np.testing.assert_allclose(
        np.asarray(node.features[LAYERS[0]]), np.asarray(manual_feat), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(node.error[LAYERS[0]]), float(manual_err), rtol=1e-4
    )
    assert node.model_neurons[LAYERS[0]].shape == (dim,)
    assert np.isfinite(np.asarray(node.features[LAYERS[1]])).all()


def test_vit_edge_ie_matches_per_feature_loop(engine):
    """Batched-cotangent edge IE on token taps equals a literal per-feature
    gradient loop through the block0_attn -> block1_attn segment."""
    eng, batches, _ = engine
    avgs = eng.compute_averages(batches)
    idx = {LAYERS[0]: [0, 3, 7], LAYERS[1]: [1, 4]}
    edges = eng.compute_edge_ie(batches[:1], avgs, idx, custom_layers=LAYERS)
    assert edges[LAYERS[0]].shape == (4, 3)
    assert edges[LAYERS[1]].shape == (3, 1)  # last layer -> loss node

    images, labels = batches[0]
    _, taps, grads = loss_and_tap_grads(
        eng.net, eng.params, eng.state, images, labels, cross_entropy, LAYERS
    )
    act_u, act_d = taps[LAYERS[0]], taps[LAYERS[1]]
    p_u, p_d = eng.saes[LAYERS[0]].params, eng.saes[LAYERS[1]].params
    gd_tok, _ = tokens_from_act(grads[LAYERS[1]])
    tok_d0, _ = tokens_from_act(act_d)
    grad_m_d = gd_tok @ p_d["W_dec"].T
    tok_u, _ = tokens_from_act(act_u)
    enc_u0 = sae_encode("sae_mlp", p_u, tok_u)
    err_u = tok_u - sae_decode("sae_mlp", p_u, enc_u0)

    def prod_j(eps_enc, eps_dec, j):
        enc_u = enc_u0 + eps_enc
        dec_u = sae_decode("sae_mlp", p_u, enc_u) + eps_dec
        spliced = splice_with_error(tok_u, dec_u)
        act_sp = act_from_tokens(spliced, act_u.shape)
        act_d2 = eng.net.apply_segment(
            eng.params, act_sp, after=LAYERS[0], upto=LAYERS[1], state=eng.state
        )
        tok_d, _ = tokens_from_act(act_d2)
        enc_d = sae_encode("sae_mlp", p_d, tok_d)
        if j == -1:  # downstream error node
            err_d = tok_d - sae_decode("sae_mlp", p_d, enc_d)
            return jnp.mean(jnp.sum(gd_tok * err_d, axis=-1))
        return jnp.mean(grad_m_d[:, j] * enc_d[:, j])

    cols = []
    for j in idx[LAYERS[1]] + [-1]:
        g_enc, g_dec = jax.grad(prod_j, argnums=(0, 1))(
            jnp.zeros_like(enc_u0), jnp.zeros_like(tok_u), j
        )
        sel = jnp.asarray(idx[LAYERS[0]])
        fe = ie_math.ie_channel_wise(
            enc_u0[:, sel], avgs.enc[LAYERS[0]][..., sel], g_enc[:, sel], B
        )
        er = ie_math.ie_all_channels(err_u, avgs.err[LAYERS[0]], g_dec, B)
        cols.append(jnp.concatenate([fe, er[None]]))
    manual = jnp.stack(cols, axis=1)
    np.testing.assert_allclose(
        np.asarray(edges[LAYERS[0]]), np.asarray(manual), rtol=1e-4, atol=1e-7
    )


def test_vit_faithfulness_bounds(engine):
    eng, batches, _ = engine
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


def test_vit_circuit_shards_over_data_mesh(engine):
    """Averages + node IE on token taps with batches sharded over the 8-device
    'data' mesh match the unsharded results (the compute_ie scale-out path)."""
    from sparse_vision_tpu.parallel.mesh import data_sharding, make_mesh

    eng, _, _ = engine
    mesh = make_mesh((8,))
    sh = data_sharding(mesh)
    key = jax.random.key(11)
    batches, sharded = [], []
    for _ in range(2):
        k1, k2, key = jax.random.split(key, 3)
        img = jax.random.normal(k1, (16, 32, 32, 3))
        lab = jax.random.randint(k2, (16,), 0, 10)
        batches.append((img, lab))
        sharded.append((jax.device_put(img, sh), jax.device_put(lab, sh)))

    a_ref = eng.compute_averages(batches)
    a_sh = eng.compute_averages(sharded)
    for name in a_ref.enc:
        np.testing.assert_allclose(np.asarray(a_sh.enc[name]),
                                   np.asarray(a_ref.enc[name]),
                                   rtol=1e-5, atol=1e-6)

    n_ref = eng.compute_node_ie(batches, a_ref)
    n_sh = eng.compute_node_ie(sharded, a_ref)
    for name in n_ref.features:
        np.testing.assert_allclose(np.asarray(n_sh.features[name]),
                                   np.asarray(n_ref.features[name]),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
