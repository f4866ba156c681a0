"""Transcoder feature circuits (interp/transcoder_circuit.py; Dunefsky et al.
2024 §4): the connection matrix must be the exact latent-to-latent Jacobian of
the chain splice, the two-matmul edge attribution must equal the literal
per-token per-feature loop, and a planted feature-to-feature connection must
be recovered as the top edge."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vision_tpu.interp.transcoder_circuit import (
    compute_transcoder_edges,
    make_chain_edge_fn,
    top_edges,
    transcoder_chains,
    transcoder_connection_matrix,
)
from sparse_vision_tpu.models.layers import SeqNet, linear, relu
from sparse_vision_tpu.models.sae import init_transcoder


def _net_and_params(seed=0, d_in=12, dims=(10, 8, 6, 4)):
    net = SeqNet([
        linear("fc1", dims[0]), relu("relu1"),
        linear("fc2", dims[1]), relu("relu2"),
        linear("fc3", dims[2]), relu("relu3"),
        linear("fc4", dims[3]),
    ])
    params, state = net.init(jax.random.key(seed), (d_in,))
    return net, params, state


def test_connection_matrix_is_exact_chain_jacobian():
    """C = W_dec_up @ W_enc_down equals jax.jacobian of the chain splice
    (upstream decode -> downstream pre-activation) for every latent pair."""
    p_up = init_transcoder(jax.random.key(0), 10, 2, 8)   # h_up=20 -> 8 dims
    p_dn = init_transcoder(jax.random.key(1), 8, 3, 6)    # 8 dims -> h_dn=24
    conn = transcoder_connection_matrix(p_up, p_dn)
    assert conn.shape == (20, 24)

    def chain_pre(z_up):
        y_hat = z_up @ p_up["W_dec"] + p_up["b_dec"]
        return y_hat @ p_dn["W_enc"] + p_dn["b_enc"]

    jac = jax.jacobian(chain_pre)(jnp.ones((20,), jnp.float32))  # [24, 20]
    np.testing.assert_allclose(np.asarray(conn), np.asarray(jac).T,
                               rtol=1e-6, atol=1e-7)


def test_connection_matrix_rejects_mismatched_pairs():
    p_up = init_transcoder(jax.random.key(0), 10, 2, 8)
    p_dn = init_transcoder(jax.random.key(1), 7, 2, 6)  # reads 7 dims, not 8
    with pytest.raises(ValueError, match="middle layer"):
        transcoder_connection_matrix(p_up, p_dn)


def test_transcoder_chains_grouping():
    pairs = [("a", "b"), ("b", "c"), ("d", "e"), ("e", "f"), ("g", "h")]
    assert transcoder_chains(pairs) == [
        [("a", "b"), ("b", "c")],
        [("d", "e"), ("e", "f")],
        [("g", "h")],
    ]


def test_edge_attribution_matches_literal_loop():
    """The two-matmul edge pass equals the literal loop over tokens and
    feature pairs, for both gate choices."""
    net, params, state = _net_and_params()
    chain = [("fc1", "fc2"), ("fc2", "fc3")]
    tc1 = init_transcoder(jax.random.key(10), 10, 2, 8)
    tc2 = init_transcoder(jax.random.key(11), 8, 2, 6)
    images = jax.random.normal(jax.random.key(12), (16, 12), jnp.float32)

    for gate in ("active", "value"):
        edges = compute_transcoder_edges(
            net, params, state, chain, [tc1, tc2], [images], gate=gate,
        )
        assert len(edges) == 1 and edges[0].shape == (20, 16)

        _, taps, _ = net.apply(params, images, state=state)
        z1 = np.asarray(jax.nn.relu(
            taps["fc1"] @ tc1["W_enc"] + tc1["b_enc"]))
        z2 = np.asarray(jax.nn.relu(
            taps["fc2"] @ tc2["W_enc"] + tc2["b_enc"]))
        conn = np.asarray(tc1["W_dec"] @ tc2["W_enc"])
        want = np.zeros((20, 16))
        for t in range(16):
            for i in range(20):
                for j in range(16):
                    g = float(z2[t, j] > 0) if gate == "active" else z2[t, j]
                    want[i, j] += z1[t, i] * conn[i, j] * g
        want /= 16
        np.testing.assert_allclose(edges[0], want, rtol=1e-5, atol=1e-7,
                                   err_msg=gate)


def test_planted_connection_is_top_edge():
    """Plant one latent-to-latent connection in otherwise-orthogonal weights:
    upstream latent 2 writes middle direction e_0, downstream latent 5 reads
    e_0 — edge (2, 5) must dominate the attribution matrix."""
    net, params, state = _net_and_params(seed=3)
    tc1 = init_transcoder(jax.random.key(20), 10, 2, 8)
    tc2 = init_transcoder(jax.random.key(21), 8, 2, 6)
    w_dec1 = np.zeros((20, 8), np.float32)
    w_dec1[2, 0] = 1.0  # only latent 2 writes, along e_0
    w_enc2 = np.zeros((8, 16), np.float32)
    w_enc2[0, 5] = 1.0  # only latent 5 reads, from e_0
    tc1 = dict(tc1, W_dec=jnp.asarray(w_dec1))
    tc2 = dict(tc2, W_enc=jnp.asarray(w_enc2),
               b_enc=jnp.ones((16,), jnp.float32))  # keep downstream gate open
    images = jax.random.normal(jax.random.key(22), (32, 12), jnp.float32)
    edges = compute_transcoder_edges(
        net, params, state, [("fc1", "fc2"), ("fc2", "fc3")], [tc1, tc2],
        [images],
    )
    strongest = top_edges(edges[0], k=1)
    assert strongest[0][:2] == (2, 5), strongest
    # everything else is exactly zero: no other latent writes or reads
    mask = np.ones_like(edges[0], bool)
    mask[2, 5] = False
    np.testing.assert_array_equal(edges[0][mask], 0.0)


def test_loss_node_edges_match_autodiff_scales():
    """The one-backward-plus-one-matmul loss attribution equals jax.grad of
    the explicit per-latent scale injection at s=1 — the exact first-order
    effect of scaling each latent's contribution to the target activation."""
    from types import SimpleNamespace

    from sparse_vision_tpu.interp.transcoder_circuit import loss_node_edges
    from sparse_vision_tpu.ops.losses import cross_entropy

    net, params, state = _net_and_params(seed=5)
    tc = init_transcoder(jax.random.key(30), 8, 2, 6)  # fc2 -> fc3, h=16
    images = jax.random.normal(jax.random.key(31), (16, 12), jnp.float32)
    labels = jax.random.randint(jax.random.key(32), (16,), 0, 4)
    batch = SimpleNamespace(images=images, labels=labels)

    edges = loss_node_edges(
        net, params, state, ("fc2", "fc3"), tc, [batch], cross_entropy,
    )
    assert edges.shape == (16,)

    _, taps, _ = net.apply(params, images, state=state)
    z = jax.nn.relu(taps["fc2"] @ tc["W_enc"] + tc["b_enc"])

    def f(s):
        spliced = taps["fc3"] + (z * (s - 1.0)) @ tc["W_dec"]
        logits = net.apply_segment(params, spliced, after="fc3", upto="fc4",
                                   state=state)
        return cross_entropy(logits, labels)

    want = jax.grad(f)(jnp.ones((16,), jnp.float32))
    np.testing.assert_allclose(edges, np.asarray(want), rtol=1e-4, atol=1e-7)


def test_chain_faithfulness_anchors():
    """Hand-built EXACT transcoders (W_enc=I captures the ReLU, W_dec=the
    segment's own linear weights) give faithfulness == 1 with full masks;
    all-zero masks give exactly 0 (m_C == m_empty)."""
    from types import SimpleNamespace

    from sparse_vision_tpu.interp.transcoder_circuit import chain_faithfulness
    from sparse_vision_tpu.ops.losses import cross_entropy

    net, params, state = _net_and_params(seed=7)
    # segment fc1 -> fc2 is a2 = relu(a1) @ w2 + b2: exactly a transcoder
    tc1 = {"W_enc": jnp.eye(10), "b_enc": jnp.zeros((10,)),
           "W_dec": params["fc2"]["w"], "b_dec": params["fc2"]["b"]}
    tc2 = {"W_enc": jnp.eye(8), "b_enc": jnp.zeros((8,)),
           "W_dec": params["fc3"]["w"], "b_dec": params["fc3"]["b"]}
    chain = [("fc1", "fc2"), ("fc2", "fc3")]
    batches = [SimpleNamespace(
        images=jax.random.normal(jax.random.key(40 + i), (8, 12), jnp.float32),
        labels=jax.random.randint(jax.random.key(50 + i), (8,), 0, 4),
    ) for i in range(2)]

    full = chain_faithfulness(
        net, params, state, chain, [tc1, tc2],
        [np.ones(10), np.ones(8)], batches, cross_entropy,
    )
    np.testing.assert_allclose(full["faithfulness"], 1.0, atol=1e-5)
    np.testing.assert_allclose(full["m_C"], full["m_M"], rtol=1e-6)
    assert full["kept_latents"] == [10, 8]

    empty = chain_faithfulness(
        net, params, state, chain, [tc1, tc2],
        [np.zeros(10), np.zeros(8)], batches, cross_entropy,
    )
    np.testing.assert_allclose(empty["faithfulness"], 0.0, atol=1e-7)


def test_chain_edge_fn_validation():
    tc1 = init_transcoder(jax.random.key(0), 10, 2, 8)
    net, _, _ = _net_and_params()
    with pytest.raises(ValueError, match="at least 2"):
        make_chain_edge_fn(net, [("fc1", "fc2")], [tc1])
    tc2 = init_transcoder(jax.random.key(1), 8, 2, 6)
    with pytest.raises(ValueError, match="gate"):
        make_chain_edge_fn(net, [("fc1", "fc2"), ("fc2", "fc3")],
                           [tc1, tc2], gate="softmax")


def test_trained_chain_end_to_end(tmp_path):
    """Full flow on the synthetic dataset: train a transcoder per eligible
    custom_mlp_3 pair off one dump (train_transcoders_multilayer), reload the
    pair weights, and compute chain edges over real batches."""
    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.interp.transcoder_circuit import load_pair_params
    from sparse_vision_tpu.train.multilayer import (
        train_transcoders_multilayer,
        transcoder_pairs,
    )
    from sparse_vision_tpu.train.pipeline import Pipeline

    base = RunConfig(
        model_name="custom_mlp_3", sae_model_name="transcoder",
        sae_layer="fc1", dataset_name="synthetic",
        directory_path=str(tmp_path), sae_epochs=1, sae_batch_size=64,
        batch_size=64, sae_learning_rate=1e-3,
        sae_optimizer_name="constrained_adam", sae_lambda_sparse=0.05,
        sae_expansion_factor=2, dead_neurons_steps=10_000,
        use_activation_cache=True, cache_tokens_per_step=64, log_every=1000,
    )
    pairs = [("fc1", "fc2"), ("fc2", "fc3")]
    results = train_transcoders_multilayer(base, pairs=pairs,
                                           use_registry=False)
    assert set(results) == set(pairs)

    params_list = load_pair_params(base, pairs, use_registry=False)
    assert params_list[0]["W_dec"].shape[1] == params_list[1]["W_enc"].shape[0]
    # any Pipeline over the same backbone/dataset supplies net + batches
    pipe = Pipeline(dataclasses.replace(
        base, sae_model_name="sae_mlp", transcoder_target_layer="",
        training=False, use_activation_cache=False,
    ))
    batches = list(pipe._batches(pipe.train_ds, 64, shuffle=False, seed=0))[:2]
    edges = compute_transcoder_edges(
        pipe.net, pipe.frozen_params, pipe.net_state, pairs, params_list,
        batches,
    )
    assert len(edges) == 1
    h1 = params_list[0]["W_enc"].shape[1]
    h2 = params_list[1]["W_enc"].shape[1]
    assert edges[0].shape == (h1, h2)
    assert np.isfinite(edges[0]).all()
    assert np.abs(edges[0]).sum() > 0  # trained latents actually connect
