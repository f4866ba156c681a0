"""Transcoder feature circuits: latent-to-latent edges WITHOUT backward passes
(beyond-reference; Dunefsky et al. 2024 "Transcoders find interpretable LLM
feature circuits", §4).

The reference's edge IE between SAE latents is its hottest loop: one retained
backward pass per downstream feature (compute_ie.py:589-624), batched here into
chunked cotangents (interp/circuit.py) but still gradient work. Transcoders
dissolve that cost entirely: a transcoder is LINEAR from its latent activations
to its prediction (y_hat = z W_dec + b_dec, models/sae.py transcoder_apply), so
for a chain of transcoders T_k: (A_k -> A_{k+1}) the influence of upstream
latent i on downstream latent j's pre-activation factorizes as

    d pre_{k+1,j} / d z_{k,i} = (W_dec_k @ W_enc_{k+1})_{ij}  =: C_k[i, j]

— an INPUT-INVARIANT connection matrix (one [h_k, h_{k+1}] MXU matmul,
computable without any data), and the input-DEPENDENT edge attribution over a
token batch reduces to a second matmul:

    edge_k[i, j] = mean_t  z_{k,i}(t) * C_k[i, j] * gate_{k+1,j}(t)
                 = C_k ⊙ (Z_k^T G_{k+1}) / T

with Z_k [T, h_k] the upstream latents and G_{k+1} [T, h_{k+1}] the downstream
ReLU gate (1 where the downstream latent is active on that token, taken from
the REAL forward's tap — the standard linearization choice; pass
``gate="grad"`` to weight by the downstream activation value instead of the
0/1 gate). Two matmuls per layer pair per batch — no vjp, no cotangent
chunking, no retained graphs.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sparse_vision_tpu.models.sae import tokens_from_act


def transcoder_connection_matrix(p_up: dict, p_down: dict) -> jax.Array:
    """Input-invariant connection matrix C = W_dec_up @ W_enc_down
    ([h_up, h_down]): C[i, j] is EXACTLY d pre_down_j / d z_up_i when the
    upstream transcoder's prediction feeds the downstream encoder (the chain
    splice), for every input. Requires up's output space == down's input space
    (consecutive pairs sharing the middle layer)."""
    d_out_up = p_up["W_dec"].shape[1]
    d_in_down = p_down["W_enc"].shape[0]
    if d_out_up != d_in_down:
        raise ValueError(
            f"Chain mismatch: upstream decodes to {d_out_up} dims, downstream "
            f"encodes from {d_in_down} (pairs must share the middle layer)"
        )
    return p_up["W_dec"] @ p_down["W_enc"]


def transcoder_chains(
    pairs: Sequence[tuple[str, str]],
) -> list[list[tuple[str, str]]]:
    """Group consecutive (in, out) pairs into maximal chains: pair k+1 extends
    the chain when its input layer IS pair k's output layer. GoogLeNet's 5
    eligible pairs (train/multilayer.transcoder_pairs) form 3 chains:
    [3a->3b], [4b->4c->4d->4e], [5a->5b]."""
    chains: list[list[tuple[str, str]]] = []
    for pair in pairs:
        if chains and chains[-1][-1][1] == pair[0]:
            chains[-1].append(pair)
        else:
            chains.append([pair])
    return chains


def make_chain_edge_fn(
    net,
    chain: Sequence[tuple[str, str]],
    params_list: Sequence[dict],
    gate: str = "active",
) -> Callable:
    """Build the jitted per-batch edge pass for one chain of >= 2 transcoders:
    ``fn(frozen_params, frozen_state, images) -> (edge_sums, token_count)``
    where ``edge_sums[k]`` is the [h_k, h_{k+1}] SUM over the batch's tokens of
    z_up_i * C_k_ij * gate_down_j (divide by the accumulated token count for
    the mean — see :func:`compute_transcoder_edges`).

    ``gate="active"`` uses the downstream 0/1 activity gate;
    ``gate="value"`` weights by the downstream latent value z_down_j
    (emphasizing edges into STRONG downstream activations)."""
    if len(chain) < 2:
        raise ValueError("a chain edge pass needs at least 2 transcoders")
    if gate not in ("active", "value"):
        raise ValueError(f"unknown gate {gate!r} (use 'active' or 'value')")
    in_layers = [a for a, _ in chain]
    conns = [
        transcoder_connection_matrix(params_list[k], params_list[k + 1])
        for k in range(len(chain) - 1)
    ]

    @jax.jit
    def edge_fn(frozen_params: dict, frozen_state: dict, images: jax.Array):
        _, taps, _ = net.apply(frozen_params, images, state=frozen_state)
        zs = []
        for layer, params in zip(in_layers, params_list):
            tok, _ = tokens_from_act(taps[layer])
            zs.append(jax.nn.relu(tok @ params["W_enc"] + params["b_enc"]))
        edge_sums = []
        for k, conn in enumerate(conns):
            g = (zs[k + 1] > 0).astype(zs[k].dtype) if gate == "active" \
                else zs[k + 1]
            edge_sums.append(conn * (zs[k].T @ g))
        return tuple(edge_sums), zs[0].shape[0]

    return edge_fn


def compute_transcoder_edges(
    net,
    frozen_params: dict,
    frozen_state: dict,
    chain: Sequence[tuple[str, str]],
    params_list: Sequence[dict],
    batches,
    gate: str = "active",
) -> list[np.ndarray]:
    """Mean edge-attribution matrices over a dataset for one transcoder chain:
    returns ``[edge_k]`` with edge_k [h_k, h_{k+1}] = mean over all tokens of
    z_up_i * C_ij * gate_down_j. ``batches`` yields objects with ``.images``
    (data/datasets.Batch) or raw image arrays."""
    edge_fn = make_chain_edge_fn(net, chain, params_list, gate=gate)
    sums = None
    tokens = 0
    for b in batches:
        images = getattr(b, "images", b)
        batch_sums, t = edge_fn(frozen_params, frozen_state, images)
        if sums is None:
            sums = [jnp.zeros_like(s) for s in batch_sums]
        sums = [acc + s for acc, s in zip(sums, batch_sums)]
        tokens += int(t)
    if sums is None:
        raise ValueError("compute_transcoder_edges got an empty batch iterator")
    return [np.asarray(jax.device_get(s)) / tokens for s in sums]


def loss_node_edges(
    net,
    frozen_params: dict,
    frozen_state: dict,
    pair: tuple[str, str],
    params: dict,
    batches,
    criterion: Callable,
) -> np.ndarray:
    """Loss-node attribution per latent of the chain's TERMINAL transcoder
    (the reference's loss-node edge, compute_ie.py:631-706, without the
    per-feature loop): edge_j = sum_t z_j(t) * (dL/da_out(t) . W_dec_j) — the
    exact first-order effect on the batch loss of scaling latent j's
    contribution to the predicted target activation. One backward for the tap
    gradient (interp/patching.loss_and_tap_grads), then one matmul. Returned
    as the mean over batches of the per-batch attribution [h]."""
    from sparse_vision_tpu.interp.patching import loss_and_tap_grads

    in_layer, out_layer = pair

    @jax.jit
    def batch_fn(fp, fs, images, labels):
        _, taps, grads = loss_and_tap_grads(
            net, fp, fs, images, labels, criterion, [out_layer]
        )
        g, _ = tokens_from_act(grads[out_layer])
        tok, _ = tokens_from_act(taps[in_layer])
        z = jax.nn.relu(tok @ params["W_enc"] + params["b_enc"])
        return jnp.sum(z * (g @ params["W_dec"].T), axis=0)

    total = None
    n = 0
    for b in batches:
        images, labels = b.images, b.labels
        e = batch_fn(frozen_params, frozen_state, images, labels)
        total = e if total is None else total + e
        n += 1
    if total is None:
        raise ValueError("loss_node_edges got an empty batch iterator")
    return np.asarray(jax.device_get(total)) / n


def make_chain_splice_fn(
    net,
    chain: Sequence[tuple[str, str]],
    params_list: Sequence[dict],
    criterion: Callable,
    last_stage: Optional[str] = None,
) -> Callable:
    """Jitted chain-splice evaluation: ``fn(frozen_params, frozen_state,
    images, labels, masks) -> (m_orig, m_spliced)`` where the FULL segment
    (chain[0].in, chain[-1].out] is replaced by the transcoder chain — the
    first transcoder reads the real tap, every later one reads the previous
    one's PREDICTION, and each transcoder's latents are multiplied by its
    ``masks`` entry ([h_k], 0/1) — the circuit-ablation forward of Dunefsky
    et al. 2024 (the reference's faithfulness variants for SAE circuits:
    compute_ie.py:715-944)."""
    from sparse_vision_tpu.models.sae import act_from_tokens

    in0 = chain[0][0]
    out_k = chain[-1][1]
    last = last_stage or net.stage_names[-1]

    @jax.jit
    def fn(frozen_params, frozen_state, images, labels, masks):
        logits_orig, taps, _ = net.apply(
            frozen_params, images, state=frozen_state
        )
        y, _ = tokens_from_act(taps[in0])
        for params, mask in zip(params_list, masks):
            z = jax.nn.relu(y @ params["W_enc"] + params["b_enc"])
            y = (z * mask) @ params["W_dec"] + params["b_dec"]
        tgt = taps[out_k]
        act = act_from_tokens(y, tgt.shape) if tgt.ndim > 2 else y
        logits_mod = net.apply_segment(
            frozen_params, act, after=out_k, upto=last, state=frozen_state
        )
        return criterion(logits_orig, labels), criterion(logits_mod, labels)

    return fn


def chain_faithfulness(
    net,
    frozen_params: dict,
    frozen_state: dict,
    chain: Sequence[tuple[str, str]],
    params_list: Sequence[dict],
    masks: Sequence,
    batches,
    criterion: Callable,
) -> dict:
    """Faithfulness of a transcoder-latent circuit: (m(C) - m(empty)) /
    (m(M) - m(empty)) with m = the criterion through the chain splice — the
    reference's faithfulness ratio (compute_ie.py:715-944) for transcoder
    circuits. m(C) keeps only the ``masks`` latents, m(empty) zeroes every
    latent (the chain's bias cascade), m(M) is the unmodified model. Batch
    losses averaged with equal weight (compute_ie.py:889-902)."""
    fn = make_chain_splice_fn(net, chain, params_list, criterion)
    masks = tuple(jnp.asarray(m, jnp.float32) for m in masks)
    zeros = tuple(jnp.zeros_like(m) for m in masks)
    acc = {"m_M": 0.0, "m_C": 0.0, "m_empty": 0.0}
    n = 0
    for b in batches:
        images, labels = b.images, b.labels
        m_orig, m_c = fn(frozen_params, frozen_state, images, labels, masks)
        _, m_empty = fn(frozen_params, frozen_state, images, labels, zeros)
        acc["m_M"] += float(m_orig)
        acc["m_C"] += float(m_c)
        acc["m_empty"] += float(m_empty)
        n += 1
    if n == 0:
        raise ValueError("chain_faithfulness got an empty batch iterator")
    m = {k: v / n for k, v in acc.items()}
    denom = m["m_M"] - m["m_empty"]
    m["faithfulness"] = (m["m_C"] - m["m_empty"]) / denom if denom else float("nan")
    m["kept_latents"] = [int(np.sum(np.asarray(mk) > 0)) for mk in masks]
    return m


def top_edges(
    edge: np.ndarray, k: int = 20, threshold: float = 0.0
) -> list[tuple[int, int, float]]:
    """The k strongest (upstream latent, downstream latent, attribution)
    triples of one edge matrix, by |attribution|, strongest first."""
    flat = np.abs(edge).ravel()
    k = min(k, flat.size)
    idx = np.argpartition(flat, -k)[-k:]
    idx = idx[np.argsort(-flat[idx])]
    out = []
    for ij in idx:
        i, j = divmod(int(ij), edge.shape[1])
        val = float(edge[i, j])
        if abs(val) > threshold:
            out.append((i, j, val))
    return out


def load_pair_params(
    base_cfg,
    pairs: Sequence[tuple[str, str]],
    use_registry: bool = True,
) -> list[dict]:
    """Load the trained transcoder weights for each pair from the run layout
    train/multilayer.train_transcoders_multilayer produced (each pair's run
    identity = its input layer's config + transcoder_target_layer)."""
    import dataclasses

    from sparse_vision_tpu.train.multilayer import layer_config
    from sparse_vision_tpu.train.pipeline import Pipeline

    params_list = []
    for a, b in pairs:
        cfg = dataclasses.replace(
            layer_config(base_cfg, a, use_registry),
            sae_model_name="transcoder", transcoder_target_layer=b,
            training=False,
        )
        # restore the pair's FINAL per-epoch checkpoint (Pipeline._restore_sae)
        cfg = dataclasses.replace(cfg, sae_checkpoint_epoch=cfg.sae_epochs)
        pipe = Pipeline(cfg)
        params_list.append(jax.device_get(pipe.ts.params))
    return params_list
