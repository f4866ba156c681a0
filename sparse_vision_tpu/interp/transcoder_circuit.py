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
