"""Transcoder feature circuits without backward passes (Dunefsky et al. 2024):
train a transcoder per consecutive layer pair off ONE activation dump, then
read latent-to-latent edges straight from two matmuls per pair —

    C = W_dec_up @ W_enc_down            (input-invariant connection matrix)
    edge = C * (Z_up^T gate(Z_down)) / T (batch attribution, MXU-shaped)

— where the reference's SAE edge IE needs one backward pass per downstream
feature (compute_ie.py:589-624; interp/transcoder_circuit.py for the math).

    JAX_PLATFORMS=cpu python examples/transcoder_circuit.py [workdir]

Runs on synthetic data / CPU in ~2 min.
"""

import dataclasses
import sys
import tempfile

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested

pin_cpu_if_requested()  # site-hook quirk: see utils/platform.py

from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.interp.transcoder_circuit import (
    compute_transcoder_edges,
    load_pair_params,
    top_edges,
    transcoder_chains,
)
from sparse_vision_tpu.train.multilayer import train_transcoders_multilayer
from sparse_vision_tpu.train.pipeline import Pipeline

workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="svt_tcc_")

base = RunConfig(
    model_name="custom_mlp_3",             # fc1 [64] -> fc2 [32] -> fc3 [16]
    sae_model_name="transcoder", sae_layer="fc1",
    dataset_name="synthetic", directory_path=workdir,
    batch_size=64, sae_batch_size=64, sae_epochs=2,
    sae_optimizer_name="constrained_adam", sae_expansion_factor=2,
    sae_lambda_sparse=0.05, dead_neurons_steps=10_000,
    use_activation_cache=True, cache_tokens_per_step=64, log_every=1000,
)

# 1) one dump feeds both pairs' training (train/multilayer.py)
pairs = [("fc1", "fc2"), ("fc2", "fc3")]
train_transcoders_multilayer(base, pairs=pairs, use_registry=False)

# 2) reload the trained pair weights and group them into chains
params_list = load_pair_params(base, pairs, use_registry=False)
(chain,) = transcoder_chains(pairs)

# 3) edge attribution over real batches — two matmuls per pair per batch
pipe = Pipeline(dataclasses.replace(
    base, sae_model_name="sae_mlp", transcoder_target_layer="",
    training=False, use_activation_cache=False,
))
batches = list(pipe._batches(pipe.train_ds, 64, shuffle=False, seed=0))[:4]
(edge,) = compute_transcoder_edges(
    pipe.net, pipe.frozen_params, pipe.net_state, chain, params_list, batches,
)

print(f"edge matrix (fc1->fc2 latents) x (fc2->fc3 latents): {edge.shape}")
print("strongest latent-to-latent edges (up, down, attribution):")
for i, j, v in top_edges(edge, k=5):
    print(f"  z[{i:3d}] -> z[{j:3d}]  {v:+.5f}")
assert (edge != 0).any()

# 4) loss-node edges for the terminal transcoder (one backward per batch)
import numpy as np

from sparse_vision_tpu.interp.transcoder_circuit import (
    chain_faithfulness,
    loss_node_edges,
)
from sparse_vision_tpu.ops.losses import cross_entropy

loss_edge = loss_node_edges(
    pipe.net, pipe.frozen_params, pipe.net_state, chain[-1], params_list[-1],
    batches, cross_entropy,
)
print("strongest latent -> loss attributions:",
      np.argsort(-np.abs(loss_edge))[:5].tolist())

# 5) faithfulness of the full-latent chain circuit vs the empty circuit
faith = chain_faithfulness(
    pipe.net, pipe.frozen_params, pipe.net_state, chain, params_list,
    [np.ones(p["b_enc"].shape[0]) for p in params_list], batches,
    cross_entropy,
)
print(f"chain faithfulness (all latents kept): {faith['faithfulness']:.3f} "
      f"(m_M={faith['m_M']:.4f}, m_C={faith['m_C']:.4f}, "
      f"m_empty={faith['m_empty']:.4f})")
print("transcoder circuit example OK")
