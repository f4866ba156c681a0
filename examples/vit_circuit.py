"""Feature-circuit discovery on a CLIP vision tower's ATTENTION taps.

The round-3 split-block variants expose every encoder block's attention output
as a named stage (models/vit.py _block_stages, after Kissane et al.'s
attention-SAE recipe); this drives the full CircuitEngine over two of those
rank-3 [B, N, D] token taps: dataset averages -> node IE -> edge IE ->
faithfulness sweep (the reference capability, compute_ie.py:365-944, on a
model family the reference does not have).

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python examples/vit_circuit.py /tmp/vit_circuit
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from sparse_vision_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()

import jax
import numpy as np

from sparse_vision_tpu.eval_tools.figures import plot_ie_histograms
from sparse_vision_tpu.interp.circuit import CircuitEngine, FrozenSAE
from sparse_vision_tpu.models.backbone import (
    get_sae_input_size,
    init_backbone,
    make_backbone,
)
from sparse_vision_tpu.models.sae import init_sae
from sparse_vision_tpu.ops.losses import get_criterion


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    layers = ["block0_attn", "block1_attn"]
    net = make_backbone("clip_vit_test_split", "cifar_10")
    params, state = init_backbone(net, jax.random.key(0), "cifar_10")
    dim = get_sae_input_size(net, "cifar_10", layers[0])
    saes = {
        n: FrozenSAE("sae_mlp", init_sae("sae_mlp", jax.random.key(i + 1), dim, 2), 2)
        for i, n in enumerate(layers)
    }
    eng = CircuitEngine(net, params, saes, get_criterion("cross_entropy"),
                        state=state or None)

    key = jax.random.key(2)
    batches = []
    for _ in range(2):
        k1, k2, key = jax.random.split(key, 3)
        batches.append((jax.random.normal(k1, (8, 32, 32, 3)),
                        jax.random.randint(k2, (8,), 0, 10)))

    avgs = eng.compute_averages(batches)
    n_tok = avgs.enc[layers[0]].shape[0]
    print(f"averages: {n_tok} token positions x {dim * 2} latents per layer")

    node = eng.compute_node_ie(batches, avgs)
    plot_ie_histograms({n: node.features[n] for n in layers},
                       os.path.join(out_dir, "vit_ie_hist.png"))

    # edge IE between the two attention taps (top-8 node-IE features per side)
    idx = {n: [int(i) for i in
               np.argsort(-np.abs(np.asarray(node.features[n])))[:8]]
           for n in layers}
    edges = eng.compute_edge_ie(batches[:1], avgs, idx, custom_layers=layers)
    print(f"edge matrix {layers[0]}->{layers[1]}: {edges[layers[0]].shape}, "
          f"loss-node column: {edges[layers[1]].shape}")
    assert np.isfinite(np.asarray(edges[layers[0]])).all()

    full = eng.compute_faithfulness(batches, node, -1.0, averages=avgs)
    empty = eng.compute_faithfulness(batches, node, 1e9, averages=avgs)
    print(f"faithfulness keep-all={full['faithfulness']:.4f} "
          f"ablate-all={empty['faithfulness']:.4f}")
    assert abs(full["faithfulness"] - 1.0) < 1e-3
    assert abs(empty["faithfulness"]) < 1e-3
    print("OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/vit_circuit")
