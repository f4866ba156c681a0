"""Circuit-discovery example: averages -> node IE -> faithfulness sweep on a small
CNN with an SAE at each of two layers (synthetic data; runs on CPU).

    JAX_PLATFORMS=cpu python examples/discover_circuit.py
"""

import jax

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested

pin_cpu_if_requested()  # site-hook quirk: see utils/platform.py

from sparse_vision_tpu.eval_tools.figures import plot_ie_histograms, plot_node_count_vs_threshold
from sparse_vision_tpu.interp.circuit import FAITHFULNESS_THRESHOLDS, CircuitEngine, FrozenSAE
from sparse_vision_tpu.models.backbone import get_sae_input_size, make_backbone
from sparse_vision_tpu.models.sae import init_sae
from sparse_vision_tpu.ops.losses import get_criterion

net = make_backbone("custom_cnn_1", "cifar_10")
params, _ = net.init(jax.random.key(0), (32, 32, 3))
layers = ["relu1", "relu2"]
saes = {
    n: FrozenSAE("sae_mlp",
                 init_sae("sae_mlp", jax.random.key(i), get_sae_input_size(net, "cifar_10", n), 2), 2)
    for i, n in enumerate(layers)
}
eng = CircuitEngine(net, params, saes, get_criterion("cross_entropy"))

key = jax.random.key(1)
batches = []
for _ in range(2):
    k1, k2, key = jax.random.split(key, 3)
    batches.append((jax.random.normal(k1, (8, 32, 32, 3)),
                    jax.random.randint(k2, (8,), 0, 10)))

avgs = eng.compute_averages(batches)
node = eng.compute_node_ie(batches, avgs)
plot_ie_histograms({n: node.features[n] for n in layers}, "/tmp/ie_hist.png")
plot_node_count_vs_threshold({n: node.features[n] for n in layers},
                             FAITHFULNESS_THRESHOLDS[:10], "/tmp/node_counts.png")
for thr in (FAITHFULNESS_THRESHOLDS[0], FAITHFULNESS_THRESHOLDS[-1]):
    r = eng.compute_faithfulness(batches, node, thr, averages=avgs)
    print(f"threshold {thr:g}: faithfulness={r['faithfulness']:.4f} "
          f"nodes={r['num_feature_nodes']}")
print("figures: /tmp/ie_hist.png /tmp/node_counts.png")
