"""Full-chain demo: train SAEs for several layers off ONE shared backbone pass,
then run the circuit tier on them — the complete sparse-feature-circuit workflow
(reference: one cluster job per layer, then compute_ie.py over the per-layer
frozen SAE registry) in a single script.

    JAX_PLATFORMS=cpu python examples/multilayer_circuit.py [workdir]

Flow: train_saes_multilayer (one activation dump feeds both layers' SAE training)
-> load the exported per-layer weights as FrozenSAEs -> CircuitEngine averages ->
node IE -> faithfulness sanity anchors (=1 when every node is kept).
Runs on synthetic data / CPU in ~2 min.
"""

import sys
import tempfile

import jax

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested

pin_cpu_if_requested()  # site-hook quirk: see utils/platform.py

from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.interp.circuit import (
    FAITHFULNESS_THRESHOLDS,
    CircuitEngine,
    FrozenSAE,
)
from sparse_vision_tpu.data.datasets import load_data
from sparse_vision_tpu.models.backbone import make_backbone
from sparse_vision_tpu.ops.losses import get_criterion
from sparse_vision_tpu.train.multilayer import layer_config, train_saes_multilayer
from sparse_vision_tpu.train.sae_io import load_sae_weights
from sparse_vision_tpu.utils.paths import folder_paths, sae_params_no_epochs

workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="ml_circuit_")
LAYERS = ["relu1", "relu2"]

base = RunConfig(
    model_name="custom_cnn_1", sae_layer=LAYERS[0], dataset_name="synthetic",
    directory_path=workdir, sae_epochs=1, sae_batch_size=64, batch_size=64,
    sae_expansion_factor=2, dead_neurons_steps=100, use_activation_cache=True,
    cache_tokens_per_step=512, log_every=1000,
)

# 1) one backbone pass dumps both layers' caches; each SAE trains from its cache
results = train_saes_multilayer(base, layers=LAYERS, use_registry=False)
for layer, res in results.items():
    print(f"{layer}: rec_loss={res['sae_rec_loss']:.4f} sparsity={res['sparsity']:.3f}")

# 2) the exported weight files become the circuit tier's frozen SAEs
def frozen_sae(layer: str) -> FrozenSAE:
    cfg_l = layer_config(base, layer, use_registry=False)
    name = f"{layer}_" + "_".join(str(v) for v in sae_params_no_epochs(cfg_l).values())
    path = f"{folder_paths(cfg_l)['sae_weights']}/{name}_model_weights.npz"
    return FrozenSAE("sae_mlp", load_sae_weights(path, "sae_mlp"),
                     cfg_l.sae_expansion_factor)

saes = {layer: frozen_sae(layer) for layer in LAYERS}

# 3) circuit passes on the SAME frozen backbone the SAEs trained against
# (Pipeline derives it from cfg.seed: key split -> model key, train/pipeline.py)
from sparse_vision_tpu.models.backbone import init_backbone

net = make_backbone(base.model_name, base.dataset_name)
k_model, _ = jax.random.split(jax.random.key(base.seed))
pipe_params, _ = init_backbone(net, k_model, base.dataset_name)
train_ds, _, _, _ = load_data(base)
batches = []
for i, b in enumerate(train_ds.batches(32, shuffle=False)):
    if i == 2:
        break
    batches.append((jax.numpy.asarray(b.images), jax.numpy.asarray(b.labels)))

eng = CircuitEngine(net, pipe_params, saes, get_criterion("cross_entropy"))
avgs = eng.compute_averages(batches)
node = eng.compute_node_ie(batches, avgs)
for layer in LAYERS:
    print(f"node IE {layer}: shape={tuple(node.features[layer].shape)}")
r = eng.compute_faithfulness(batches, node, FAITHFULNESS_THRESHOLDS[0], averages=avgs)
assert abs(r["faithfulness"] - 1.0) < 1e-3, r
print(f"faithfulness (keep-all threshold) = {r['faithfulness']:.4f}")
print("multilayer circuit example OK")
