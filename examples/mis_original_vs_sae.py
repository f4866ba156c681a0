"""MIS control experiment: score the ORIGINAL model's channels, then an SAE's
latents on the same layer, and compare — the thesis' headline MIS comparison
(reference: original-mixed3a anchors 0.834/0.804 vs SAE ~0.85-0.87,
supplementary_files_2/visualize_mis.py:24-44; the original-model path reuses the
sae_layer parameter, specify_parameters.py:245-247).

    JAX_PLATFORMS=cpu python examples/mis_original_vs_sae.py [workdir]

Runs on synthetic data / CPU in ~2 min. Flow per side: train -> mis="1" collection
epoch (per-unit top/bottom-200 sample indices on TRAIN data) -> mis="2" scoring
(2-AFC tasks, backbone-embedding cosine similarity).
"""

import sys
import tempfile

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested

pin_cpu_if_requested()  # site-hook quirk: see utils/platform.py

from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.train.pipeline import Pipeline

workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="svt_mis_")

base = dict(
    model_name="custom_mlp_9", sae_layer="fc1", dataset_name="synthetic",
    directory_path=workdir, batch_size=64, sae_batch_size=64,
    dead_neurons_steps=100, log_every=1000,
)

# --- original model: train once, collect, score -------------------------------
Pipeline(RunConfig(**base, original_model=True, training=True, model_epochs=1)).run()
Pipeline(RunConfig(**base, original_model=True, training=False, mis="1")).run()
orig = Pipeline(RunConfig(**base, original_model=True, training=False, mis="2")).run()

# --- SAE on the same layer: train, collect, score -----------------------------
Pipeline(RunConfig(**base, sae_epochs=1)).run()
Pipeline(RunConfig(**base, training=False, mis="1", sae_checkpoint_epoch=1)).run()
sae = Pipeline(RunConfig(**base, training=False, mis="2", sae_checkpoint_epoch=1)).run()

print(
    f"median MIS — original fc1 channels: {orig['median_mis']:.3f} "
    f"({len(orig['per_unit'])} units) | SAE latents: {sae['median_mis']:.3f} "
    f"({len(sae['per_unit'])} units)"
)
print("MIS comparison example OK")
