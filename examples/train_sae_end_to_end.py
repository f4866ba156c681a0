"""End-to-end example: train a small classifier, splice an SAE into it, evaluate, and
rank a lambda sweep — all on synthetic data so it runs anywhere (CPU included).

    JAX_PLATFORMS=cpu python examples/train_sae_end_to_end.py /tmp/sv_example
"""

import os
import sys

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested

pin_cpu_if_requested()  # site-hook quirk: see utils/platform.py

from sparse_vision_tpu.config import RunConfig, Sweep
from sparse_vision_tpu.eval_tools.ranking import compute_sae_ranking, plot_rec_loss_vs_sparsity
from sparse_vision_tpu.train.pipeline import Pipeline

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sv_example"
base = RunConfig(
    model_name="custom_mlp_9", sae_layer="fc1", dataset_name="synthetic",
    directory_path=out, sae_epochs=2, sae_batch_size=64, batch_size=64,
    dead_neurons_steps=200, log_every=8,
)

# 1) train the original model (mode 1)
Pipeline(RunConfig(**{**base.__dict__, "original_model": True, "training": True,
                      "model_epochs": 2})).run()

# 2) sweep SAE training over lambda (mode 3); the trained backbone is picked up
#    automatically from model_weights/
for cfg in Sweep(axes={"sae_lambda_sparse": [0.1, 1.0]}, base=base):
    Pipeline(cfg).run()

# 3) post-hoc ranking + Pareto plot over the merged results
results_dir = os.path.join(out, "custom_mlp_9", "synthetic", "evaluation_results_sae_mlp")
csv_path = os.path.join(results_dir, "sae_eval_results.csv")
df = compute_sae_ranking(csv_path)
plot_rec_loss_vs_sparsity(csv_path, os.path.join(results_dir, "pareto.png"))
print(df[["lambda_sparse", "rec_loss", "rel_sparsity", "final_ranking"]].to_string())
print(f"\nArtifacts in {results_dir}")
