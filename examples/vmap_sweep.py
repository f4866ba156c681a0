"""Vmapped hyperparameter sweep: N SAEs with different (lambda, lr, seed) train
in ONE jitted step off one shared activation cache.

The reference runs a sweep as N independent cluster jobs over parameters.txt
lines (README.md:13-15, main.py:63-113), re-paying data loading, the backbone
forward, and dispatch overhead per job. Here `train/sweep_vmap.py` stacks the
combos on a vmapped leading axis — every artifact (per-combo checkpoints,
results rows, weight exports) is identical to individual runs, so the eval tier
ranks the sweep output exactly as it would rank N separate runs.

    JAX_PLATFORMS=cpu python examples/vmap_sweep.py [workdir]

Runs on synthetic data / CPU in ~2 min.
"""

import sys
import tempfile

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested

pin_cpu_if_requested()  # site-hook quirk: see utils/platform.py

from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.eval_tools.ranking import compute_sae_ranking
from sparse_vision_tpu.train.sweep_vmap import train_sae_sweep_cached

workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="svt_sweep_")

base_cfg = RunConfig(
    model_name="custom_mlp_9", sae_model_name="sae_mlp", sae_layer="fc1",
    dataset_name="synthetic", directory_path=workdir,
    batch_size=64, sae_batch_size=64, sae_epochs=2,
    sae_optimizer_name="constrained_adam", sae_expansion_factor=2,
    dead_neurons_steps=100, cache_tokens_per_step=64,
    original_model=False, training=True, use_activation_cache=True,
    log_every=1000,
)

overrides = [
    {"sae_lambda_sparse": 0.01},
    {"sae_lambda_sparse": 0.1},
    {"sae_lambda_sparse": 0.5, "sae_learning_rate": 3e-3},
    # seed participates too, but run identities exclude it (reference parameter-
    # string parity, utils/paths.py) — so pair it with a distinct lambda
    {"sae_lambda_sparse": 0.05, "seed": 1},
]

results = train_sae_sweep_cached(base_cfg, overrides)
print("\nPer-combo final eval:")
for ov, r in zip(overrides, results):
    print(f"  {ov}: rec={r['sae_rec_loss']:.4f} sparsity={r['sparsity']:.4f} "
          f"kld={r['kld']:.5f}")

# the standard post-hoc ranking consumes the sweep's results rows unchanged
import os

csv_path = os.path.join(
    workdir, "custom_mlp_9", "synthetic", "evaluation_results_sae_mlp",
    "sae_eval_results.csv",
)
if os.path.exists(csv_path):
    ranked = compute_sae_ranking(csv_path)
    print(f"\nRank table ({len(ranked)} rows) written next to {csv_path}")
print("OK")
