"""Train an SAE on a CLIP vision tower's residual stream, then measure how much
class signal few latents carry with the sparse-probing tier.

Two beyond-reference capabilities composed: the CLIP backbone family
(models/vit.py make_clip_vision — the standard modern vision-SAE target) and
the SAEBench-style probing evaluation (eval_tools/probing.py): per class, a
1-vs-all logistic probe on the k highest-mean-difference latents, scored as
held-out AUC against probes on the raw channels of the same layer.

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python examples/probe_clip_sae.py /tmp/probe_demo
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from sparse_vision_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()

from sparse_vision_tpu.cli import main as cli_main
from sparse_vision_tpu.config import RunConfig


def main(out_root: str) -> None:
    cfg = RunConfig(
        model_name="clip_vit_test", sae_layer="block0", dataset_name="synthetic",
        directory_path=os.path.join(out_root, "runs"), sae_epochs=1,
        sae_batch_size=32, batch_size=32, sae_expansion_factor=2,
        dead_neurons_steps=100, wandb_status=False, log_every=1000,
    )
    # train + probe in one CLI invocation (k-sparse AND dense probes, both the
    # SAE-latent side and the raw block0-channel baseline)
    rc = cli_main(["--run_pipeline", "--config", cfg.to_json(),
                   "--sparse_probing", "1,4"])
    assert rc == 0

    import dataclasses
    import json

    from sparse_vision_tpu.utils.paths import folder_paths, run_id

    probed = dataclasses.replace(cfg, sae_checkpoint_epoch=cfg.sae_epochs)
    paths = folder_paths(probed)
    summary_path = os.path.join(
        paths["evaluation_results"], "probing",
        f"{run_id(probed)}_probing_epoch_{cfg.sae_epochs}.json",
    )
    with open(summary_path) as f:
        summary = json.load(f)
    for side in ("sae", "original"):
        for key, ent in summary[side].items():
            assert np.isfinite(ent["mean_auc"]), (side, key, summary)
            print(f"{side:9s} {key:6s} mean AUC {ent['mean_auc']:.4f}")
    # the synthetic blobs are linearly separable: dense raw-channel probes are
    # near-perfect, and the SAE's few-latent probes clear chance decisively
    assert summary["original"]["dense"]["mean_auc"] > 0.9
    assert summary["sae"]["k4"]["mean_auc"] > 0.6
    print("probe CLIP SAE example OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_clip_sae_demo")
