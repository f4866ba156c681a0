"""Train an SAE, export it as a self-contained AOT serving artifact, and serve it.

The deployment flow the reference doesn't have (its evaluation always re-imports
model code in-process): one CLI invocation trains and exports, then a "serving
host" — which needs only jax and the artifact directory, no framework model
code — loads the StableHLO module and answers batched feature requests with
bucket padding and cross-request micro-batching.

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python examples/serving.py /tmp/serving_demo
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from sparse_vision_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()

from sparse_vision_tpu.cli import main as cli_main
from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.serve.engine import ServingEngine


def main(out_root: str) -> None:
    cfg = RunConfig(
        model_name="custom_mlp_9", sae_layer="fc1", dataset_name="synthetic",
        directory_path=os.path.join(out_root, "runs"), sae_epochs=1,
        sae_batch_size=64, batch_size=64, sae_expansion_factor=2,
        dead_neurons_steps=100, wandb_status=False, log_every=1000, sae_topk=4,
    )
    art_dir = os.path.join(out_root, "artifact")

    # 1. train + export in one CLI invocation
    rc = cli_main(["--run_pipeline", "--config", cfg.to_json(),
                   "--export_serving", art_dir])
    assert rc == 0

    # 2. the serving host: artifact dir in, feature responses out
    eng = ServingEngine(art_dir, max_batch=8)
    eng.warmup()  # compile every bucket before taking traffic
    imgs = np.random.default_rng(0).normal(size=(5, 28, 28, 1)).astype(np.float32)
    out = eng.predict(imgs)
    print(f"served batch: logits {out['logits'].shape}, "
          f"top features/sample {out['top_indices'][0].tolist()}")

    # 3. micro-batching: concurrent single-image requests coalesce into one
    #    device dispatch
    eng.start()
    try:
        futs = [eng.submit(img) for img in imgs]
        singles = [f.result(timeout=60) for f in futs]
    finally:
        eng.stop()
    assert all(
        np.allclose(s["logits"], out["logits"][i], rtol=1e-5, atol=1e-5)
        for i, s in enumerate(singles)
    )
    print(f"artifact meta: kind={eng.meta['kind']}, batch={eng.meta['batch']}, "
          f"platforms={eng.meta['platforms']}")

    # 4. feature steering: export a steering_service artifact from the SAME
    #    trained run (sae_checkpoint_epoch restores the trained weights), then
    #    clamp the strongest latent to zero and boost it 3x — all from one
    #    artifact, no re-export per intervention
    import dataclasses

    steer_dir = os.path.join(out_root, "steering_artifact")
    cfg_restore = dataclasses.replace(cfg, sae_checkpoint_epoch=1)
    rc = cli_main(["--export_serving", steer_dir,
                   "--export_kind", "steering_service",
                   "--config", cfg_restore.to_json()])
    assert rc == 0
    steer = ServingEngine(steer_dir, max_batch=8)
    base = steer.predict(imgs)  # default extras = identity (no-op steering)
    assert np.allclose(base["logits_steered"], base["logits_original"],
                       rtol=1e-5, atol=1e-5)
    h = steer.meta["extra_inputs"][0]["shape"][0]
    top_unit = int(np.argmax(base["latents_mean"].mean(0)))
    scale = np.ones((h,), np.float32)
    scale[top_unit] = 3.0  # boost
    steer.set_extras(scale, np.zeros((h,), np.float32))
    boosted = steer.predict(imgs)
    drift = float(np.abs(boosted["logits_steered"]
                         - base["logits_original"]).max())
    print(f"steering: boosting latent {top_unit} 3x moves logits by "
          f"max {drift:.4f}")
    assert drift > 0
    print("serving example OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/serving_demo")
