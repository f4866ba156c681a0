"""Root-cause instrumentation for the batch_topk dead fraction (VERDICT r4 #2).

Round-4 fact: on the same mixed3a cache and token budget, per-token topk ends
7.1% dead while batch_topk (+AuxK) ends 75.7% — and the committed explanation
("stand-in diversity ceiling") was contradicted by topk's own number. Round-5
hypothesis, found in code: AuxK's dead mask was "never fired since step 0"
(the accumulator only reset inside the resample branch), so the revival loss
could only target the shrinking never-fired set while latents that fired early
under the spread-out random init and then lost the global cutoff race were
invisible to it. Fixed in train/steps.py (rolling dead window).

This script produces the MEASURED evidence: it trains batch_topk+AuxK on the
real mixed3a cache and snapshots, every DIAG_EVERY steps, on a fixed probe
block:

  - n_window_dead: |ts.dead_acc| — what AuxK now targets (rolling window)
  - n_never_fired_probe: latents that never crossed the training-selection
    cutoff on the probe block in ANY snapshot so far — a proxy for the OLD
    (since-step-0) definition AuxK used to target
  - n_fired_now: latents selected on the probe block at the CURRENT params
  - top1pct_share: fraction of probe selections taken by the top 1% of
    latents (the batch-level winner-take-all concentration measure)
  - aux_loss, threshold (EMA) vs calibrated cutoff

The divergence n_window_dead >> n_never_fired_probe over training IS the
mechanism: the old mask starved AuxK of its targets. The healed quality row
(same 8-epoch protocol as round 4) comes from bench_convergence_variants
CONV_ONLY=batch_topk re-run with the fix; this script commits the trajectory
to docs/batch_topk_diag_r5.json.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python diag_batch_topk.py
Env: DIAG_EPOCHS=2 DIAG_EVERY=50 DIAG_EF=64 DIAG_IMAGES=4096 NORTHSTAR_DIR
"""

from __future__ import annotations

import json
import os
import sys
import time

import os as _os
import sys as _sys

if _os.path.exists("/tmp/r5_stop") and not _os.environ.get("R5_STOP_IGNORE"):
    # session-end sentinel: skip cleanly so the queue never kills a chip
    # process mid-compile (tunnel-wedge prevention)
    print("r5 stop sentinel present -- skipping this step")
    _sys.exit(0)
# once admitted, subprocess children of this step must run even if the
# sentinel appears mid-step (it gates at STEP granularity; a child that
# honors it mid-run crashes the parent's row parsing -- measured r5)
_os.environ["R5_STOP_IGNORE"] = "1"

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested, probe_tpu_or_pin_cpu

probe_tpu_or_pin_cpu("diag_batch_topk")
pin_cpu_if_requested()

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
WORK = os.environ.get("NORTHSTAR_DIR", "/tmp/northstar")
RUNS = os.path.join(WORK, "runs_diag_btk")
EPOCHS = int(os.environ.get("DIAG_EPOCHS", "2"))
EVERY = int(os.environ.get("DIAG_EVERY", "50"))
EF = int(os.environ.get("DIAG_EF", "64"))
N_IMAGES = int(os.environ.get("DIAG_IMAGES", "4096"))
TPS = int(os.environ.get("DIAG_TPS", "32768"))
BATCH = int(os.environ.get("DIAG_BATCH", "256"))
K = 32
AUX_K = 512
PROBE_T = int(os.environ.get("DIAG_PROBE_T", "8192"))
_IS_SMOKE = bool(os.environ.get("SVT_FORCE_CPU"))
DOCS = os.path.join(WORK, "docs_smoke") if _IS_SMOKE else os.path.join(REPO, "docs")
os.makedirs(DOCS, exist_ok=True)

jax.config.update("jax_compilation_cache_dir", os.path.join(WORK, "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main() -> int:
    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.data.activation_cache import ActivationCache, dump_activations
    from sparse_vision_tpu.models.sae import calibrate_batch_topk_threshold
    from sparse_vision_tpu.train.pipeline import Pipeline
    from sparse_vision_tpu.train.steps import make_sae_train_step_from_acts

    from bench_northstar import ensure_standin_dataset

    ensure_standin_dataset(WORK, N_IMAGES, max(N_IMAGES // 8, 8))
    cfg = RunConfig(
        model_name="inceptionv1", dataset_name="imagenet", data_dir=WORK,
        directory_path=RUNS, sae_model_name="batch_topk_sae",
        sae_layer="mixed3a", sae_lambda_sparse=0.0, sae_topk=K,
        sae_expansion_factor=EF, sae_optimizer_name="constrained_adam",
        sae_aux_k=AUX_K, sae_epochs=EPOCHS, sae_batch_size=BATCH,
        dead_neurons_steps=200, use_activation_cache=True,
        cache_tokens_per_step=TPS, cache_dtype="bfloat16", log_every=1000,
        eval_batch_size=min(32, BATCH),
    )
    pipe = Pipeline(cfg)
    cache_dir = pipe._cache_dir(cfg.sae_layer)
    if not os.path.exists(os.path.join(cache_dir, "meta.json")):
        print(f"Building activation cache at {cache_dir} ...")
        dump_activations(
            pipe.net, pipe.frozen_params, pipe.net_state, pipe.train_ds,
            cfg.sae_layer, cache_dir, shuffle_images=True,
            **pipe._cache_dump_kwargs(),
        )
    cache = ActivationCache(cache_dir)

    h = pipe.num_units
    step_fn = make_sae_train_step_from_acts(
        cfg.sae_model_name, 0.0, pipe.tx, cfg.dead_neurons_steps, EF,
        fused=jax.default_backend() != "cpu", topk=K,
        aux_k=AUX_K, aux_alpha=cfg.sae_aux_alpha,
    )

    # fixed probe block: one shuffled cached batch, reused at every snapshot
    probe = next(iter(cache.batches(PROBE_T, shuffle=True, seed=4242,
                                    prefetch=False)))
    probe = jnp.asarray(np.asarray(probe, np.float32))

    @jax.jit
    def probe_stats(params):
        # training-semantics selection on the probe block: the T*k-th largest
        # pre-activation is the cutoff; count per-latent selections above it
        pre = (probe - params["b_dec"]) @ params["W_enc"] + params["b_enc"]
        from sparse_vision_tpu.ops.fast_batch_topk import kth_largest

        cutoff = kth_largest(pre.reshape(-1).astype(jnp.float32),
                             probe.shape[0] * K)
        sel = (pre >= cutoff) & (pre > 0)
        counts = jnp.sum(sel, axis=0)  # [h]
        fired = counts > 0
        total = jnp.maximum(jnp.sum(counts), 1)
        top1 = int(max(h // 100, 1))
        top_share = jnp.sum(jax.lax.top_k(counts, top1)[0]) / total
        return fired, counts, jnp.maximum(cutoff, 0.0), top_share

    traj = []
    ever_fired = np.zeros((h,), bool)
    t0 = time.perf_counter()
    step_count = 0
    for epoch in range(EPOCHS):
        for tok in cache.batches(TPS, shuffle=True, seed=cfg.seed + epoch,
                                 prefetch=True):
            act = jnp.asarray(np.asarray(tok, np.float32))
            pipe.ts, m = step_fn(pipe.ts, act)
            step_count += 1
            if step_count % EVERY == 0 or step_count == 1:
                fired, counts, cutoff, top_share = jax.device_get(
                    probe_stats(pipe.ts.params))
                ever_fired |= np.asarray(fired)
                snap = {
                    "step": step_count,
                    "tokens": step_count * TPS,
                    "n_window_dead": int(np.sum(np.asarray(
                        jax.device_get(pipe.ts.dead_acc)))),
                    "n_never_fired_probe": int(h - ever_fired.sum()),
                    "n_fired_now": int(np.asarray(fired).sum()),
                    "top1pct_share": round(float(top_share), 4),
                    "aux_loss": round(float(jax.device_get(
                        m.get("sae_aux_loss", 0.0))), 5),
                    "rec_loss": round(float(jax.device_get(m["sae_rec_loss"])), 5),
                    "threshold_ema": round(float(jax.device_get(
                        pipe.ts.params["threshold"])), 5),
                    "cutoff_probe": round(float(cutoff), 5),
                }
                traj.append(snap)
                print(json.dumps(snap))
    wall = time.perf_counter() - t0

    thr = calibrate_batch_topk_threshold(pipe.ts.params, probe, K)
    out = {
        "config": {"epochs": EPOCHS, "latents": h, "batch_k": K,
                   "aux_k": AUX_K, "aux_alpha": cfg.sae_aux_alpha,
                   "dead_neurons_steps": cfg.dead_neurons_steps,
                   "tokens_per_step": TPS, "probe_tokens": PROBE_T},
        "backend": jax.default_backend(),
        "wall_s": round(wall, 1),
        "trajectory": traj,
        "final_calibrated_threshold": round(float(jax.device_get(thr)), 5),
        "mechanism_summary": {
            # the old AuxK mask ~ never-fired-since-start; the new one is the
            # rolling window. Their gap is the population the old mask missed.
            "final_n_window_dead": traj[-1]["n_window_dead"],
            "final_n_never_fired_probe": traj[-1]["n_never_fired_probe"],
            "old_mask_missed": traj[-1]["n_window_dead"]
            - traj[-1]["n_never_fired_probe"],
        },
    }
    path = os.path.join(DOCS, "batch_topk_diag_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"diag": "batch_topk", "wall_s": out["wall_s"],
                      **out["mechanism_summary"]}))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
