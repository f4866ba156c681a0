"""Real-cache lambda frontiers via the vmapped sweep tier (VERDICT r4 #4).

Three rounds of "first lambda wrong on a new distribution" (jumprelu frozen
L0, transcoder lambda=5 effectively dense, crosscoder collapse) happened
because every quality row was a single hand-picked point while the sweep
machinery (train/sweep_vmap.py) had only ever run on synthetic benches. This
script runs vmapped lambda grids OFF THE REAL mixed3a/mixed3b caches for
sae_mlp, jumprelu and the transcoder, then drives the eval-sweep tier
(eval_tools/ranking.py) on the merged REAL rows — Pareto grids + rank table —
and commits the frontier numbers:

  docs/pareto_r5/<variant>_frontier.json      per-combo final rows
  docs/pareto_r5/<variant>_pareto.png         rec-vs-sparsity grid (real data)
  docs/pareto_r5/<variant>_rank_table.csv     eval_tools.ranking on real rows

Grids (lambda only — one cache feeds all combos in ONE jitted step):
  sae_mlp      1, 2, 5, 10, 20, 40        (EF 64, the production shape;
                                           reference's known-good 5 in-band)
  jumprelu     0.005, 0.02, 0.08, 0.3     (std-scaled bandwidth, round-3 row)
  transcoder   5, 15, 40, 100             (mixed3a->mixed3b; round-4's tuned
                                           40 should sit on the frontier)
  transcoder_rms  1, 3, 5, 10             (same pair under sae_input_norm=
                                           "rms": evidence the normalized
                                           basis makes the sae_mlp lambda
                                           recipe transfer across layers)

Run on the chip: PYTHONPATH=/root/repo:$PYTHONPATH python bench_sweep_real.py
Env: SWEEP_ONLY=<substr>  SWEEP_EPOCHS=8  NORTHSTAR_DIR
     (CPU smoke: SWEEP_EF, SWEEP_IMAGES, SWEEP_TPS, SWEEP_BATCH)
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

probe_tpu_or_pin_cpu("bench_sweep_real")
pin_cpu_if_requested()

import jax
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
WORK = os.environ.get("NORTHSTAR_DIR", "/tmp/northstar")
EPOCHS = int(os.environ.get("SWEEP_EPOCHS", "6"))
EF = int(os.environ.get("SWEEP_EF", "64"))
TPS = int(os.environ.get("SWEEP_TPS", "32768"))
BATCH = int(os.environ.get("SWEEP_BATCH", "256"))
N_IMAGES = int(os.environ.get("SWEEP_IMAGES", "4096"))
_IS_SMOKE = bool(os.environ.get("SVT_FORCE_CPU"))
DOCS = (os.path.join(WORK, "docs_smoke", "pareto_r5") if _IS_SMOKE
        else os.path.join(REPO, "docs", "pareto_r5"))
os.makedirs(DOCS, exist_ok=True)

jax.config.update("jax_compilation_cache_dir", os.path.join(WORK, "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

SWEEPS = {
    "sae_mlp": dict(
        grid=(1.0, 2.0, 5.0, 10.0, 20.0, 40.0),
        overrides=dict(sae_model_name="sae_mlp"),
    ),
    "jumprelu": dict(
        grid=(0.005, 0.02, 0.08, 0.3),
        overrides=dict(sae_model_name="jumprelu_sae",
                       jumprelu_bandwidth=1.04,  # = mixed3a act std (round 3)
                       jumprelu_threshold_init=0.52),
    ),
    "transcoder_l1": dict(
        grid=(5.0, 15.0, 40.0, 100.0),
        overrides=dict(sae_model_name="transcoder",
                       transcoder_target_layer="mixed3b"),
    ),
    "transcoder_rms": dict(
        grid=(1.0, 3.0, 5.0, 10.0),
        overrides=dict(sae_model_name="transcoder",
                       transcoder_target_layer="mixed3b",
                       sae_input_norm="rms"),
    ),
}


def run_sweep(name: str, grid: tuple, overrides: dict) -> dict:
    import sparse_vision_tpu.train.pipeline as plmod
    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.eval_tools.ranking import (
        compute_sae_ranking,
        plot_rec_loss_vs_sparsity,
    )
    from sparse_vision_tpu.train.sweep_vmap import train_sae_sweep_cached
    from sparse_vision_tpu.utils.paths import folder_paths

    runs = os.path.join(WORK, f"runs_sweep_{name}")
    cfg = RunConfig(
        model_name="inceptionv1", dataset_name="imagenet", data_dir=WORK,
        directory_path=runs, sae_layer="mixed3a", sae_epochs=EPOCHS,
        sae_learning_rate=1e-3, sae_batch_size=BATCH,
        sae_optimizer_name="constrained_adam", sae_expansion_factor=EF,
        dead_neurons_steps=200, use_activation_cache=True,
        cache_tokens_per_step=TPS, cache_dtype="bfloat16", log_every=200,
        eval_batch_size=min(32, BATCH), **overrides,
    )
    combos = [{"sae_lambda_sparse": l} for l in grid]

    # per-epoch evals of every combo dominate sweep wall time; the frontier
    # needs only each combo's FINAL row
    orig = plmod.Pipeline.eval_modified

    def skipping(self, epoch, store=True, final=False, **kw):
        if not final:
            return None
        return orig(self, epoch, store=store, final=final, **kw)

    plmod.Pipeline.eval_modified = skipping
    # Vmapping every EF-64 combo at once risks the same HBM exhaustion the
    # r5 crosscoder heal sweep hit (run_crosscoder_heal.py) — group combos;
    # the cache is shared, so each extra group costs one compile at most.
    group = int(os.environ.get(
        "SWEEP_GROUP", "2" if jax.default_backend() != "cpu" else "0"))
    group = group or len(combos)
    t0 = time.perf_counter()
    evals = []
    try:
        for i in range(0, len(combos), group):
            evals.extend(train_sae_sweep_cached(cfg, combos[i:i + group]))
    finally:
        plmod.Pipeline.eval_modified = orig
    wall = time.perf_counter() - t0

    latents = {"transcoder": 256 * EF}.get(cfg.sae_model_name, 256 * EF)
    rows = []
    for lam, ev in zip(grid, evals):
        rows.append({
            "lambda": lam,
            "rec_loss": round(float(ev["sae_rec_loss"]), 5),
            "nrmse": round(float(ev["sae_nrmse_loss"]), 5),
            "union_L0": round(float(ev["sparsity"]) * 256, 1),
            "perc_dead": round(float(ev["perc_dead_units"]), 4),
            "var_expl": round(float(ev["var_expl"]), 5),
        })
        print(f"[{name}] lambda={lam}: {json.dumps(rows[-1])}")

    # the eval-sweep tier on the REAL merged rows (reference evaluation.py role)
    folder = folder_paths(cfg)["evaluation_results"]
    csv_path = os.path.join(folder, "sae_eval_results.csv")
    rank_csv = os.path.join(DOCS, f"{name}_rank_table.csv")
    compute_sae_ranking(csv_path, rank_csv)
    pareto = plot_rec_loss_vs_sparsity(
        csv_path, os.path.join(DOCS, f"{name}_pareto.png"),
        title=f"{name} on real mixed3a cache ({EPOCHS} epochs, EF {EF})",
    )
    out = {
        "variant": name, "grid_rows": rows, "epochs": EPOCHS,
        "tokens": int(EPOCHS * N_IMAGES * 784), "wall_s": round(wall, 1),
        "latents": latents, "backend": jax.default_backend(),
        "input_norm": overrides.get("sae_input_norm", "none"),
        "artifacts": {"rank_table": os.path.relpath(rank_csv, REPO),
                      "pareto_png": os.path.relpath(pareto, REPO)},
    }
    with open(os.path.join(DOCS, f"{name}_frontier.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"sweep": name, "wall_s": out["wall_s"],
                      "combos": len(grid)}))
    return out


def main() -> int:
    from bench_northstar import ensure_standin_dataset

    ensure_standin_dataset(WORK, N_IMAGES, max(N_IMAGES // 8, 8))
    only = os.environ.get("SWEEP_ONLY", "")
    for name, spec in SWEEPS.items():
        if only and only not in name:
            continue
        print(f"=== sweep {name} ===")
        run_sweep(name, spec["grid"], spec["overrides"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
