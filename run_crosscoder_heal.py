"""Heal the crosscoder tier: lambda frontier -> full retrain -> diffing readout.

VERDICT r4 #1: the only crosscoder quality row was a lambda=5 collapse and the
decoder-norm diffing readout had never produced a meaningful CSV. Root cause
(round 5, measured): the mixed4a..4e tap RMS spans ~120x (mixed4a 0.138 ->
mixed4e 0.0011 on the stand-in backbone), so one lambda cannot price sparsity
against the summed per-layer MSE — fixed by ``sae_input_norm="rms"``
(per-layer token-RMS normalization, config.py). This script produces the
committed evidence on FRESH caches (the scratch caches surviving from the
interrupted round-4 session were found at scale ~8e3, inconsistent with the
backbone's true tap scale — they were deleted, every number here is from a
re-validated dump):

  A. lambda sweep: train_crosscoder_sweep_cached over HEAL_GRID (vmapped — one
     data stream feeds all combos) at HEAL_SWEEP_EPOCHS; rows ->
     docs/crosscoder_lambda_sweep_r5.json
  B. full retrain at the first healthy lambda (union L0 in a sane band,
     dead% < 50%, then min rec) for HEAL_FULL_EPOCHS (~25M tokens), chunked
     into resumable subprocesses (the axon client leaks ~3GB host RSS per
     crosscoder epoch — CLAUDE.md); row -> docs/convergence_variants_v5e.json
  C. diffing readout: summarize the run's decoder-norm CSV (shared vs
     layer-specific feature counts among alive latents, per-layer norm-share
     distributions) -> docs/crosscoder_diffing_r5.json

Run on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python run_crosscoder_heal.py
Env: HEAL_GRID="0.5,2,5,15,50"  HEAL_SWEEP_EPOCHS=6  HEAL_FULL_EPOCHS=32
     HEAL_CHUNK_EPOCHS (default 6 on the chip)  HEAL_SKIP_SWEEP=<lambda>
     NORTHSTAR_DIR  (CPU smoke: HEAL_EF, HEAL_IMAGES, HEAL_TPS)
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
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

if not (os.environ.get("HEAL_CHILD") or os.environ.get("HEAL_SWEEP_CHILD")):
    probe_tpu_or_pin_cpu("run_crosscoder_heal")
pin_cpu_if_requested()

import jax
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
WORK = os.environ.get("NORTHSTAR_DIR", "/tmp/northstar")
RUNS = os.path.join(WORK, "runs_cc_r5")
GRID = [float(x) for x in os.environ.get("HEAL_GRID", "0.2,0.5,1.5,5,15").split(",")]
SWEEP_EPOCHS = int(os.environ.get("HEAL_SWEEP_EPOCHS", "6"))
# 12 epochs = 9.6M tokens: under half the r4 conv-row budget, chosen to fit
# the round-5 chip window (r5 measured ~4 min per cat-space epoch-stream;
# the collapse-vs-healthy contrast shows up within the first epochs)
FULL_EPOCHS = int(os.environ.get("HEAL_FULL_EPOCHS", "12"))
EF = int(os.environ.get("HEAL_EF", "16"))
TPS = int(os.environ.get("HEAL_TPS", "16384"))
N_IMAGES = int(os.environ.get("HEAL_IMAGES", "4096"))
# CPU smoke runs must not pollute the committed chip-evidence files
_IS_SMOKE = bool(os.environ.get("SVT_FORCE_CPU")) and not os.environ.get(
    "HEAL_ALLOW_CPU_ROWS")
DOCS = os.path.join(WORK, "docs_smoke") if _IS_SMOKE else os.path.join(REPO, "docs")
os.makedirs(DOCS, exist_ok=True)

jax.config.update("jax_compilation_cache_dir", os.path.join(WORK, "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def base_cfg(epochs: int, lam: float):
    from sparse_vision_tpu.config import RunConfig

    return RunConfig(
        model_name="inceptionv1", dataset_name="imagenet", data_dir=WORK,
        directory_path=RUNS, sae_model_name="crosscoder", sae_layer="mixed4a",
        crosscoder_layers="mixed4b,mixed4c,mixed4d,mixed4e",
        sae_optimizer_name="adam",  # constrained_adam rejected by design
        sae_lambda_sparse=lam, sae_expansion_factor=EF, sae_epochs=epochs,
        sae_learning_rate=1e-3,
        sae_batch_size=int(os.environ.get("HEAL_BATCH", "256")),
        dead_neurons_steps=int(os.environ.get("HEAL_DNS", "200")),
        use_activation_cache=True, cache_tokens_per_step=TPS,
        cache_dtype="bfloat16", log_every=25,
        eval_batch_size=min(32, int(os.environ.get("HEAL_BATCH", "256"))),
        sae_input_norm="rms",
    )


def _patch_eval_final_only(plmod):
    """Per-epoch evals are compile+backbone-forward heavy; the sweep needs only
    each combo's FINAL row. Non-final evals return None (the runners only read
    the final epoch's result)."""
    orig = plmod.Pipeline.eval_modified

    def skipping(self, epoch, store=True, final=False, **kw):
        if not final:
            return None
        return orig(self, epoch, store=store, final=final, **kw)

    plmod.Pipeline.eval_modified = skipping
    return orig


def union_l0(ev: dict, d: int = 512) -> float:
    # eval 'sparsity' is active/(units/EF) per image (reference conv semantics,
    # docs/CONVERGENCE.md) -> absolute union count = sparsity * d
    return float(ev["sparsity"]) * d


def row_from_eval(ev: dict, lam: float, epochs: int, wall_s: float,
                  note: str) -> dict:
    return {
        "variant": "crosscoder", "lambda": lam,
        "tokens": int(epochs * N_IMAGES * 196),
        "wall_s": round(wall_s, 1),
        "rec_loss": round(float(ev["sae_rec_loss"]), 5),
        "sparsity_L0": round(union_l0(ev), 1),
        "perc_dead": round(float(ev["perc_dead_units"]), 4),
        "epochs": epochs, "latents": 512 * EF,
        "backend": jax.default_backend(),
        "input_norm": "rms",
        "note": note,
    }


def _sweep_child(lo: int, hi: int) -> None:
    """Train GRID[lo:hi] vmapped and print their final eval rows as JSON.
    Runs in its own subprocess: one full sweep group leaked ~45 GB host RSS
    (the axon transfer-payload leak), so three groups in one process OOM the
    125 GB host — per-group children bound the leak like phase B's chunks."""
    import sparse_vision_tpu.train.pipeline as plmod
    from sparse_vision_tpu.train.sweep_vmap import train_crosscoder_sweep_cached

    from bench_northstar import ensure_standin_dataset

    ensure_standin_dataset(WORK, N_IMAGES, max(N_IMAGES // 8, 8))
    base = base_cfg(SWEEP_EPOCHS, GRID[0])
    overrides = [{"sae_lambda_sparse": l} for l in GRID[lo:hi]]
    orig = _patch_eval_final_only(plmod)
    try:
        evals = train_crosscoder_sweep_cached(base, overrides)
    finally:
        plmod.Pipeline.eval_modified = orig
    for lam, ev in zip(GRID[lo:hi], evals):
        print(json.dumps({"sweep_lambda": lam, "eval": {
            k: float(ev[k])
            for k in ("sae_rec_loss", "sparsity", "perc_dead_units", "var_expl")
        }}))


def phase_a_sweep() -> float:
    # Five 8,192-latent crosscoders vmapped at once RESOURCE_EXHAUSTED the
    # v5e's HBM (measured r5: params+adam ~570MB/combo but the [tps, h]
    # code transients dominate) — sweep in groups, one bounded SUBPROCESS per
    # group (HBM: small vmap width; host RSS: fresh client per group); the
    # caches are shared so each group costs at most one compile.
    group = int(os.environ.get(
        "HEAL_SWEEP_GROUP", "2" if jax.default_backend() != "cpu" else "0"))
    group = group or len(GRID)
    partial_path = os.path.join(DOCS, "_heal_sweep.rows.json")
    done_rows: dict = {}
    if os.path.exists(partial_path):
        with open(partial_path) as f:
            done_rows = json.load(f)
    t0 = time.perf_counter()
    for i in range(0, len(GRID), group):
        lams = GRID[i:i + group]
        if all(str(l) in done_rows for l in lams):
            print(f"sweep group {lams}: rows present — skipping")
            continue
        env = dict(os.environ, HEAL_SWEEP_CHILD=f"{i}:{i + group}",
                   HEAL_PHASE="sweep")
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           capture_output=True, text=True, env=env)
        sys.stdout.write(r.stdout[-1500:])
        sys.stdout.flush()
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            raise RuntimeError(f"sweep group {lams} rc={r.returncode}")
        for ln in r.stdout.splitlines():
            if ln.startswith("{") and '"sweep_lambda"' in ln:
                rec = json.loads(ln)
                done_rows[str(rec["sweep_lambda"])] = rec["eval"]
        with open(partial_path, "w") as f:
            json.dump(done_rows, f, indent=1)
    wall = time.perf_counter() - t0
    rows = []
    for lam in GRID:
        ev = done_rows[str(lam)]
        r = {"lambda": lam, "rec_loss": round(float(ev["sae_rec_loss"]), 5),
             "union_L0": round(union_l0(ev), 1),
             "perc_dead": round(float(ev["perc_dead_units"]), 4),
             "var_expl": round(float(ev["var_expl"]), 5)}
        rows.append(r)
        print("sweep row:", json.dumps(r))
    healthy = [r for r in rows if r["union_L0"] >= 8 and r["union_L0"] <= 4000
               and r["perc_dead"] < 0.5]
    if not healthy:
        # fall back: the non-collapsed point closest to a 100-unit union
        alive = [r for r in rows if r["union_L0"] > 0] or rows
        healthy = sorted(alive, key=lambda r: abs(np.log10(max(r["union_L0"], 1e-3) / 100.0)))[:1]
    best = min(healthy, key=lambda r: r["rec_loss"])
    out = {"grid": rows, "epochs": SWEEP_EPOCHS,
           "tokens": int(SWEEP_EPOCHS * N_IMAGES * 196), "wall_s": round(wall, 1),
           "backend": jax.default_backend(), "expansion_factor": EF,
           "input_norm": "rms", "best_lambda": float(best["lambda"]),
           "note": "vmapped crosscoder lambda frontier on fresh rms-normalized "
                   "mixed4a..4e caches (run_crosscoder_heal.py phase A)"}
    with open(os.path.join(DOCS, "crosscoder_lambda_sweep_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"phase A: best lambda = {best['lambda']} "
          f"(rec {best['rec_loss']}, union L0 {best['union_L0']}, "
          f"dead {best['perc_dead']})")
    return float(best["lambda"])


def phase_b_full(lam: float) -> dict:
    chunk = int(os.environ.get(
        "HEAL_CHUNK_EPOCHS", "6" if jax.default_backend() != "cpu" else "0"))
    start = int(os.environ.get("HEAL_START", "0"))
    if chunk and FULL_EPOCHS - start > chunk and not os.environ.get("HEAL_CHILD"):
        wall, row = 0.0, None
        while start < FULL_EPOCHS:
            end = min(start + chunk, FULL_EPOCHS)
            env = dict(os.environ, HEAL_CHILD="1", HEAL_PHASE="full",
                       HEAL_LAMBDA=str(lam), HEAL_START=str(start),
                       HEAL_FULL_EPOCHS=str(end))
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               capture_output=True, text=True, env=env)
            sys.stdout.write(r.stdout[-1200:])
            sys.stdout.flush()
            if r.returncode != 0:
                sys.stderr.write(r.stderr[-2000:])
                raise RuntimeError(f"full-run chunk [{start},{end}) rc={r.returncode}")
            last = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("{") and '"variant"' in ln][-1]
            row = json.loads(last)
            wall += row["wall_s"]
            start = end
        row["wall_s"] = round(wall, 1)
        row["chunk_epochs"] = chunk
        with open(os.path.join(DOCS, "convergence_variants_v5e.json"), "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row))
        return row

    # ---- single process (a chunk child, or CPU smoke) ----
    import sparse_vision_tpu.train.pipeline as plmod

    end_epochs = FULL_EPOCHS
    cfg = base_cfg(end_epochs, lam)
    if start:
        cfg = dataclasses.replace(cfg, sae_checkpoint_epoch=start)
    orig = _patch_eval_final_only(plmod)
    try:
        pipe = plmod.Pipeline(cfg)
        t0 = time.perf_counter()
        result = pipe.run()
        wall = time.perf_counter() - t0
    finally:
        plmod.Pipeline.eval_modified = orig
    note = ("mixed4a..4e shared code on FRESH rms-normalized caches "
            "(run_crosscoder_heal.py; round-4 collapse root-caused to the "
            "~120x per-layer scale spread, fixed by sae_input_norm='rms')")
    if result is None:  # non-final chunk: evals skipped by design
        result = {"sae_rec_loss": float("nan"), "sparsity": float("nan"),
                  "perc_dead_units": float("nan")}
    row = row_from_eval(result, lam, end_epochs, wall, note)
    if os.environ.get("HEAL_CHILD"):
        print(json.dumps(row))
        return row
    with open(os.path.join(DOCS, "convergence_variants_v5e.json"), "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    return row


def phase_c_diffing(lam: float) -> dict:
    """Summarize the decoder-norm CSV train_crosscoder_cached wrote."""
    import glob

    import pandas as pd

    from sparse_vision_tpu.utils.paths import folder_paths

    paths = folder_paths(base_cfg(FULL_EPOCHS, lam))
    csvs = glob.glob(os.path.join(paths["sae_weights"], "*_decoder_norms.csv"))
    if not csvs:
        raise FileNotFoundError(f"no decoder-norm CSV under {paths['sae_weights']}")
    csv_path = max(csvs, key=os.path.getmtime)
    df = pd.read_csv(csv_path)
    layers = [c[len("norm_"):] for c in df.columns if c.startswith("norm_")]
    norms = df[[f"norm_{l}" for l in layers]].to_numpy()  # [h, L]
    total = norms.sum(axis=1)
    alive = total > 1e-3 * float(np.median(total[total > 0]) or 1.0)
    shares = norms[alive] / np.maximum(total[alive][:, None], 1e-12)
    max_share = shares.max(axis=1)
    argmax = shares.argmax(axis=1)
    summary = {
        "csv": os.path.relpath(csv_path, WORK),
        "lambda": lam, "input_norm": "rms",
        "n_latents": int(norms.shape[0]),
        "n_alive": int(alive.sum()),
        "layers": layers,
        # Lindsey et al. diffing buckets: flat profile = shared feature,
        # concentrated = layer-specific
        "n_shared_maxshare_lt_0.4": int((max_share < 0.4).sum()),
        "n_specific_maxshare_gt_0.6": int((max_share > 0.6).sum()),
        "specific_per_layer": {
            l: int(((max_share > 0.6) & (argmax == i)).sum())
            for i, l in enumerate(layers)
        },
        "mean_share_per_layer": {
            l: round(float(shares[:, i].mean()), 4) for i, l in enumerate(layers)
        },
        "max_share_quantiles": {
            q: round(float(np.quantile(max_share, q)), 4)
            for q in (0.1, 0.25, 0.5, 0.75, 0.9)
        },
    }
    with open(os.path.join(DOCS, "crosscoder_diffing_r5.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("diffing summary:", json.dumps(summary))
    return summary


def phase_d_control(target_l0: float) -> dict:
    """Dead-fraction A/B control: SINGLE-layer sae_mlp at the same latent
    count (512*EF, the crosscoder anchor), same rms basis, same token budget,
    on the mixed4a cache — a small vmapped lambda grid so one row can be
    compared to the crosscoder AT MATCHED union L0. The r4 batch_topk lesson
    (VERDICT r4 #2): a "stand-in data diversity" explanation for a dead
    fraction is vacuous without a same-cache control. If the matched-L0
    control lands near the crosscoder's dead%, the fraction is a property of
    the deep-layer stand-in distribution; far below -> the crosscoder
    objective's own concentration."""
    import sparse_vision_tpu.train.pipeline as plmod
    from sparse_vision_tpu.train.sweep_vmap import train_sae_sweep_cached

    grid = [float(x) for x in os.environ.get(
        "HEAL_CONTROL_GRID", "1,5,15").split(",")]
    cfg = dataclasses.replace(
        base_cfg(SWEEP_EPOCHS, grid[0]),
        sae_model_name="sae_mlp", crosscoder_layers="",
        sae_optimizer_name="constrained_adam",
    )
    overrides = [{"sae_lambda_sparse": l} for l in grid]
    orig = _patch_eval_final_only(plmod)
    t0 = time.perf_counter()
    evals = []
    try:
        group = 2 if jax.default_backend() != "cpu" else len(overrides)
        for i in range(0, len(overrides), group):
            evals.extend(train_sae_sweep_cached(cfg, overrides[i:i + group]))
    finally:
        plmod.Pipeline.eval_modified = orig
    rows = [{
        "lambda": lam,
        "rec_loss": round(float(ev["sae_rec_loss"]), 5),
        "union_L0": round(union_l0(ev), 1),
        "perc_dead": round(float(ev["perc_dead_units"]), 4),
        "var_expl": round(float(ev["var_expl"]), 5),
    } for lam, ev in zip(grid, evals)]
    matched = min(rows, key=lambda r: abs(np.log10(max(r["union_L0"], 1e-3)
                                                   / max(target_l0, 1e-3))))
    out = {
        "variant": "sae_mlp_mixed4a_control", "grid_rows": rows,
        "latents": 512 * EF, "epochs": SWEEP_EPOCHS,
        "tokens": int(SWEEP_EPOCHS * N_IMAGES * 196),
        "crosscoder_union_L0": target_l0,
        "matched_row": matched,
        "wall_s": round(time.perf_counter() - t0, 1),
        "backend": jax.default_backend(), "input_norm": "rms",
        "note": "single-layer dead-fraction control for the crosscoder row "
                "(same anchor latent count / budget / rms basis; compare "
                "matched_row at the crosscoder's union L0)",
    }
    with open(os.path.join(DOCS, "crosscoder_control_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("control:", json.dumps(out))
    return out


def main() -> int:
    phase = os.environ.get("HEAL_PHASE", "all")
    if os.environ.get("HEAL_SWEEP_CHILD"):
        lo, hi = (int(x) for x in os.environ["HEAL_SWEEP_CHILD"].split(":"))
        _sweep_child(lo, hi)
        return 0
    if phase == "full" and os.environ.get("HEAL_CHILD"):
        phase_b_full(float(os.environ["HEAL_LAMBDA"]))
        return 0
    lam = None
    if os.environ.get("HEAL_SKIP_SWEEP"):
        lam = float(os.environ["HEAL_SKIP_SWEEP"])
    elif phase == "full":
        # queue split: the sweep step ran earlier and recorded its pick; if it
        # failed (e.g. the r5 HBM exhaustion before grouping), run it here
        try:
            with open(os.path.join(DOCS, "crosscoder_lambda_sweep_r5.json")) as f:
                lam = float(json.load(f)["best_lambda"])
            print(f"phase B resuming with best lambda from sweep: {lam}")
        except FileNotFoundError:
            print("phase B: no sweep artifact — running phase A first")
    if lam is None:
        lam = phase_a_sweep()
    if phase == "sweep":
        return 0
    row_b = phase_b_full(lam)
    phase_c_diffing(lam)
    phase_d_control(float(row_b.get("sparsity_L0") or 100.0))
    return 0


if __name__ == "__main__":
    sys.exit(main())
