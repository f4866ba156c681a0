"""Flagship artifact run: one config, one trained checkpoint, EVERY artifact.

VERDICT r4 #3/#5/#6 in one chain. Subject: the north-star mixed3a SAE
(inceptionv1, EF 64 -> 16,384 latents, lambda=5, ~50M tokens — the checkpoint
docs/NORTHSTAR.md reports at rec 0.0061 / L0~32). Against it, the full
thesis-equivalent output of this framework, each phase writing committed
artifacts under docs/flagship/:

  registry   per-layer circuit SAEs at the reference's known-good
             hyperparameters (interp/registry.py; one multi-layer dump)
  northstar  the EF-64 mixed3a flagship checkpoint (16 epochs, lambda 5)
  mis        MIS end-to-end on the TRAINED checkpoint: collection epoch
             (k=200), scoring with the documented GoogLeNet-penultimate
             embedder AND a CLIP-tower embedder column, the thesis
             distribution tripwire, per-unit CSVs (reference
             utils.py:2227-2343; anchors visualize_mis.py:24-44)
  mis_orig   the thesis' control: MIS of the ORIGINAL mixed3a channels
  ie         circuit tier on the trained registry SAEs: averages -> node IE ->
             edge IE (top-16/layer) -> faithfulness over 8 thresholds of the
             reference's 20-grid (compute_ie.py:715-944), CSV + plot
  probing    sparse-probing CSV on the flagship checkpoint (SAE vs raw)
  report     the HTML feature report w/ circuit section
  viz        FFT feature-viz renders of the top-MIS latents (spliced model)
  finetune   e2e KL finetune quality row: KLD/%same/loss_diff before/after
  steering   measured logit deltas for clamp/boost edits of a top latent

Resumable: each phase checks its own artifact and skips when present
(FLAG_FORCE=1 re-runs); FLAG_ONLY=<substr> runs a subset.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python run_flagship.py
Env: FLAG_ONLY FLAG_FORCE NORTHSTAR_DIR
     (CPU smoke: FLAG_EF, FLAG_IMAGES, FLAG_EPOCHS, FLAG_TPS, FLAG_BATCH)
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
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

probe_tpu_or_pin_cpu("run_flagship")
pin_cpu_if_requested()

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
WORK = os.environ.get("NORTHSTAR_DIR", "/tmp/northstar")
RUNS = os.path.join(WORK, "runs_flagship")
EF = int(os.environ.get("FLAG_EF", "64"))
# 8 epochs = 25.7M tokens — the r4 convergence-row protocol; chosen over the
# 16-epoch/50M r3 north-star budget to fit the round-5 chip window (the 50M
# trajectory itself is already committed in docs/NORTHSTAR.md)
EPOCHS = int(os.environ.get("FLAG_EPOCHS", "8"))
N_IMAGES = int(os.environ.get("FLAG_IMAGES", "4096"))
TPS = int(os.environ.get("FLAG_TPS", "32768"))
BATCH = int(os.environ.get("FLAG_BATCH", "256"))
EVAL_BATCH = min(32, BATCH)
_IS_SMOKE = bool(os.environ.get("SVT_FORCE_CPU"))
DOCS = (os.path.join(WORK, "docs_smoke", "flagship") if _IS_SMOKE
        else os.path.join(REPO, "docs", "flagship"))
os.makedirs(DOCS, exist_ok=True)

jax.config.update("jax_compilation_cache_dir", os.path.join(WORK, "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def base_cfg(**kw):
    from sparse_vision_tpu.config import RunConfig

    base = dict(
        model_name="inceptionv1", dataset_name="imagenet", data_dir=WORK,
        directory_path=RUNS, sae_model_name="sae_mlp", sae_layer="mixed3a",
        sae_lambda_sparse=5.0, sae_expansion_factor=EF, sae_epochs=EPOCHS,
        sae_learning_rate=1e-3, sae_batch_size=BATCH, dead_neurons_steps=200,
        sae_optimizer_name="constrained_adam", use_activation_cache=True,
        cache_tokens_per_step=TPS, cache_dtype="bfloat16", log_every=200,
        eval_batch_size=EVAL_BATCH,
    )
    base.update(kw)
    return RunConfig(**base)


def _mark(name: str) -> str:
    return os.path.join(DOCS, f"_{name}.done.json")


def done(name: str) -> bool:
    return os.path.exists(_mark(name)) and not os.environ.get("FLAG_FORCE")


def finish(name: str, payload: dict) -> None:
    payload = {"phase": name, "backend": jax.default_backend(), **payload}
    with open(_mark(name), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


# ---------------------------------------------------------------------------
def _registry_child(layer: str) -> None:
    """Train ONE circuit layer's SAE to ITS registry checkpoint_epoch, resuming
    from the latest checkpoint. Runs in its own subprocess: the axon client
    leaks host RSS per epoch (CLAUDE.md), and 8 layers x 12 epochs in one
    process OOMed the host in the first r5 attempt — per-layer children bound
    the leak and make the phase resumable."""
    import sparse_vision_tpu.train.pipeline as plmod
    from sparse_vision_tpu.interp.registry import LAYER_SAE_CONFIGS, layer_ckpt_dir
    from sparse_vision_tpu.train.checkpoint import latest_epoch
    from sparse_vision_tpu.train.multilayer import layer_config
    from sparse_vision_tpu.utils.paths import folder_paths

    tgt = 1 if _IS_SMOKE else LAYER_SAE_CONFIGS[layer].checkpoint_epoch
    cfg = layer_config(base_cfg(sae_epochs=tgt), layer)
    ckpt_dir = layer_ckpt_dir(folder_paths(cfg)["checkpoints"], layer)
    start = min(latest_epoch(ckpt_dir) or 0, tgt - 1)
    cfg = dataclasses.replace(cfg, sae_checkpoint_epoch=start)
    orig = plmod.Pipeline.eval_modified

    def skipping(self, epoch, store=True, final=False, **kw):
        if not final:
            return None
        return orig(self, epoch, store=store, final=final, **kw)

    plmod.Pipeline.eval_modified = skipping
    t0 = time.perf_counter()
    try:
        r = plmod.Pipeline(cfg).run()
    finally:
        plmod.Pipeline.eval_modified = orig
    print(json.dumps({"registry_layer": layer, "row": {
        "rec_loss": round(float(r["sae_rec_loss"]), 5),
        "union_L0_rel": round(float(r["sparsity"]), 4),
        "perc_dead": round(float(r["perc_dead_units"]), 4),
        "epochs": tgt, "resumed_from": start,
        "wall_s": round(time.perf_counter() - t0, 1),
    }}))


def phase_registry():
    """Per-layer circuit SAEs at the registry hyperparameters, each layer in a
    bounded child subprocess trained to its OWN checkpoint_epoch (evals only on
    the final epoch — the per-epoch CHECKPOINTS are what the circuit engine
    loads). Rows accumulate in a partial file so re-runs skip finished layers."""
    import subprocess

    from sparse_vision_tpu.interp.registry import (
        CIRCUIT_LAYERS,
        LAYER_SAE_CONFIGS,
        layer_ckpt_dir,
    )
    from sparse_vision_tpu.train.checkpoint import latest_epoch
    from sparse_vision_tpu.train.multilayer import layer_config
    from sparse_vision_tpu.utils.paths import folder_paths

    partial = os.path.join(DOCS, "_registry.rows.json")
    rows = {}
    if os.path.exists(partial) and not os.environ.get("FLAG_FORCE"):
        with open(partial) as f:
            rows = json.load(f)

    def ckpt_present(layer: str) -> bool:
        # A partial row survives a host reboot (it lives in docs/) but the
        # checkpoint in WORK does not — trust the row only if the checkpoint
        # the ie phase will load is actually on disk at the target epoch.
        tgt = 1 if _IS_SMOKE else LAYER_SAE_CONFIGS[layer].checkpoint_epoch
        cfg = layer_config(base_cfg(sae_epochs=tgt), layer)
        d = layer_ckpt_dir(folder_paths(cfg)["checkpoints"], layer)
        return (latest_epoch(d) or 0) >= tgt

    t0 = time.perf_counter()
    for layer in CIRCUIT_LAYERS:
        if layer in rows and ckpt_present(layer):
            print(f"[registry] {layer} row + checkpoint present — skipping")
            continue
        env = dict(os.environ, FLAG_CHILD_REGISTRY=layer)
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           capture_output=True, text=True, env=env)
        sys.stdout.write(r.stdout[-1000:])
        sys.stdout.flush()
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            raise RuntimeError(f"registry child {layer} rc={r.returncode}")
        last = [ln for ln in r.stdout.splitlines()
                if ln.startswith("{") and '"registry_layer"' in ln][-1]
        rows[layer] = json.loads(last)["row"]
        with open(partial, "w") as f:
            json.dump(rows, f, indent=1)
    finish("registry", {"layers": rows,
                        "wall_s": round(time.perf_counter() - t0, 1)})


def phase_northstar():
    import sparse_vision_tpu.train.pipeline as plmod
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfg = base_cfg()
    # per-epoch evals are backbone-forward heavy; the flagship needs the
    # CHECKPOINTS (every phase restores epoch EPOCHS) and the final row
    orig = plmod.Pipeline.eval_modified

    def skipping(self, epoch, store=True, final=False, **kw):
        if not final:
            return None
        return orig(self, epoch, store=store, final=final, **kw)

    plmod.Pipeline.eval_modified = skipping
    t0 = time.perf_counter()
    try:
        pipe = Pipeline(cfg)
        res = pipe.run()
    finally:
        plmod.Pipeline.eval_modified = orig
    finish("northstar", {
        "epochs": EPOCHS, "tokens": int(pipe.ts.step) * TPS,
        "rec_loss": round(float(res["sae_rec_loss"]), 5),
        "L0": round(float(res["sparsity"]) * 256, 1),
        "perc_dead": round(float(res["perc_dead_units"]), 4),
        "kld": round(float(res["kld"]), 5),
        "perc_same": round(float(res["perc_same"]), 4),
        "wall_s": round(time.perf_counter() - t0, 1),
    })


def _restored_pipe(**kw):
    from sparse_vision_tpu.train.pipeline import Pipeline

    kw.setdefault("training", False)
    return Pipeline(base_cfg(sae_checkpoint_epoch=EPOCHS, **kw))


def phase_mis():
    import gzip

    from sparse_vision_tpu.interp.mis import (
        compute_mis_for_run,
        mis_distribution_check,
    )

    t0 = time.perf_counter()
    n_mis, k_mis = (20, 9) if N_IMAGES >= 256 else (4, 2)
    pipe = _restored_pipe(mis="1")
    need = n_mis * (k_mis + 1)
    fn_npz = os.path.join(pipe.paths["evaluation_results"], "filename_indices",
                          f"{pipe.run_id}_epoch_{EPOCHS}.npz")
    # collection epoch (k=200 top/bottom per latent over TRAIN data)
    have = False
    if os.path.exists(fn_npz) and not os.environ.get("FLAG_FORCE"):
        with np.load(fn_npz) as z:
            have = z["max_filename_indices"].shape[0] == need
    if not have:
        pipe.mis_epoch(n_mis=n_mis, k_mis=k_mis)
    t_collect = time.perf_counter() - t0

    mis_dir = os.path.join(pipe.paths["evaluation_results"], "MIS")
    csv_path = os.path.join(mis_dir, f"{pipe.run_id}_mis_epoch_{EPOCHS}.csv")

    # column 1: the documented default (GoogLeNet penultimate embedding)
    t0 = time.perf_counter()
    res_gn = compute_mis_for_run(pipe, n_mis=n_mis, k_mis=k_mis)
    t_score = time.perf_counter() - t0
    confs = [r["MIS_confidence"] for r in res_gn["per_unit"]]
    check = mis_distribution_check(confs, "mixed3a")
    with gzip.open(os.path.join(DOCS, "mis_ef64_gnpenult_per_unit.csv.gz"),
                   "wt") as f, open(csv_path) as src:
        f.write(src.read())

    # column 2: CLIP-tower embedding (random-init compute-identical stand-in;
    # docs/MIS.md recipe). The run's images follow the GoogLeNet convention
    # (229px, x*255-117) — map them into the CLIP input domain.
    from sparse_vision_tpu.models.backbone import make_backbone

    clip = make_backbone("clip_vit_b16", "imagenet")
    clip_params, clip_state = clip.init(jax.random.key(7), (224, 224, 3))
    stage = clip.stage_names[-2]

    # weights as ARGUMENTS, not closure constants: constants are inlined into
    # the HLO and the tunnel's remote_compile rejects the ~350MB payload with
    # HTTP 413 (same failure mode as the r4 weights-as-args circuit fix)
    @jax.jit
    def _clip_embed(params, state, x):
        x01 = jnp.clip((x + 117.0) / 255.0, 0.0, 1.0)
        x224 = jax.image.resize(
            x01, (x01.shape[0], 224, 224, 3), method="bilinear")
        mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
        std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])
        xn = (x224 - mean) / std
        _, taps, _ = clip.apply(params, xn, state=state, stop_at=stage)
        t = taps[stage]
        return t.mean(axis=1) if t.ndim == 3 else t

    clip_params = jax.device_put(clip_params)
    clip_state = jax.device_put(clip_state)

    def clip_embed(x):
        return _clip_embed(clip_params, clip_state, x)

    res_clip = compute_mis_for_run(pipe, n_mis=n_mis, k_mis=k_mis,
                                   embed_fn=clip_embed)
    confs_clip = [r["MIS_confidence"] for r in res_clip["per_unit"]]
    check_clip = mis_distribution_check(confs_clip, "mixed3a")
    with gzip.open(os.path.join(DOCS, "mis_ef64_clip_per_unit.csv.gz"),
                   "wt") as f, open(csv_path) as src:
        f.write(src.read())

    finish("mis", {
        "n_units": len(confs),
        "t_collect_s": round(t_collect, 1), "t_score_s": round(t_score, 1),
        "gn_penult": {"median_mis": round(res_gn["median_mis"], 4),
                      "average_mis": round(res_gn["average_mis"], 4),
                      "distribution_check": check},
        "clip_tower": {"median_mis": round(res_clip["median_mis"], 4),
                       "average_mis": round(res_clip["average_mis"], 4),
                       "distribution_check": check_clip},
        "per_unit_csvs": ["mis_ef64_gnpenult_per_unit.csv.gz",
                          "mis_ef64_clip_per_unit.csv.gz"],
    })


def phase_mis_orig():
    """The thesis' control experiment: MIS of the ORIGINAL mixed3a channels
    (reference anchors: SAE 0.854-0.867 vs original 0.834 median,
    visualize_mis.py:24-44 — dreamsim scores; ours use the documented
    embedding similarity, so compare SHAPE and the SAE-vs-original DELTA)."""
    from sparse_vision_tpu.interp.mis import (
        compute_mis_for_run,
        mis_distribution_check,
    )
    from sparse_vision_tpu.train.pipeline import Pipeline

    n_mis, k_mis = (20, 9) if N_IMAGES >= 256 else (4, 2)
    cfg = base_cfg(original_model=True, training=False, mis="1",
                   sae_checkpoint_epoch=0)
    pipe = Pipeline(cfg)
    t0 = time.perf_counter()
    pipe.mis_epoch(n_mis=n_mis, k_mis=k_mis)
    res = compute_mis_for_run(pipe, n_mis=n_mis, k_mis=k_mis)
    confs = [r["MIS_confidence"] for r in res["per_unit"]]
    finish("mis_orig", {
        "n_units": len(confs),
        "median_mis": round(res["median_mis"], 4),
        "average_mis": round(res["average_mis"], 4),
        "distribution_check": mis_distribution_check(confs, "mixed3a"),
        "wall_s": round(time.perf_counter() - t0, 1),
    })


def phase_ie():
    from sparse_vision_tpu.train.pipeline import Pipeline

    if not _IS_SMOKE:
        # hard gate: committing circuit artifacts from randomly-initialized
        # SAEs (build_engine's fallback) would be worse than no artifact —
        # require every registry checkpoint before spending the chip window
        from sparse_vision_tpu.interp.registry import CIRCUIT_LAYERS, layer_ckpt_dir
        from sparse_vision_tpu.train.checkpoint import latest_epoch
        from sparse_vision_tpu.utils.paths import folder_paths

        roots = folder_paths(base_cfg())["checkpoints"]
        absent = [l for l in CIRCUIT_LAYERS
                  if not (latest_epoch(layer_ckpt_dir(roots, l)) or 0)]
        if absent:
            raise RuntimeError(
                f"phase_ie: registry checkpoints missing for {absent} — run "
                "the registry phase first (refusing to commit random-SAE "
                "circuit artifacts)")

    t0 = time.perf_counter()
    faith_idx = [0, 3, 6, 9, 12, 15, 18, 19] if not _IS_SMOKE else [0, 19]
    modes = ["1", "2", "3"] + [f"4{i}" for i in faith_idx]
    for mode in modes:
        cfg = base_cfg(training=False, compute_ie=mode,
                       ie_top_features=16 if not _IS_SMOKE else 2)
        print(f"--- IE mode {mode} ---")
        Pipeline(cfg).run()
    ie_dir = Pipeline(base_cfg(training=False)).paths["ie_related_quantities"]
    for f in ("faithfulness.csv", "faithfulness.png", "perc_dead_units.csv",
              "sparsity.csv"):
        src = os.path.join(ie_dir, f)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(DOCS, f"ie_{f}"))
    # edge summary: strongest edges per layer pair
    z = np.load(os.path.join(ie_dir, "edge_ie.npz"))
    edges = {k: float(np.abs(z[k]).max()) for k in z.files
             if not k.startswith("idx:")}
    finish("ie", {"modes": modes, "max_abs_edge_per_pair": edges,
                  "wall_s": round(time.perf_counter() - t0, 1)})


def phase_probing():
    from sparse_vision_tpu.eval_tools.probing import compute_sparse_probing

    pipe = _restored_pipe()
    t0 = time.perf_counter()
    summary = compute_sparse_probing(pipe, ks=(1, 2, 5, 16))
    epoch = EPOCHS
    src = os.path.join(pipe.paths["evaluation_results"], "probing",
                       f"{pipe.run_id}_probing_epoch_{epoch}.csv")
    if os.path.exists(src):
        shutil.copy(src, os.path.join(DOCS, "probing_ef64.csv"))
    finish("probing", {"summary": summary,
                       "wall_s": round(time.perf_counter() - t0, 1)})


def phase_report():
    from sparse_vision_tpu.eval_tools.report import write_feature_report

    import gzip

    pipe = _restored_pipe()
    out = os.path.join(pipe.paths["evaluation_results"],
                       "feature_report_ef64.html")
    write_feature_report(
        pipe.paths["evaluation_results"], pipe.run_id, out,
        ie_dir=pipe.paths["ie_related_quantities"],
    )
    # the report inlines every figure as base64 — commit it gzipped
    gz = os.path.join(DOCS, "feature_report_ef64.html.gz")
    with open(out, "rb") as src, gzip.open(gz, "wb") as dst:
        shutil.copyfileobj(src, dst)
    finish("report", {"html_gz": os.path.relpath(gz, REPO),
                      "bytes": os.path.getsize(out),
                      "gz_bytes": os.path.getsize(gz)})


def phase_viz():
    """FFT feature viz of the top-MIS latents through the SAE ENCODER tap:
    splice mixed3a's output with the encoder map and maximize latent j
    (stop_at the spliced stage; reference utils.py:1892-1932 renders the
    spliced model with lucent)."""
    import gzip

    from sparse_vision_tpu.eval_tools.viz import feature_visualization
    from sparse_vision_tpu.models.sae import sae_inference_and_loss

    pipe = _restored_pipe()
    # rank latents by the GoogLeNet-penultimate MIS column
    rows = []
    with gzip.open(os.path.join(DOCS, "mis_ef64_gnpenult_per_unit.csv.gz"),
                   "rt") as f:
        import csv as _csv

        for r in _csv.DictReader(f):
            rows.append((float(r["MIS_confidence"]), int(r["unit_idx"])))
    rows.sort(reverse=True)
    units = [u for _, u in rows[:6]]
    params = jax.device_get(pipe.ts.params)

    def encode_splice(act):
        out = sae_inference_and_loss("sae_mlp", params, act, 0.0)
        return out["encoded"]

    t0 = time.perf_counter()
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(units)
    fig, axs = plt.subplots(1, n, figsize=(3 * n, 3.2))
    steps = 256 if not _IS_SMOKE else 8
    for ax, u in zip(np.atleast_1d(axs), units):
        img = feature_visualization(
            pipe.net, pipe.frozen_params, "mixed3a", u,
            (229, 229, 3), state=pipe.net_state,
            splice=("mixed3a", encode_splice), steps=steps,
            to_model=lambda x: x * 255.0 - 117.0,
        )
        ax.imshow(img)
        ax.set_title(f"latent {u}")
        ax.axis("off")
    out = os.path.join(DOCS, "feature_viz_top_mis.png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    finish("viz", {"units": units, "png": os.path.relpath(out, REPO),
                   "steps": steps,
                   "wall_s": round(time.perf_counter() - t0, 1)})


def phase_finetune():
    """e2e KL finetune quality row on the trained checkpoint (arXiv:2503.17272;
    VERDICT r4 #6): before/after KLD, %same, loss_diff at the run's protocol."""
    from sparse_vision_tpu.train.e2e_finetune import e2e_finetune

    ft_epochs = 2
    # alpha_mse anchors the KL objective: on stand-in data the trained
    # checkpoint's KLD is already ~0 (%same 0.998), so the paper's pure-KL
    # finetune (alpha=0) has no gradient signal and the remaining L1 pressure
    # just degrades reconstruction (observed in the CPU smoke: rec 0.09->1.12
    # at kld ~0). The anchored row measures what matters at this fidelity:
    # the finetune HOLDS kld/%same while maintaining rec under the splice.
    alpha_mse = 1.0
    pipe = _restored_pipe(training=True, sae_e2e_finetune_epochs=ft_epochs,
                          sae_e2e_alpha_mse=alpha_mse)
    before = pipe.eval_modified(epoch=EPOCHS, store=False)
    # the e2e step backprops through the [B*784, 16384] splice — image batch
    # must be eval-sized; keep the run identity (paths/run_id/ckpt dir were
    # derived from the training batch size at init)
    ckpt_dir = pipe._sae_ckpt_dir()
    pipe.cfg = dataclasses.replace(pipe.cfg, sae_batch_size=EVAL_BATCH)
    pipe._sae_ckpt_dir = lambda: ckpt_dir
    t0 = time.perf_counter()
    after = e2e_finetune(pipe, epochs=ft_epochs)
    row = {
        "finetune_epochs": ft_epochs,
        "alpha_mse": alpha_mse,
        "before": {k: round(float(before[k]), 5)
                   for k in ("kld", "perc_same", "loss_diff", "sae_rec_loss")},
        "after": {k: round(float(after[k]), 5)
                  for k in ("kld", "perc_same", "loss_diff", "sae_rec_loss")},
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    with open(os.path.join(DOCS, "e2e_finetune_r5.json"), "w") as f:
        json.dump(row, f, indent=1)
    finish("finetune", row)


def phase_steering():
    """Steering-service row: measured logit deltas for clamping / boosting the
    top-MIS latent (serve/exporter.make_steering_service_fn, 'delta' mode)."""
    import gzip

    from sparse_vision_tpu.serve.exporter import make_steering_service_fn

    pipe = _restored_pipe()
    h = pipe.num_units
    with gzip.open(os.path.join(DOCS, "mis_ef64_gnpenult_per_unit.csv.gz"),
                   "rt") as f:
        import csv as _csv

        rows = [(float(r["MIS_confidence"]), int(r["unit_idx"]))
                for r in _csv.DictReader(f)]
    svc = jax.jit(make_steering_service_fn(
        pipe.net, pipe.frozen_params, pipe.net_state, "sae_mlp",
        jax.device_get(pipe.ts.params), "mixed3a", mode="delta",
    ))
    b = next(iter(pipe.val_ds.batches(EVAL_BATCH, shuffle=False)))
    imgs = jnp.asarray(b.images)
    ident = svc(imgs, jnp.ones((h,)), jnp.zeros((h,)))
    # identity steering must reproduce the original model exactly (delta mode)
    ident_gap = float(jnp.max(jnp.abs(
        ident["logits_steered"] - ident["logits_original"])))
    # the top-MIS latent that is ALIVE on this batch (clamping a latent that
    # never fires is a no-op by construction)
    lat_means = np.asarray(ident["latents_mean"]).mean(axis=0)
    unit = next((u for _, u in sorted(rows, reverse=True)
                 if lat_means[u] > 0), max(rows)[1])
    edits = {}
    mean_lat = float(lat_means[unit])
    for name, (scale_u, bias_u) in {
        "clamp0": (0.0, 0.0),
        "boost5x": (5.0, 0.0),
        "drive": (0.0, max(5.0 * abs(mean_lat), 1.0)),
    }.items():
        scale = jnp.ones((h,)).at[unit].set(scale_u)
        bias = jnp.zeros((h,)).at[unit].set(bias_u)
        out = svc(imgs, scale, bias)
        d = out["logits_steered"] - out["logits_original"]
        top_change = jnp.mean(
            (jnp.argmax(out["logits_steered"], 1)
             != jnp.argmax(out["logits_original"], 1)).astype(jnp.float32))
        edits[name] = {
            "mean_abs_logit_delta": round(float(jnp.mean(jnp.abs(d))), 5),
            "max_abs_logit_delta": round(float(jnp.max(jnp.abs(d))), 5),
            "top_class_change_frac": round(float(top_change), 4),
        }
    row = {"unit": unit, "identity_max_gap": ident_gap,
           "mean_latent_act": round(mean_lat, 5), "edits": edits}
    with open(os.path.join(DOCS, "steering_r5.json"), "w") as f:
        json.dump(row, f, indent=1)
    finish("steering", row)


PHASES = [
    ("registry", phase_registry),
    ("northstar", phase_northstar),
    ("mis", phase_mis),
    ("mis_orig", phase_mis_orig),
    ("ie", phase_ie),
    ("probing", phase_probing),
    ("report", phase_report),
    ("viz", phase_viz),
    ("finetune", phase_finetune),
    ("steering", phase_steering),
]


def main() -> int:
    from bench_northstar import ensure_standin_dataset

    if os.environ.get("FLAG_CHILD_REGISTRY"):
        _registry_child(os.environ["FLAG_CHILD_REGISTRY"])
        return 0
    ensure_standin_dataset(WORK, N_IMAGES, max(N_IMAGES // 8, 8))
    only = os.environ.get("FLAG_ONLY", "")
    for name, fn in PHASES:
        if only and only not in name:
            continue
        if done(name):
            print(f"[{name}] done marker present — skipping")
            continue
        print(f"=== flagship phase: {name} ===")
        fn()
    return 0


if __name__ == "__main__":
    sys.exit(main())
