"""Convergence rows for the round-3 dictionary types on REAL cached activations.

VERDICT r3 #4: batch_topk, matryoshka, transcoder (mixed3a->mixed3b) and
crosscoder (mixed4a..mixed4e) had kernel parity + speed numbers but no
trained-quality evidence. This script trains each through the production
Pipeline on the north-star rehearsal's GoogLeNet activation caches (stand-in
JPEGs -> 229px lucent transform -> tap dump, bench_northstar.py phase A-C) at
the same ~25M-token budget as docs/convergence_variants_v5e.json's original
four variants, and APPENDS one JSONL row per run to that file (committed
evidence; CONVERGENCE.md summarizes).

Per-variant lambda/k defaults follow the round-3 convention (first value giving
a sane sparsity/fidelity point, not a Pareto sweep); override with CONV_LAMBDA.

Run on the chip (one variant per invocation keeps the wedge-prevention
one-program-shape-per-process rule):
  PYTHONPATH=/root/repo:$PYTHONPATH CONV_ONLY=batch_topk python bench_convergence_variants.py
Env: CONV_ONLY=<substr>  CONV_LAMBDA=<float>  CONV_EPOCHS=<int>  NORTHSTAR_DIR
     CONV_CHUNK_EPOCHS=<int>  (default 8 on the chip, 0=off on CPU)

Long chip runs are CHUNKED into fresh subprocesses of CONV_CHUNK_EPOCHS epochs
each, resumed from the per-epoch Orbax checkpoints: the axon remote backend's
client grows host RSS roughly linearly with dispatch count (measured ~3 GB/epoch
at crosscoder scale — the 32-epoch run was OOM-killed at epoch 25 with 79 GB
RSS, chip_queue round 4, while the SAME loop on the CPU backend is flat at
~620 MB over 12 epochs). Bounding epochs per process bounds the leak; the
training trajectory is unchanged (step counter, optimizer state, and dead-unit
accumulator all live in the checkpoint).
"""

import json
import os
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

probe_tpu_or_pin_cpu("bench_convergence_variants")
pin_cpu_if_requested()

import jax

WORK = os.environ.get("NORTHSTAR_DIR", "/tmp/northstar")
OUT = os.environ.get("CONV_OUT", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "docs",
    "convergence_variants_v5e.json"))
N_TRAIN = int(os.environ.get("CONV_IMAGES", "4096"))
N_VAL = max(N_TRAIN // 8, 8)

jax.config.update("jax_compilation_cache_dir", os.path.join(WORK, "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

# name -> (config overrides, epochs, notes). Shapes anchor to the production
# benches: mixed3a EF 64 -> 16,384 latents (bench.py / bench_transcoder.py);
# crosscoder mixed4a..4e EF 16 -> 8,192 shared latents (bench_crosscoder.py).
VARIANTS = {
    "batch_topk": (dict(
        sae_model_name="batch_topk_sae", sae_layer="mixed3a",
        sae_lambda_sparse=0.0, sae_topk=32, sae_expansion_factor=64,
        sae_optimizer_name="constrained_adam", sae_aux_k=512,
    ), 8, "batch-k=32 + AuxK 512 (Bussmann/Gao recipe) + final-params "
          "threshold calibration; measured per-token deploy L0 = 32.3 "
          "(the table L0 is the per-image union, docs/CONVERGENCE.md)"),
    "matryoshka": (dict(
        sae_model_name="matryoshka_sae", sae_layer="mixed3a",
        sae_lambda_sparse=5.0, sae_expansion_factor=64,
        sae_optimizer_name="constrained_adam",
    ), 8, "prefixes 0.0625/0.25/1.0"),
    "transcoder": (dict(
        sae_model_name="transcoder", sae_layer="mixed3a",
        transcoder_target_layer="mixed3b", sae_lambda_sparse=5.0,
        sae_expansion_factor=64, sae_optimizer_name="constrained_adam",
    ), 8, "mixed3a -> mixed3b (the production circuit pair)"),
    "crosscoder": (dict(
        sae_model_name="crosscoder", sae_layer="mixed4a",
        crosscoder_layers="mixed4b,mixed4c,mixed4d,mixed4e",
        sae_lambda_sparse=5.0, sae_expansion_factor=16,
        sae_optimizer_name="adam",  # constrained_adam rejected by design
        cache_tokens_per_step=16384,  # SigmaC=2896-wide token rows
    ), 32, "mixed4a..4e shared code; 196 tok/img -> 32 epochs for ~25M tokens"),
    # the ViT/CLIP family's first trained-quality row: the data layer ingests
    # the SAME JPEG shards through the 224px CLIPImageProcessor convention
    # (round-4 per-model preprocessing), the tower is a random-init
    # compute-identical stand-in for an HF checkpoint (the northstar
    # GoogLeNet precedent)
    "clip_sae": (dict(
        model_name="clip_vit_b16", sae_model_name="sae_mlp",
        sae_layer="block6", sae_lambda_sparse=5.0, sae_expansion_factor=8,
        sae_optimizer_name="constrained_adam", cache_tokens_per_step=16384,
    ), 32, "SAE on CLIP ViT-B/16 block6 residual (197 tok/img, 224px ingest)"),
}


def ensure_dataset():
    # shared per-split check (ADVICE r4): bench_northstar owns the helper so
    # every WORK-sharing bench regenerates exactly the missing split(s)
    from bench_northstar import ensure_standin_dataset

    ensure_standin_dataset(WORK, N_TRAIN, N_VAL)


def _default_chunk() -> int:
    if "CONV_CHUNK_EPOCHS" in os.environ:
        return int(os.environ["CONV_CHUNK_EPOCHS"])
    return 8 if jax.default_backend() != "cpu" else 0


def _run_chunked(name: str, total_epochs: int, chunk: int, start: int) -> dict:
    """Drive the variant in CONV_CHUNK_EPOCHS-epoch subprocesses (see module
    docstring). Each child resumes from the previous chunk's checkpoint, skips
    the on-disk activation cache dump, and prints its row JSON; the driver sums
    the wall clocks and appends ONE composed row for the full run."""
    import subprocess
    import sys

    wall = 0.0
    row = None
    while start < total_epochs:
        end = min(start + chunk, total_epochs)
        env = dict(os.environ, CONV_CHILD="1", CONV_ONLY=name,
                   CONV_START=str(start), CONV_EPOCHS=str(end))
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           capture_output=True, text=True, env=env)
        sys.stdout.write(r.stdout[-1500:])
        sys.stdout.flush()
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-2000:])
            raise RuntimeError(
                f"{name} chunk [{start},{end}) failed rc={r.returncode}")
        last = [ln for ln in r.stdout.splitlines()
                if ln.startswith("{") and '"variant"' in ln][-1]
        row = json.loads(last)
        wall += row["wall_s"]
        start = end
    row["wall_s"] = round(wall, 1)
    row["epochs"] = total_epochs
    row["chunk_epochs"] = chunk
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    return row


def run_variant(name: str, overrides: dict, epochs: int, note: str) -> dict:
    import dataclasses

    from sparse_vision_tpu.config import RunConfig
    import sparse_vision_tpu.train.pipeline as plmod

    lam = os.environ.get("CONV_LAMBDA")
    epochs = int(os.environ.get("CONV_EPOCHS", epochs))
    start = int(os.environ.get("CONV_START", "0"))
    chunk = _default_chunk()
    if chunk and epochs - start > chunk and not os.environ.get("CONV_CHILD"):
        return _run_chunked(name, epochs, chunk, start)
    kwargs = dict(
        model_name="inceptionv1", dataset_name="imagenet", data_dir=WORK,
        directory_path=os.path.join(WORK, f"runs_conv_{name}"),
        sae_epochs=epochs, sae_learning_rate=1e-3, sae_batch_size=256,
        dead_neurons_steps=200, use_activation_cache=True,
        cache_tokens_per_step=32768, cache_dtype="bfloat16", log_every=25,
        eval_batch_size=32,
    )
    kwargs.update(overrides)
    cfg = RunConfig(**kwargs)
    if start:
        cfg = dataclasses.replace(cfg, sae_checkpoint_epoch=start)
    if lam is not None:
        cfg = dataclasses.replace(cfg, sae_lambda_sparse=float(lam))
    if os.environ.get("CONV_EF"):  # CPU smoke tests shrink the dictionary
        cfg = dataclasses.replace(
            cfg, sae_expansion_factor=int(os.environ["CONV_EF"]))
    if os.environ.get("CONV_BATCH"):  # smoke tests with few images
        bs = int(os.environ["CONV_BATCH"])
        cfg = dataclasses.replace(cfg, sae_batch_size=bs, batch_size=bs,
                                  eval_batch_size=bs,
                                  cache_tokens_per_step=min(
                                      cfg.cache_tokens_per_step, bs * 784))

    eval_time = {"s": 0.0, "n": 0}
    orig_eval = plmod.Pipeline.eval_modified

    def timed_eval(self, *a, **k):
        t = time.perf_counter()
        r = orig_eval(self, *a, **k)
        eval_time["s"] += time.perf_counter() - t
        eval_time["n"] += 1
        return r

    plmod.Pipeline.eval_modified = timed_eval
    try:
        pipe = plmod.Pipeline(cfg)
        t0 = time.perf_counter()
        result = pipe.run()
        t_total = time.perf_counter() - t0
    finally:
        plmod.Pipeline.eval_modified = orig_eval

    steps = int(pipe.ts.step)
    tokens = steps * cfg.cache_tokens_per_step
    latents = pipe.sae_input_size * cfg.sae_expansion_factor
    row = {
        "variant": cfg.sae_model_name,
        "lambda": cfg.sae_lambda_sparse,
        "tokens": tokens,
        "wall_s": round(t_total - eval_time["s"], 1),
        "rec_loss": round(float(result["sae_rec_loss"]), 5),
        "sparsity_L0": round(float(result["sparsity"]) * latents
                             / cfg.sae_expansion_factor, 1),
        "perc_dead": round(float(result["perc_dead_units"]), 4),
        "epochs": epochs,
        "latents": latents,
        "backend": jax.default_backend(),
        "note": note,
    }
    if cfg.sae_model_name == "batch_topk_sae":
        row["batch_k"] = cfg.sae_topk
    if os.environ.get("CONV_CHILD"):
        # chunk subprocess: the driver composes and appends the final row
        print(json.dumps(row))
        return row
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    return row


def main():
    only = os.environ.get("CONV_ONLY", "")
    ensure_dataset()
    for name, (ov, epochs, note) in VARIANTS.items():
        if only and only not in name:
            continue
        print(f"=== {name} ===")
        run_variant(name, ov, epochs, note)


if __name__ == "__main__":
    main()
