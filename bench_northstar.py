"""North-star rehearsal: the FULL real chain on hardware, end to end.

BASELINE.md's target: train a 16k-latent SAE over full-ImageNet GoogLeNet mixed3a
activations on v5e-8 in < 1 hour at NMSE/L0 parity. This script runs the complete
production chain on ONE chip and reports every phase's wall time so the 8-chip run is
a measured extrapolation, not a guess:

  A. dataset: JPEG tar shards on disk (webdataset format, utils.py:520-547 role) —
     a synthetic ImageNet STAND-IN (documented: no ImageNet on this host, zero
     egress; JPEGs are real JPEGs so the decode path is real)
  B. Pipeline(RunConfig(...)) — GoogLeNet backbone (random-init: compute-identical
     stand-in for the torchvision checkpoint, which cannot be downloaded here)
  C. activation dump: tar read -> JPEG decode -> 229px lucent transform ->
     GoogLeNet-to-mixed3a forward -> bf16 token shards        [images/s]
  D. cached fused training: 16,384 latents, Pallas kernel, ConstrainedAdam
     (the driver-verified bench.py kernel, driven via the production Pipeline)
                                                              [tokens/s]
  E. eval epochs incl. the final figure set + results-CSV row  [seconds]
  F. extrapolation to 1.281M images / ~1.08e9 mixed3a tokens on v5e-8

Run on the chip:  PYTHONPATH=/root/repo:$PYTHONPATH python bench_northstar.py
Writes its JSON report next to docs/NORTHSTAR.md's numbers.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

N_TRAIN = 4096  # stand-in train images (full ImageNet: 1,281,167)
N_VAL = 512
IMAGENET_TRAIN = 1_281_167
EXPANSION = 64  # mixed3a C=256 -> 16,384 latents (the north-star shape)
TPS = 32_768  # tokens per train step
EPOCHS = 2
WORK = os.environ.get("NORTHSTAR_DIR", "/tmp/northstar")
# each variant invocation (plain / NORTHSTAR_INT8 / NORTHSTAR_OVERLAP) measures
# the BASE dump+train chain first, so it needs its own runs root — a cache or
# checkpoint left by an earlier variant would make the base phase unmeasurable
# (the queue's northstar_int8 step died on the plain run's cache, round 3).
# Tar shards and the jax compile cache stay shared under WORK.
_VARIANT = ("_int8pass" if os.environ.get("NORTHSTAR_INT8")
            else "_overlappass" if os.environ.get("NORTHSTAR_OVERLAP") else "")
RUNS = os.path.join(WORK, "runs" + _VARIANT)  # distinct from the variant
# sub-run dirs runs_int8 / runs_overlap, which the variant phases rmtree


def make_standin_jpegs(n: int, out_dir: str, seed: int, prefix: str) -> list[str]:
    """Structured random JPEGs (~375x500, ImageNet-typical size) packed into
    webdataset tar shards: <key>.jpg + <key>.cls."""
    from PIL import Image

    from sparse_vision_tpu.data.datasets import write_tar_shards

    img_dir = os.path.join(out_dir, f"_{prefix}_jpg")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths, labels = [], []
    base_y, base_x = np.mgrid[0:375, 0:500].astype(np.float32)
    for i in range(n):
        # smooth gradients + blocky patches compress like natural images do
        img = (
            127 + 60 * np.sin(base_x / rng.uniform(20, 80) + rng.uniform(0, 6))
            + 60 * np.cos(base_y / rng.uniform(20, 80))
        )[..., None] + rng.normal(0, 12, (375, 500, 3))
        arr = np.clip(img, 0, 255).astype(np.uint8)
        p = os.path.join(img_dir, f"{i:07d}.jpg")
        Image.fromarray(arr).save(p, quality=85)
        paths.append(p)
        labels.append(int(rng.integers(0, 1000)))
    shard_dir = os.path.join(out_dir, "imagenet")
    write_tar_shards(paths, labels, shard_dir, shard_size=1024, prefix=prefix)
    shutil.rmtree(img_dir)
    return sorted(os.listdir(shard_dir))


def ensure_standin_dataset(work: str = WORK, n_train: int = N_TRAIN,
                           n_val: int = N_VAL) -> None:
    """Create any MISSING split of the stand-in tar dataset (shared by every
    bench that uses WORK). Checks per-split shard presence, not the directory:
    an interrupted earlier run can leave train shards without val shards, and
    the folder's mere existence would then skip creation and fail downstream
    (ADVICE r4; truncation is handled by write_tar_shards' atomic rename)."""
    import glob

    shard_dir = os.path.join(work, "imagenet")
    if not glob.glob(os.path.join(shard_dir, "train*.tar")):
        make_standin_jpegs(n_train, work, seed=0, prefix="train")
    if not glob.glob(os.path.join(shard_dir, "val*.tar")):
        make_standin_jpegs(n_val, work, seed=1, prefix="val")


def main() -> int:
    report: dict = {"host_cpus": os.cpu_count()}

    # ---- A. stand-in dataset ------------------------------------------------
    t0 = time.perf_counter()
    ensure_standin_dataset()
    if time.perf_counter() - t0 > 1.0:
        report["t_dataset_build_s"] = round(time.perf_counter() - t0, 1)
    print(f"dataset at {WORK}/imagenet: "
          f"{len(os.listdir(os.path.join(WORK, 'imagenet')))} files")

    import jax

    # persistent compile cache: remote AOT compiles of the GoogLeNet graph take
    # minutes; cache them across phases/reruns
    jax.config.update("jax_compilation_cache_dir", os.path.join(WORK, "jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.data.activation_cache import ActivationCache, dump_activations
    import sparse_vision_tpu.train.pipeline as plmod

    report["backend"] = jax.default_backend()
    report["device"] = str(jax.devices()[0])

    cfg = RunConfig(
        model_name="inceptionv1", sae_model_name="sae_mlp", sae_layer="mixed3a",
        directory_path=RUNS, dataset_name="imagenet",
        data_dir=WORK, sae_epochs=EPOCHS, sae_learning_rate=1e-3,
        sae_optimizer_name="constrained_adam", sae_batch_size=256,
        sae_lambda_sparse=5.0,  # the reference's known-good mixed3a lambda
        sae_expansion_factor=EXPANSION, dead_neurons_steps=200,
        use_activation_cache=True, cache_tokens_per_step=TPS, log_every=25,
        cache_dtype="bfloat16",
        eval_batch_size=32,  # stock eval at 16k latents: [B*841, 16384] must fit HBM
    )

    # time eval epochs separately by wrapping the method
    eval_time = {"s": 0.0, "n": 0}
    orig_eval = plmod.Pipeline.eval_modified

    def timed_eval(self, *a, **k):
        t = time.perf_counter()
        r = orig_eval(self, *a, **k)
        eval_time["s"] += time.perf_counter() - t
        eval_time["n"] += 1
        return r

    plmod.Pipeline.eval_modified = timed_eval

    t0 = time.perf_counter()
    pipe = plmod.Pipeline(cfg)
    report["t_pipeline_init_s"] = round(time.perf_counter() - t0, 1)

    # ---- C. activation dump (timed explicitly; Pipeline then finds the cache)
    cache_dir = os.path.join(
        pipe.paths["evaluation_results"], "activation_cache", cfg.sae_layer
    )
    t_dump = None
    if not os.path.exists(os.path.join(cache_dir, "meta.json")):
        # warm up the tap compile on a throwaway batch so t_dump measures the
        # steady-state pipeline (remote AOT compile alone can take minutes)
        t0 = time.perf_counter()
        dump_activations(
            pipe.net, pipe.frozen_params, pipe.net_state, pipe.train_ds,
            cfg.sae_layer, os.path.join(WORK, "_warmup_cache"),
            batch_size=cfg.sae_batch_size, dtype="bfloat16", max_batches=1,
        )
        shutil.rmtree(os.path.join(WORK, "_warmup_cache"), ignore_errors=True)
        report["t_tap_compile_s"] = round(time.perf_counter() - t0, 1)
        print(f"tap compile+warmup: {report['t_tap_compile_s']}s")
        t0 = time.perf_counter()
        # the Pipeline's own dump geometry: bf16 + stack-aligned shards, so the
        # training phase reads zero-copy scan stacks (round 3+; earlier rounds
        # dumped 64k-token shards and paid a per-dispatch np.stack assembly)
        dump_activations(
            pipe.net, pipe.frozen_params, pipe.net_state, pipe.train_ds,
            cfg.sae_layer, cache_dir, shuffle_images=True,
            **pipe._cache_dump_kwargs(),
        )
        t_dump = time.perf_counter() - t0
    cache = ActivationCache(cache_dir)
    n_tokens = cache.total_tokens
    tok_per_img = n_tokens / N_TRAIN
    if t_dump is None:
        raise SystemExit(
            f"cache already existed at {cache_dir}; delete it to measure the dump"
        )
    report.update(
        t_dump_s=round(t_dump, 1),
        dump_images_per_s=round(N_TRAIN / t_dump, 1),
        cache_tokens=int(n_tokens),
        tokens_per_image=round(tok_per_img, 1),
        cache_bytes=sum(
            os.path.getsize(os.path.join(cache_dir, f)) for f in os.listdir(cache_dir)
        ),
    )
    print(f"dump: {N_TRAIN} imgs in {t_dump:.1f}s = {N_TRAIN / t_dump:.1f} img/s "
          f"({n_tokens} tokens)")

    # ---- D+E. cached fused training through the production path -------------
    t0 = time.perf_counter()
    result = pipe.run()
    t_total = time.perf_counter() - t0
    steps = int(pipe.ts.step)
    t_train = t_total - eval_time["s"]
    tokens_trained = steps * TPS
    report.update(
        t_run_total_s=round(t_total, 1),
        t_eval_s=round(eval_time["s"], 1),
        n_eval_epochs=eval_time["n"],
        t_train_s=round(t_train, 1),
        train_steps=steps,
        tokens_trained=tokens_trained,
        train_tokens_per_s=round(tokens_trained / t_train, 0),
        final_nrmse=float(result["sae_nrmse_loss"]),
        final_l0=float(result["sparsity"]) * 256,  # active latents per token
        perc_dead=float(result["perc_dead_units"]),
    )
    print(f"train: {tokens_trained} tokens in {t_train:.1f}s = "
          f"{tokens_trained / t_train:,.0f} tok/s; eval x{eval_time['n']}: "
          f"{eval_time['s']:.1f}s")

    # ---- F. extrapolation ----------------------------------------------------
    full_tokens = IMAGENET_TRAIN * tok_per_img
    # dump is embarrassingly data-parallel over 8 chips; host decode scales with
    # cores (this box: measured per-core rate x a 112-core production host)
    dump_1chip_s = IMAGENET_TRAIN / report["dump_images_per_s"]
    decode_per_core = report["dump_images_per_s"] / max(os.cpu_count(), 1)
    train_1chip_s = full_tokens / report["train_tokens_per_s"]
    report.update(
        full_imagenet_tokens=int(full_tokens),
        extrapolated_dump_v5e8_s=round(dump_1chip_s / 8, 1),
        extrapolated_train_epoch_v5e8_s=round(train_1chip_s / 8, 1),
        extrapolated_total_v5e8_s=round((dump_1chip_s + train_1chip_s) / 8, 1),
        decode_imgs_per_s_per_core=round(decode_per_core, 1),
    )
    # ---- G. (opt-in) dump/train overlap: combined-phase wall time ------------
    # NORTHSTAR_OVERLAP=1 reruns dump+first-epoch with overlap_dump_train=True in a
    # fresh run dir and reports the combined wall time against the sequential
    # dump-then-epoch sum measured above (VERDICT r2 #6). Compiles are warm (same
    # jitted graphs + persistent cache), so the delta is the overlap saving.
    if os.environ.get("NORTHSTAR_OVERLAP"):
        import dataclasses
        import shutil as _sh

        ovl_runs = os.path.join(WORK, "runs_overlap")
        _sh.rmtree(ovl_runs, ignore_errors=True)
        ovl_cfg = dataclasses.replace(
            cfg, directory_path=ovl_runs, sae_epochs=1, overlap_dump_train=True,
            cache_dtype="bfloat16",  # match the sequential phase's bf16 dump
        )
        # construct the Pipeline OUTSIDE the clock: the sequential comparand
        # (t_dump + t_train/EPOCHS) excludes init too (backbone init, tar index)
        pipe2 = plmod.Pipeline(ovl_cfg)
        eval_time["s"] = 0.0
        t0 = time.perf_counter()
        pipe2.run()
        t_ovl_total = time.perf_counter() - t0
        t_ovl_compute = t_ovl_total - eval_time["s"]
        seq_equiv = t_dump + (t_train / EPOCHS)  # sequential dump + one epoch
        report.update(
            t_overlap_dump_plus_epoch_s=round(t_ovl_compute, 1),
            t_sequential_dump_plus_epoch_s=round(seq_equiv, 1),
            overlap_saving_s=round(seq_equiv - t_ovl_compute, 1),
        )
        print(
            f"overlap: dump+epoch combined {t_ovl_compute:.1f}s vs sequential "
            f"{seq_equiv:.1f}s (saving {seq_equiv - t_ovl_compute:.1f}s)"
        )

    # ---- H. (opt-in) int8 cache: dump + train with cache_dtype="int8" --------
    # NORTHSTAR_INT8=1 reruns the chain with the quantized cache (per-shard
    # per-channel int8 + device dequant) in a fresh run dir: reports the cache
    # bytes (expect ~1/2 of bf16), the cached-training rate (half the
    # host->device bytes per epoch), and the quality deltas vs the bf16 run.
    if os.environ.get("NORTHSTAR_INT8"):
        import dataclasses
        import shutil as _sh

        i8_runs = os.path.join(WORK, "runs_int8")
        _sh.rmtree(i8_runs, ignore_errors=True)
        i8_cfg = dataclasses.replace(
            cfg, directory_path=i8_runs, cache_dtype="int8",
        )
        pipe3 = plmod.Pipeline(i8_cfg)
        i8_cache_dir = os.path.join(
            pipe3.paths["evaluation_results"], "activation_cache", cfg.sae_layer
        )
        t0 = time.perf_counter()
        # the Pipeline's dump geometry (stack-aligned shards) — otherwise the
        # int8 read path would fall back to host dequant and this phase would
        # not measure the device-dequant transfer saving
        dump_activations(
            pipe3.net, pipe3.frozen_params, pipe3.net_state, pipe3.train_ds,
            cfg.sae_layer, i8_cache_dir, shuffle_images=True,
            **pipe3._cache_dump_kwargs(),
        )
        t_dump8 = time.perf_counter() - t0
        eval_time["s"] = 0.0
        t0 = time.perf_counter()
        result8 = pipe3.run()
        t_total8 = time.perf_counter() - t0
        t_train8 = t_total8 - eval_time["s"]
        steps8 = int(pipe3.ts.step)
        report.update(
            int8_t_dump_s=round(t_dump8, 1),
            int8_cache_bytes=sum(
                os.path.getsize(os.path.join(i8_cache_dir, f))
                for f in os.listdir(i8_cache_dir)
            ),
            int8_t_train_s=round(t_train8, 1),
            int8_train_tokens_per_s=round(steps8 * TPS / t_train8, 0),
            int8_final_nrmse=float(result8["sae_nrmse_loss"]),
            int8_final_l0=float(result8["sparsity"]) * 256,
            int8_nrmse_delta=float(result8["sae_nrmse_loss"])
            - report["final_nrmse"],
        )
        print(
            f"int8: dump {t_dump8:.1f}s, cache "
            f"{report['int8_cache_bytes'] / 1e6:.0f} MB "
            f"(bf16 run: {report['cache_bytes'] / 1e6:.0f} MB... f32-equiv x4), "
            f"train {steps8 * TPS / t_train8:,.0f} tok/s, "
            f"NRMSE {result8['sae_nrmse_loss']:.4f} "
            f"(delta {report['int8_nrmse_delta']:+.4f})"
        )

    print(json.dumps(report))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "docs", "northstar_v5e.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
