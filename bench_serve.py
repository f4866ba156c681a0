"""Serving-path throughput: images/s through an exported AOT feature-service
artifact (GoogLeNet + mixed3a SAE at registry expansion factor, top-16
features/sample), served via ServingEngine bucket padding.

This measures the DEPLOYED path — serialized StableHLO reloaded in a fresh
object graph, jit-wrapped call, host->device->host round trip per request —
not the raw kernel (bench.py) or the training loop (bench_northstar.py). On
this box the request loop is tunnel-bound like every end-to-end rate; the
backend field says which number you're reading.

    PYTHONPATH=/root/repo:$PYTHONPATH python bench_serve.py
"""

import json
import os
import time

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested, probe_tpu_or_pin_cpu

probe_tpu_or_pin_cpu("bench_serve")
pin_cpu_if_requested()

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SVT_JAX_CACHE", os.path.expanduser("~/.cache/svt_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main():
    import numpy as np

    from sparse_vision_tpu.interp.registry import LAYER_SAE_CONFIGS
    from sparse_vision_tpu.models.backbone import (
        get_sae_input_size,
        init_backbone,
        make_backbone,
    )
    from sparse_vision_tpu.models.sae import init_sae
    from sparse_vision_tpu.serve.engine import ServingEngine
    from sparse_vision_tpu.serve.exporter import export_feature_service

    on_tpu = jax.default_backend() != "cpu"
    bucket = 64 if on_tpu else 8
    steps = 20 if on_tpu else 3

    net = make_backbone("inceptionv1", "imagenet")
    params, state = init_backbone(net, jax.random.key(0), "imagenet")
    d = get_sae_input_size(net, "imagenet", "mixed3a")
    ef = LAYER_SAE_CONFIGS["mixed3a"].expansion_factor
    sae_params = init_sae("sae_mlp", jax.random.key(1), d, ef)

    art_dir = os.path.join(
        os.environ.get("SVT_BENCH_DIR", "/tmp"), "svt_bench_serve_artifact"
    )
    t0 = time.perf_counter()
    export_feature_service(
        net, params, state, "sae_mlp", sae_params, "mixed3a", art_dir,
        img_shape=(229, 229, 3), top_k=16,
    )
    export_s = time.perf_counter() - t0

    eng = ServingEngine(art_dir, buckets=(bucket,))
    imgs = np.asarray(
        jax.random.normal(jax.random.key(2), (bucket, 229, 229, 3)), np.float32
    )
    t0 = time.perf_counter()
    eng.predict(imgs)  # compile + warmup (predict returns host numpy = synced)
    warm_s = time.perf_counter() - t0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = eng.predict(imgs)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    img_s = bucket * steps / dt

    print(json.dumps({
        "metric": "serving_feature_service_images_per_sec",
        "backend": jax.default_backend(),
        "bucket": bucket,
        "latents": int(d * ef),
        "top_k": 16,
        "images_per_sec": round(img_s, 1),
        "export_seconds": round(export_s, 1),
        "first_request_seconds": round(warm_s, 1),
        "artifact_bytes": os.path.getsize(
            os.path.join(art_dir, "module.stablehlo")
        ),
        "note": "deployed AOT path incl. host round trip; kernel truth is "
                "bench.py, backbone truth is NORTHSTAR's 30.6k img/s tap "
                "forward",
    }))

    # ---- bf16 weight-quantized artifact: bytes + parity + rate -------------
    import jax.numpy as jnp

    art16 = os.path.join(
        os.environ.get("SVT_BENCH_DIR", "/tmp"), "svt_bench_serve_bf16"
    )
    t0 = time.perf_counter()
    export_feature_service(
        net, params, state, "sae_mlp", sae_params, "mixed3a", art16,
        img_shape=(229, 229, 3), top_k=16, weights_dtype=jnp.bfloat16,
    )
    export16_s = time.perf_counter() - t0
    eng16 = ServingEngine(art16, buckets=(bucket,))
    out16 = eng16.predict(imgs)  # compile + warmup
    logit_err = float(
        np.max(np.abs(out16["logits"] - out["logits"]))
        / max(np.max(np.abs(out["logits"])), 1e-9)
    )
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            eng16.predict(imgs)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    print(json.dumps({
        "metric": "serving_bf16_artifact_images_per_sec",
        "backend": jax.default_backend(),
        "bucket": bucket,
        "images_per_sec": round(bucket * steps / dt, 1),
        "export_seconds": round(export16_s, 1),
        "artifact_bytes": os.path.getsize(
            os.path.join(art16, "module.stablehlo")
        ),
        "max_rel_logit_err_vs_f32": round(logit_err, 5),
        "note": "weight-only bf16 quantization (--export_weights_dtype); "
                "compute stays f32 via type promotion",
    }))

    # ---- steering service: the intervention path's deployed rate ----------
    from sparse_vision_tpu.serve.exporter import export_steering_service

    steer_dir = os.path.join(
        os.environ.get("SVT_BENCH_DIR", "/tmp"), "svt_bench_serve_steering"
    )
    t0 = time.perf_counter()
    export_steering_service(
        net, params, state, "sae_mlp", sae_params, "mixed3a", steer_dir,
        img_shape=(229, 229, 3),
    )
    export_s = time.perf_counter() - t0
    seng = ServingEngine(steer_dir, buckets=(bucket,))
    h = int(d * ef)
    scale = np.ones((h,), np.float32)
    scale[:8] = 0.0  # a real intervention: clamp 8 latents
    seng.set_extras(scale, np.zeros((h,), np.float32))
    seng.predict(imgs)  # compile + warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            seng.predict(imgs)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    print(json.dumps({
        "metric": "serving_steering_service_images_per_sec",
        "backend": jax.default_backend(),
        "bucket": bucket,
        "latents": h,
        "images_per_sec": round(bucket * steps / dt, 1),
        "export_seconds": round(export_s, 1),
        "note": "per-latent affine steering (8 latents clamped) through the "
                "deployed artifact; same tunnel-bound request loop as the "
                "feature service",
    }))


if __name__ == "__main__":
    main()
