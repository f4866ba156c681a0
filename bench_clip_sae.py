"""CLIP-tower family benchmark: tap forward rate + SAE-on-CLIP train rate.

The ViT/CLIP family's first chip perf rows (round-3 verdict item 1): a
production CLIP ViT-B/16 tower at its HF 224px convention,

- clip_tap_forward_images_per_sec   jitted forward to a mid-tower residual tap
  (the activation-dump path of a CLIP-SAE run, train/pipeline.py dump loop)
- clip_sae_train_tokens_per_sec     fused SAE training step on [T, 768]
  residual-stream tokens at expansion 8 (the train phase on cached CLIP
  activations — the bench.py kernel at this family's width)

Prints one JSON line per section. Run on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python bench_clip_sae.py
"""

import json
import os
import time

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested, probe_tpu_or_pin_cpu

probe_tpu_or_pin_cpu("bench_clip_sae")
pin_cpu_if_requested()

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SVT_JAX_CACHE", os.path.expanduser("~/.cache/svt_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

MODEL = os.environ.get("CLIP_BENCH_MODEL", "clip_vit_b16")
TAP = os.environ.get("CLIP_BENCH_TAP", "block6")
BATCH = int(os.environ.get("CLIP_BENCH_BATCH", "32"))
EF = int(os.environ.get("CLIP_BENCH_EF", "8"))


def main():
    from sparse_vision_tpu.models.backbone import (
        get_sae_input_size,
        init_backbone,
        make_backbone,
    )

    net = make_backbone(MODEL, "imagenet")
    params, state = init_backbone(net, jax.random.key(0), "imagenet")
    dim = get_sae_input_size(net, "imagenet", TAP)
    side = net.input_size[0]

    @jax.jit
    def tap_fwd(images):
        _, taps, _ = net.apply(params, images, state=state, stop_at=TAP)
        return taps[TAP]

    images = jax.random.normal(jax.random.key(1), (BATCH, side, side, 3))
    act = tap_fwd(images)  # compile
    jax.block_until_ready(act)
    n_tok_per_img = act.shape[1]

    steps = 8
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            act = tap_fwd(images)
        jax.block_until_ready(act)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]
    print(json.dumps({
        "metric": "clip_tap_forward_images_per_sec",
        "value": round(BATCH * steps / dt, 2),
        "unit": "images/s",
        "model": MODEL,
        "tap": TAP,
        "tokens_per_image": int(n_tok_per_img),
        "batch": BATCH,
    }))

    # ---- SAE training on CLIP residual tokens (expansion 8) -------------------
    from sparse_vision_tpu.models.sae import init_sae
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_multi_step,
        make_sae_train_step_from_acts,
    )

    tokens = int(os.environ.get("CLIP_BENCH_TOKENS", "32768"))
    scan = 4
    sae_params = init_sae("sae_mlp", jax.random.key(2), dim, EF)
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    ts = init_sae_train_state(sae_params, tx, dim * EF)
    fused = jax.default_backend() != "cpu"  # Pallas fused kernel on the chip
    step = make_sae_train_step_from_acts("sae_mlp", 5.0, tx, 10_000, EF,
                                         fused=fused)
    multi = make_sae_train_multi_step(step)
    xs = jax.random.normal(jax.random.key(3), (scan, tokens, dim), jnp.float32)
    ts, m = multi(ts, xs)  # compile + warmup
    _ = float(m["sae_loss"][-1])
    trips = 3
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(trips):
            ts, m = multi(ts, xs)
        _ = float(jnp.vdot(ts.params["b_enc"], ts.params["b_enc"]))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    print(json.dumps({
        "metric": "clip_sae_train_tokens_per_sec",
        "value": round(tokens * scan * trips / dt, 1),
        "unit": "tokens/s",
        "d_model": dim,
        "latents": dim * EF,
        "tokens_per_step": tokens,
        "fused": fused,
    }))


if __name__ == "__main__":
    main()
