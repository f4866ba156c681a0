"""Transcoder kernel throughput: fused Pallas vs stock XLA on one chip.

Shape = the production circuit pair mixed3a -> mixed3b (C_in=256, C_out=480,
28x28 both, expansion 64 -> 16,384 latents, 32k tokens/step) — the transcoder
twin of bench.py's SAE north-star shape. Prints one JSON line per path.

Run on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python bench_transcoder.py
"""

import json
import os
import time

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested, probe_tpu_or_pin_cpu

probe_tpu_or_pin_cpu("bench_transcoder")
pin_cpu_if_requested()

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SVT_JAX_CACHE", os.path.expanduser("~/.cache/svt_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

C_IN, C_OUT, EF = 256, 480, 64  # mixed3a -> mixed3b, 16,384 latents


def bench(fused: bool, tokens: int, scan: int, trips: int = 2) -> float:
    from sparse_vision_tpu.models.sae import init_transcoder
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import init_sae_train_state
    from sparse_vision_tpu.train.transcoder import (
        make_transcoder_multi_step,
        make_transcoder_train_step_from_acts,
    )

    params = init_transcoder(jax.random.key(0), C_IN, EF, C_OUT)
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    ts = init_sae_train_state(params, tx, C_IN * EF)
    step = make_transcoder_train_step_from_acts(5.0, tx, 10_000, EF, fused=fused)
    multi = make_transcoder_multi_step(step)
    xs = jax.random.normal(jax.random.key(1), (scan, tokens, C_IN), jnp.float32)
    ys = jax.random.normal(jax.random.key(2), (scan, tokens, C_OUT), jnp.float32)
    ts, m = multi(ts, xs, ys)  # compile + warmup
    _ = float(m["sae_loss"][-1])
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(trips):
            ts, m = multi(ts, xs, ys)
        _ = float(jnp.vdot(ts.params["b_enc"], ts.params["b_enc"]))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return tokens * scan * trips / dt


def main():
    on_tpu = jax.default_backend() != "cpu"
    tokens = 32_768 if on_tpu else 512
    scan = 20 if on_tpu else 2
    rows = {}
    for fused in ((True, False) if on_tpu else (False,)):
        label = "fused" if fused else "stock"
        try:
            rows[label] = bench(fused, tokens, scan)
        except Exception as e:
            rows[label] = None
            print(f"{label} failed: {type(e).__name__}: {e}")
    print(json.dumps({
        "metric": "transcoder_train_tokens_per_sec_per_chip",
        "backend": jax.default_backend(),
        "c_in": C_IN, "c_out": C_OUT, "latents": C_IN * EF,
        "tokens_per_step": tokens,
        "fused_tokens_per_s": rows.get("fused") and round(rows["fused"], 0),
        "stock_tokens_per_s": rows.get("stock") and round(rows["stock"], 0),
        "fused_over_stock": (
            round(rows["fused"] / rows["stock"], 2)
            if rows.get("fused") and rows.get("stock") else None
        ),
    }))


if __name__ == "__main__":
    main()
