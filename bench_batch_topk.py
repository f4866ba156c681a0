"""BatchTopK SAE train-step throughput: radix-bisection cutoff vs stock flat
top-k on one chip.

Shape = bench.py's SAE north-star (C=256, 16,384 latents) at k=32 — the
batch-level selection runs over a 16k-token x 16k-latent flattened matrix
(2.7e8 elements, n = 524,288 selected). The stock path sorts it
(lax.top_k + scatter); the fast path bisects the cutoff value's 32 bit
patterns with vectorized count-reductions and masks (ops/fast_batch_topk.py).
Prints one JSON line.

Run on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python bench_batch_topk.py
"""

import json
import os
import time

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested, probe_tpu_or_pin_cpu

probe_tpu_or_pin_cpu("bench_batch_topk")
pin_cpu_if_requested()

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SVT_JAX_CACHE", os.path.expanduser("~/.cache/svt_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

C, EF, K = 256, 64, 32  # 16,384 latents


def bench(fast: bool, tokens: int, scan: int, trips: int = 2) -> float:
    from sparse_vision_tpu.models.sae import init_sae
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_multi_step,
        make_sae_train_step_from_acts,
    )

    params = init_sae("batch_topk_sae", jax.random.key(0), C, EF)
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    ts = init_sae_train_state(params, tx, C * EF)
    step = make_sae_train_step_from_acts(
        "batch_topk_sae", 0.0, tx, 10_000, EF, fused=fast, topk=K
    )
    multi = make_sae_train_multi_step(step)
    xs = jax.random.normal(jax.random.key(1), (scan, tokens, C), jnp.float32)
    ts, m = multi(ts, xs)  # compile + warmup
    _ = float(m["sae_loss"][-1])
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(trips):
            ts, m = multi(ts, xs)
        _ = float(jnp.vdot(ts.params["b_enc"], ts.params["b_enc"]))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return tokens * scan * trips / dt


def main():
    on_tpu = jax.default_backend() != "cpu"
    tokens = 16_384 if on_tpu else 512
    scan = 10 if on_tpu else 2
    rows = {}
    for fast in ((True, False) if on_tpu else (False,)):
        label = "fast" if fast else "stock"
        try:
            rows[label] = bench(fast, tokens, scan)
        except Exception as e:
            rows[label] = None
            print(f"{label} failed: {type(e).__name__}: {e}")
    print(json.dumps({
        "metric": "batch_topk_train_tokens_per_sec_per_chip",
        "backend": jax.default_backend(),
        "c": C, "latents": C * EF, "k": K,
        "tokens_per_step": tokens,
        "fast_tokens_per_s": rows.get("fast") and round(rows["fast"], 0),
        "stock_tokens_per_s": rows.get("stock") and round(rows["stock"], 0),
        "fast_over_stock": (
            round(rows["fast"] / rows["stock"], 2)
            if rows.get("fast") and rows.get("stock") else None
        ),
    }))


if __name__ == "__main__":
    main()
