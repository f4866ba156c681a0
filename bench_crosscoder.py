"""Crosscoder kernel throughput: fused Pallas vs stock XLA on one chip.

Shape = a production 14x14 GoogLeNet block crosscoder (mixed4a..mixed4e:
C = 512/512/512/528/832, ΣC = 2896 — models/googlenet.py INCEPTION_SPECS)
anchored at mixed4a with expansion 16 -> 8,192 shared latents, 16k tokens/step
— the crosscoder twin of bench_transcoder.py. Prints one JSON line.

Run on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python bench_crosscoder.py
"""

import json
import os
import time

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested, probe_tpu_or_pin_cpu

probe_tpu_or_pin_cpu("bench_crosscoder")
pin_cpu_if_requested()

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SVT_JAX_CACHE", os.path.expanduser("~/.cache/svt_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

DIMS = (512, 512, 512, 528, 832)  # mixed4a..mixed4e output channels
EF = 16  # anchored at mixed4a: h = 8,192 shared latents


def bench(fused: bool, tokens: int, scan: int, trips: int = 2) -> float:
    from sparse_vision_tpu.models.crosscoder import init_crosscoder
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.crosscoder import (
        make_crosscoder_multi_step,
        make_crosscoder_train_step_from_acts,
    )
    from sparse_vision_tpu.train.steps import init_sae_train_state

    params = init_crosscoder(jax.random.key(0), DIMS, EF)
    tx = optim.get_optimizer("adam", 1e-3)
    ts = init_sae_train_state(params, tx, DIMS[0] * EF)
    step = make_crosscoder_train_step_from_acts(5.0, tx, 10_000, EF, fused=fused)
    multi = make_crosscoder_multi_step(step)
    stacks = tuple(
        jax.random.normal(jax.random.key(1 + i), (scan, tokens, d), jnp.float32)
        for i, d in enumerate(DIMS)
    )
    ts, m = multi(ts, stacks)  # compile + warmup
    _ = float(m["sae_loss"][-1])
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(trips):
            ts, m = multi(ts, stacks)
        _ = float(jnp.vdot(ts.params["b_enc"], ts.params["b_enc"]))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return tokens * scan * trips / dt


def main():
    on_tpu = jax.default_backend() != "cpu"
    tokens = 16_384 if on_tpu else 256
    scan = 10 if on_tpu else 2
    rows = {}
    for fused in ((True, False) if on_tpu else (False,)):
        label = "fused" if fused else "stock"
        try:
            rows[label] = bench(fused, tokens, scan)
        except Exception as e:
            rows[label] = None
            print(f"{label} failed: {type(e).__name__}: {e}")
    print(json.dumps({
        "metric": "crosscoder_train_tokens_per_sec_per_chip",
        "backend": jax.default_backend(),
        "layers": len(DIMS), "sum_c": sum(DIMS), "latents": DIMS[0] * EF,
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
