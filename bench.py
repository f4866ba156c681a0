"""Headline benchmark: SAE-training activations (tokens) per second per chip.

The reference publishes no throughput numbers (BASELINE.md; its README has no benchmark
section), so the baseline is derived from the driver's north-star target: train a
16k-latent SAE over full-ImageNet GoogLeNet mixed3a activations on a v5e-8 in under
one hour. ImageNet train = 1,281,167 images x 28x28 spatial positions = 1.004e9
activation tokens per epoch; one epoch per hour on 8 chips requires

    1.004e9 / 3600 / 8  ≈  34,868 tokens/s/chip.

vs_baseline = measured / 34,868 (>1 = above the north-star requirement).

The benchmarked step is the full production training update on cached activations
(train/steps.py make_sae_train_step_from_acts): encode + decode + MSE/L1/NRMSE loss +
grads + ConstrainedAdam (projection + renorm) + dead-unit stats + resample schedule —
at the north-star shape: C=256 (mixed3a channels), 16,384 latents (expansion 64).

Forward+backward run through the fused Pallas kernel (ops/fused_sae.py): latents never
touch HBM, backward recomputes them per tile, bf16 MXU compute with f32 accumulation —
~2x the stock XLA path at this shape (parity tests in tests/test_fused_sae.py).
"""

import json
import os
import time

from sparse_vision_tpu.utils.platform import (
    pin_cpu_if_requested,
    probe_tpu_or_pin_cpu,
)

probe_tpu_or_pin_cpu("bench")

pin_cpu_if_requested()  # site-hook quirk: see utils/platform.py

import jax
import jax.numpy as jnp

# persistent compile cache: remote/AOT compiles of the fused scan take minutes on
# tunneled backends; cold compile happens once, repeat runs start in seconds
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SVT_JAX_CACHE", os.path.expanduser("~/.cache/svt_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main():
    from sparse_vision_tpu.models.sae import init_sae
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_step_from_acts,
    )

    from sparse_vision_tpu.train.steps import make_sae_train_multi_step

    C = 256
    EXPANSION = 64  # 16,384 latents — the north-star size
    on_tpu = jax.default_backend() != "cpu"
    TOKENS = 65536 if on_tpu else 4096  # tokens per train step
    # 40 steps per dispatch: amortizes the host-dispatch round trip, worth ~10%
    # measured on a tunneled backend (a real v5e host pays less per dispatch, but
    # deeper scans never hurt — the state stays donated on device)
    SCAN = 40 if on_tpu else 2  # microbatches fused into one dispatch (lax.scan)
    TRIPS = 2  # multi-step dispatches per timed trial

    key = jax.random.key(0)
    sae_params = init_sae("sae_mlp", key, C, EXPANSION)
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    ts = init_sae_train_state(sae_params, tx, C * EXPANSION)
    n_chips = jax.device_count()
    if n_chips > 1:
        # multi-chip: tokens sharded over a 1-D 'data' mesh, fused step under
        # shard_map (parallel/sharded_steps.py); TOKENS is the PER-STEP GLOBAL batch,
        # scaled with the chip count so each chip keeps the single-chip shard size
        from jax.sharding import NamedSharding, PartitionSpec as P

        from sparse_vision_tpu.parallel.mesh import make_mesh
        from sparse_vision_tpu.parallel.sharded_steps import (
            make_sharded_fused_train_step,
            put_sharded,
        )

        # per-step GLOBAL batch: each chip keeps the single-chip shard size
        # (CPU smoke meshes get a much smaller shard — it's a correctness path there)
        TOKENS = (TOKENS if on_tpu else 512) * n_chips
        mesh = make_mesh((n_chips,))
        step = make_sharded_fused_train_step(
            mesh, 5.0, tx, 10_000, EXPANSION, fused=on_tpu
        )
        multi = make_sae_train_multi_step(step)
        acts = jax.random.normal(jax.random.key(1), (SCAN, TOKENS, C), jnp.float32)
        ts, _ = put_sharded(mesh, ts, acts[0])
        acts = jax.device_put(acts, NamedSharding(mesh, P(None, "data", None)))
    else:
        step = make_sae_train_step_from_acts(
            "sae_mlp", 5.0, tx, 10_000, EXPANSION, fused=on_tpu
        )
        multi = make_sae_train_multi_step(step)
        acts = jax.random.normal(jax.random.key(1), (SCAN, TOKENS, C), jnp.float32)

    # warmup/compile; the final host readback of the loss is a hard device sync
    # (block_until_ready alone has proven unreliable on tunneled backends)
    ts, m = multi(ts, acts)
    _ = float(m["sae_loss"][-1])

    times = []
    for _trial in range(5):
        t0 = time.perf_counter()
        for _ in range(TRIPS):
            ts, m = multi(ts, acts)
        _ = float(jnp.vdot(ts.params["b_enc"], ts.params["b_enc"]))  # syncs final params
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]  # median trial
    STEPS = SCAN * TRIPS

    n_chips = jax.device_count()
    tokens_per_sec_per_chip = TOKENS * STEPS / dt / n_chips
    required = 1_281_167 * 28 * 28 / 3600 / 8  # north-star tokens/s/chip
    print(
        json.dumps(
            {
                "metric": "sae_train_activations_per_sec_per_chip",
                "value": round(tokens_per_sec_per_chip, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(tokens_per_sec_per_chip / required, 3),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
