"""Vmapped-sweep throughput: N same-shape SAEs in one step vs N sequential runs.

The reference parallelizes hyperparameter sweeps as N independent cluster jobs
(README.md:13-15); train/sweep_vmap.py batches them into one vmapped jitted step.
This bench quantifies the win on one chip at a realistic sweep shape (mixed3a-
sized SAEs: C=256, expansion 8 -> 2048 latents — small enough that a single SAE
underutilizes the MXU, the exact regime sweeps live in).

Prints one JSON line per configuration:
  combo_tokens_per_s_sweep     N combos trained together (vmapped step)
  combo_tokens_per_s_seq       the same N combos trained one-after-another
  sweep_over_seq               the sweep speedup

Run on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python bench_sweep.py
"""

import json
import os
import time

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested, probe_tpu_or_pin_cpu

probe_tpu_or_pin_cpu("bench_sweep")
pin_cpu_if_requested()

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SVT_JAX_CACHE", os.path.expanduser("~/.cache/svt_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

C = 256  # mixed3a channels
EF = 8   # registry expansion factor for mixed3a (interp/registry.py)


def _median_time(fn, reps: int = 5) -> float:
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def bench_config(n_combos: int, tokens: int, scan: int, trips: int):
    from sparse_vision_tpu.models.sae import init_sae
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_multi_step,
        make_sae_train_step_from_acts,
    )
    from sparse_vision_tpu.train.sweep_vmap import (
        make_sae_sweep_step,
        stack_sae_states,
    )

    lambdas = [0.1 * (i + 1) for i in range(n_combos)]
    lrs = [1e-3] * n_combos
    h = C * EF
    acts = jax.random.normal(jax.random.key(1), (scan, tokens, C), jnp.float32)

    # --- vmapped sweep ---
    states = []
    for i in range(n_combos):
        tx = optim.get_optimizer("constrained_adam", lrs[i])
        p = init_sae("sae_mlp", jax.random.key(i), C, EF)
        states.append(init_sae_train_state(p, tx, h, seed=i))
    ss = stack_sae_states(states)
    sweep_step = make_sae_sweep_step(
        "sae_mlp", lambdas, lrs, "constrained_adam", 10_000, EF
    )
    sweep_multi = make_sae_train_multi_step(sweep_step)
    ss, m = sweep_multi(ss, acts)  # compile + warmup
    _ = float(m["sae_loss"][-1, 0])

    def run_sweep():
        nonlocal ss
        for _ in range(trips):
            ss, _m = sweep_multi(ss, acts)
        jax.block_until_ready(ss.params["b_enc"])

    dt_sweep = _median_time(run_sweep)
    sweep_rate = n_combos * tokens * scan * trips / dt_sweep

    # --- fused vmapped sweep (vmap of pallas_call: combo axis = outer grid
    # dim) — the alternative when the stock batched matmuls underfill the MXU
    fused_rate = None
    try:
        fstates = []
        for i in range(n_combos):
            tx = optim.get_optimizer("constrained_adam", lrs[i])
            p = init_sae("sae_mlp", jax.random.key(i), C, EF)
            fstates.append(init_sae_train_state(p, tx, h, seed=i))
        fss = stack_sae_states(fstates)
        fused_step = make_sae_sweep_step(
            "sae_mlp", lambdas, lrs, "constrained_adam", 10_000, EF, fused=True
        )
        fused_multi = make_sae_train_multi_step(fused_step)
        fss, fm = fused_multi(fss, acts)  # compile + warmup
        _ = float(fm["sae_loss"][-1, 0])

        def run_fused():
            nonlocal fss
            for _ in range(trips):
                fss, _m = fused_multi(fss, acts)
            jax.block_until_ready(fss.params["b_enc"])

        fused_rate = n_combos * tokens * scan * trips / _median_time(run_fused)
    except Exception as e:  # fused path unavailable at this shape
        print(f"fused sweep skipped: {e}")

    # --- sequential baseline: same combos one-after-another (ONE compiled step
    # reused across combos — the best case for the job-per-combo strategy on a
    # single chip; the reference's cluster jobs additionally re-pay startup,
    # data, and backbone costs that are excluded here) ---
    tx0 = optim.get_optimizer("constrained_adam", lrs[0])
    seq_step = make_sae_train_step_from_acts(
        "sae_mlp", lambdas[0], tx0, 10_000, EF, fused=False
    )
    seq_multi = make_sae_train_multi_step(seq_step)
    seq_states = [
        init_sae_train_state(init_sae("sae_mlp", jax.random.key(i), C, EF), tx0, h,
                             seed=i)
        for i in range(n_combos)
    ]
    seq_states = [seq_multi(ts, acts)[0] for ts in seq_states]  # warmup each
    jax.block_until_ready(seq_states[-1].params["b_enc"])

    def run_seq():
        for i in range(n_combos):
            ts = seq_states[i]
            for _ in range(trips):
                ts, _m = seq_multi(ts, acts)
            seq_states[i] = ts
        jax.block_until_ready(seq_states[-1].params["b_enc"])

    dt_seq = _median_time(run_seq)
    seq_rate = n_combos * tokens * scan * trips / dt_seq
    return sweep_rate, fused_rate, seq_rate


def main():
    on_tpu = jax.default_backend() != "cpu"
    scan = 20 if on_tpu else 2
    trips = 2
    configs = [(4, 4096), (8, 4096), (16, 4096)] if on_tpu else [(4, 256)]
    for n_combos, tokens in configs:
        sweep_rate, fused_rate, seq_rate = bench_config(
            n_combos, tokens, scan, trips)
        print(json.dumps({
            "metric": "sweep_combo_tokens_per_sec",
            "backend": jax.default_backend(),
            "n_combos": n_combos,
            "tokens_per_step": tokens,
            "latents": C * EF,
            "combo_tokens_per_s_sweep": round(sweep_rate, 0),
            "combo_tokens_per_s_sweep_fused": (
                round(fused_rate, 0) if fused_rate else None),
            "combo_tokens_per_s_seq": round(seq_rate, 0),
            "sweep_over_seq": round(sweep_rate / seq_rate, 2),
            "fused_sweep_over_seq": (
                round(fused_rate / seq_rate, 2) if fused_rate else None),
            "note": "seq baseline excludes the per-job startup/data/backbone "
                    "costs the sweep amortizes; it is the per-token compute "
                    "comparison only",
        }))


if __name__ == "__main__":
    main()
