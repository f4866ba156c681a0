"""Tensor-parallel perf basis: per-chip rates at TP LOCAL shard shapes (one chip).

Multi-chip hardware is not reachable from this host (one v5e chip via the tunnel),
so a (2, 4)-mesh TP rate cannot be timed directly. What CAN be measured — and what
the TP projection in PARITY.md is built from — is the per-chip compute at exactly
the shapes a TP chip sees:

  - fused Pallas step at the LOCAL shard (T_local tokens, H_local = H/m latents)
    -> the per-chip compute of ops/fused_sae_tp.py (its kernels are the unchanged
       single-chip kernels on local shapes; the only extra work is the 'model' psum
       of the [T_local, C] partial reconstruction, whose bytes/step are printed)
  - stock XLA step at the same local shard
    -> the per-chip compute of the GSPMD fallback path

Each configuration prints one JSON line. Run on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python bench_tp.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SVT_JAX_CACHE", os.path.expanduser("~/.cache/svt_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

C = 256  # mixed3a channels


def bench_local(h_local: int, t_local: int, fused: bool, scan: int, trips: int = 2,
                sae_model_name: str = "sae_mlp", **step_kw):
    from sparse_vision_tpu.models.sae import init_sae
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_multi_step,
        make_sae_train_step_from_acts,
    )

    expansion = h_local // C  # local expansion so init_sae builds the local shard
    sae_params = init_sae(sae_model_name, jax.random.key(0), C, expansion)
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    ts = init_sae_train_state(sae_params, tx, h_local)
    step = make_sae_train_step_from_acts(
        sae_model_name, 5.0, tx, 10_000, expansion, fused=fused, **step_kw
    )
    multi = make_sae_train_multi_step(step)
    acts = jax.random.normal(jax.random.key(1), (scan, t_local, C), jnp.float32)
    ts, m = multi(ts, acts)  # compile + warmup
    _ = float(m["sae_loss"][-1])
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(trips):
            ts, m = multi(ts, acts)
        _ = float(jnp.vdot(ts.params["b_enc"], ts.params["b_enc"]))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return t_local * scan * trips / dt


def main():
    on_tpu = jax.default_backend() != "cpu"
    scan = 20 if on_tpu else 2
    # (global latents, model-axis size, data-axis size) for a v5e-8 (2, 4) mesh at
    # the production 32k-token global step; 64k latents is TP's raison d'etre
    # (SURVEY §2.2: params + Adam moments outgrow one chip)
    configs = [
        (16384, 4, 2, 32768),
        (65536, 4, 2, 32768),
    ]
    if not on_tpu:  # CPU smoke: tiny shapes, stock only
        configs = [(1024, 4, 2, 512)]
    for h_global, m, n_data, tokens_global in configs:
        h_l = h_global // m
        t_l = tokens_global // n_data
        rows = {}
        for fused in ((True, False) if on_tpu else (False,)):
            label = "fused" if fused else "stock"
            try:
                rows[label] = bench_local(h_l, t_l, fused, scan)
            except Exception as e:
                rows[label] = None
                print(f"{label} @ H_l={h_l} failed: {type(e).__name__}: {e}")
        # 'model' psum payload of the TP fused step per train step (partial recon
        # [T_local, C] f32; ring all-reduce moves ~2(m-1)/m x payload per chip)
        psum_bytes = t_l * C * 4
        ici_bytes_per_chip = int(2 * (m - 1) / m * psum_bytes)
        print(json.dumps({
            "metric": "tp_local_shard_tokens_per_sec",
            "h_global": h_global,
            "model_axis": m,
            "data_axis": n_data,
            "h_local": h_l,
            "t_local": t_l,
            "fused_tokens_per_s": rows.get("fused") and round(rows["fused"], 0),
            "stock_tokens_per_s": rows.get("stock") and round(rows["stock"], 0),
            "fused_over_stock": (
                round(rows["fused"] / rows["stock"], 2)
                if rows.get("fused") and rows.get("stock") else None
            ),
            "model_psum_bytes_per_step_per_chip": ici_bytes_per_chip,
        }))

    # per-variant TP local-shard rates at the 16k-global (2, 4) config. The TP
    # ops run the unchanged single-chip math on local shapes, so the per-chip
    # compute is timeable here: matryoshka runs the snapshot-union boundary set
    # a chip of that mesh sees (global prefixes (1024, 4096, 16384) clip to
    # (1024, 4096) on H_local=4096 -> local fractions (0.25, 1.0)); TopK runs
    # the local selection + gather decode (the m*k candidate all-gather and
    # re-top-k are ICI work, ~16 MB/step, not timeable from one chip).
    if on_tpu:
        h_l, t_l = 4096, 16384
        for name, kw in [
            ("matryoshka_sae", dict(matryoshka_prefixes=(0.25, 1.0))),
            ("topk_sae", dict(topk=32)),
            ("topk_sae", dict(topk=32, topk_approx=True)),
        ]:
            try:
                rate = bench_local(h_l, t_l, True, scan, sae_model_name=name, **kw)
            except Exception as e:
                print(f"{name} {kw} failed: {type(e).__name__}: {e}")
                continue
            print(json.dumps({
                "metric": "tp_local_shard_tokens_per_sec_variant",
                "variant": name,
                "opts": {k: str(v) for k, v in kw.items()},
                "h_local": h_l, "t_local": t_l,
                "tokens_per_s": round(rate, 0),
            }))


if __name__ == "__main__":
    main()
