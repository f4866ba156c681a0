"""Firing-aware crosscoder diffing readout (fixes the phase_c contamination).

phase_c_diffing (run_crosscoder_heal.py) classified shared-vs-specific over
ALL latents using a decoder-norm "alive" test — but dead latents keep their
near-init decoder rows (flat ~1/L norm profile), so with a 98.7%-dead run the
summary degenerates to "everything shared". This script recomputes the
readout over latents that actually FIRE: restore the healed checkpoint,
stream a block of the aligned rms-normalized mixed4a..4e caches, compute the
shared code, and summarize the per-layer decoder-norm shares of the firing
population only. Overwrites docs/crosscoder_diffing_r5.json, keeping the
full-population numbers under `all_latents` for transparency.

CPU is fine (one encoder matmul): JAX_PLATFORMS=cpu is forced below.
Run: PYTHONPATH=/root/repo:$PYTHONPATH python r5_diffing_alive.py
Env: HEAL_* as for run_crosscoder_heal (defaults match the chip run),
     DIFF_TOKENS=32768
"""

from __future__ import annotations

import json
import os

os.environ["HEAL_CHILD"] = "1"  # reuse heal's cfg builder without its probe
os.environ["JAX_PLATFORMS"] = "cpu"

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested

pin_cpu_if_requested()

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
TOKENS = int(os.environ.get("DIFF_TOKENS", "32768"))


def main() -> int:
    from run_crosscoder_heal import FULL_EPOCHS, base_cfg

    import dataclasses

    from sparse_vision_tpu.data.activation_cache import ActivationCache
    from sparse_vision_tpu.train.pipeline import Pipeline

    lam = float(os.environ.get("HEAL_SKIP_SWEEP", "15"))
    cfg = dataclasses.replace(base_cfg(FULL_EPOCHS, lam),
                              sae_checkpoint_epoch=FULL_EPOCHS, training=False)
    pipe = Pipeline(cfg)
    params = jax.device_get(pipe.ts.params)
    layers = (cfg.sae_layer,) + tuple(cfg.crosscoder_layers.split(","))
    n_layers = len(layers)

    # one aligned block per layer (identical shard geometry/token order —
    # dump_activations_multi contract), rms-normalized like training
    xs = []
    for layer in layers:
        cache = ActivationCache(pipe._cache_dir(layer))
        block = next(iter(cache.batches(TOKENS, shuffle=False, prefetch=False)))
        xs.append(np.asarray(block, np.float32) / pipe.input_scale_for(layer))

    pre = params["b_enc"].astype(np.float32).copy()
    for i, x in enumerate(xs):
        pre = pre + x @ params[f"W_enc_{i}"].astype(np.float32)
    z = np.maximum(pre, 0.0)  # [T, h]
    fire_counts = (z > 0).sum(axis=0)
    alive = fire_counts > 0
    mean_act = z.mean(axis=0)

    norms = np.stack([np.linalg.norm(params[f"W_dec_{i}"].astype(np.float32),
                                     axis=1) for i in range(n_layers)], axis=1)
    total = norms.sum(axis=1)  # [h]
    shares = norms / np.maximum(total[:, None], 1e-12)

    def summarize(mask: np.ndarray) -> dict:
        s = shares[mask]
        mx = s.max(axis=1)
        am = s.argmax(axis=1)
        return {
            "n": int(mask.sum()),
            "n_shared_maxshare_lt_0.4": int((mx < 0.4).sum()),
            "n_specific_maxshare_gt_0.6": int((mx > 0.6).sum()),
            "specific_per_layer": {
                l: int(((mx > 0.6) & (am == i)).sum())
                for i, l in enumerate(layers)},
            "mean_share_per_layer": {
                l: round(float(s[:, i].mean()), 4)
                for i, l in enumerate(layers)},
            "max_share_quantiles": {
                str(q): round(float(np.quantile(mx, q)), 4)
                for q in (0.1, 0.25, 0.5, 0.75, 0.9)} if len(s) else {},
        }

    out = {
        "lambda": lam, "input_norm": "rms", "epochs": FULL_EPOCHS,
        "n_latents": int(norms.shape[0]),
        "probe_tokens": TOKENS,
        "n_alive_firing": int(alive.sum()),
        "alive_definition": f"fires on >=1 of {TOKENS} aligned cached tokens",
        "union_L0_per_token_mean": round(float((z > 0).sum(axis=1).mean()), 2),
        "alive_latents": summarize(alive),
        "all_latents": summarize(np.ones_like(alive)),
        "top_fire_fraction": round(float(
            np.sort(fire_counts)[-max(1, alive.sum() // 10):].sum()
            / max(fire_counts.sum(), 1)), 4),
        "mean_act_alive_quantiles": {
            str(q): round(float(np.quantile(mean_act[alive], q)), 5)
            for q in (0.1, 0.5, 0.9)} if alive.any() else {},
        "note": "firing-aware rewrite of the phase_c summary: dead latents "
                "keep near-init (flat ~1/L) decoder profiles, so the "
                "all-latent view always reads 'shared'",
    }
    path = os.path.join(REPO, "docs", "crosscoder_diffing_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
