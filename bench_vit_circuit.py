"""ViT/CLIP circuit-tier benchmark: attribution patching on ATTENTION taps.

Production shape: CLIP ViT-B/16 split-block tower (12 blocks, dim 768, 224px,
197 tokens), frozen SAEs (expansion 8 -> 6,144 latents) at four attention-out
taps — the Kissane-style attention-SAE circuit setting the round-3 split
variants were built for. Prints one JSON line per section:

- vit_node_ie_images_per_sec  all four taps in ONE fused jit per batch
  (multi-tap backward + per-layer decoder vjp, interp/circuit.py:186-214)
- vit_edge_ie_images_per_sec  one attention-tap pair, 64 feats/side, through
  the batched-cotangent edge pass (the reference's per-feature
  backward(retain_graph) loop as a single XLA computation)

Run on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python bench_vit_circuit.py
"""

import json
import os
import time

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested, probe_tpu_or_pin_cpu

probe_tpu_or_pin_cpu("bench_vit_circuit")
pin_cpu_if_requested()

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SVT_JAX_CACHE", os.path.expanduser("~/.cache/svt_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

MODEL = os.environ.get("VIT_CIRCUIT_MODEL", "clip_vit_b16_split")
TAPS = os.environ.get(
    "VIT_CIRCUIT_TAPS", "block2_attn,block5_attn,block8_attn,block11_attn"
).split(",")
EF = int(os.environ.get("VIT_CIRCUIT_EF", "8"))
BATCH = int(os.environ.get("VIT_CIRCUIT_BATCH", "16"))
STEPS = 8


def main():
    from sparse_vision_tpu.interp.circuit import CircuitEngine, FrozenSAE
    from sparse_vision_tpu.models.backbone import (
        get_sae_input_size,
        init_backbone,
        make_backbone,
    )
    from sparse_vision_tpu.models.sae import init_sae
    from sparse_vision_tpu.ops.losses import get_criterion

    net = make_backbone(MODEL, "imagenet")
    params, state = init_backbone(net, jax.random.key(0), "imagenet")
    dim = get_sae_input_size(net, "imagenet", TAPS[0])
    saes = {
        n: FrozenSAE("sae_mlp", init_sae("sae_mlp", jax.random.key(i + 1), dim, EF), EF)
        for i, n in enumerate(TAPS)
    }
    eng = CircuitEngine(net, params, saes, get_criterion("cross_entropy"),
                        state=state or None)

    side = net.input_size[0]
    images = jax.random.normal(jax.random.key(5), (BATCH, side, side, 3))
    labels = jax.random.randint(jax.random.key(6), (BATCH,), 0, 1000)

    avgs = eng.compute_averages([(images, labels)])
    node_fn = eng._node_batch
    w = eng._weights  # weights are jit ARGUMENTS (not baked constants) — see circuit.py
    out = node_fn(w, images, labels, avgs.enc, avgs.err, avgs.out)  # compile
    jax.block_until_ready(out)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = node_fn(w, images, labels, avgs.enc, avgs.err, avgs.out)
        _ = float(out[TAPS[0]]["error"])
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]
    print(json.dumps({
        "metric": "vit_node_ie_images_per_sec",
        "value": round(BATCH * STEPS / dt, 2),
        "unit": "images/s",
        "model": MODEL,
        "taps": len(TAPS),
        "latents_per_tap": dim * EF,
        "batch": BATCH,
    }))

    # edge IE: one attention-tap pair, 64 feats/side. Same marginal-rate
    # protocol as bench_ie.py (compute_edge_ie retraces per invocation; two
    # warm calls at different batch counts cancel the trace prefix).
    feats = {TAPS[0]: list(range(64)), TAPS[1]: list(range(64))}
    e_batch = max(BATCH // 2, 4)
    e_imgs, e_labs = images[:e_batch], labels[:e_batch]

    def edge_call(n):
        t0 = time.perf_counter()
        eng.compute_edge_ie([(e_imgs, e_labs)] * n, avgs, feats,
                            custom_layers=TAPS[:2], cotangent_chunk=16)
        return time.perf_counter() - t0

    edge_call(1)  # cold: compile
    n_big = int(os.environ.get("VIT_EDGE_BATCHES", "12"))
    t1 = min(edge_call(1) for _ in range(2))
    tn = min(edge_call(n_big) for _ in range(2))
    marginal = tn - t1
    noisy = marginal <= 0.05 * t1
    print(json.dumps({
        "metric": "vit_edge_ie_images_per_sec",
        "value": None if noisy else round((n_big - 1) * e_batch / marginal, 2),
        "unit": "images/s",
        "pair": "->".join(TAPS[:2]),
        "features_per_side": 64,
        "batch": e_batch,
        "note": "marginal time below per-call trace noise" if noisy else None,
    }))


if __name__ == "__main__":
    main()
