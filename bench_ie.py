"""Circuit-tier benchmark: attribution-patching node IE throughput on GoogLeNet.

Not the driver headline (bench.py is); this measures the BASELINE.json secondary
metric "compute_ie images/sec" on the flagship configuration: all 8 mixed layers with
per-layer frozen SAEs (registry expansion factors), 229px inputs.

The reference's node-IE pass runs 1 clean nnsight trace + 8 intervened traces with
full backprops per batch (compute_ie.py:392-453). Here it is ONE fused jit per batch:
a single multi-tap backward for all clean layer gradients plus one decoder vjp per
layer (proved gradient-equivalent in tests/test_patching.py).
"""

import json
import os
import time

import jax

# persistent compile cache (see bench.py / CLAUDE.md): compute_edge_ie retraces its
# pair functions per invocation and remote AOT compiles take minutes otherwise
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SVT_JAX_CACHE", os.path.expanduser("~/.cache/svt_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main():
    from sparse_vision_tpu.data.labels import remap_torch_to_tf_labels
    from sparse_vision_tpu.interp.circuit import CircuitEngine
    from sparse_vision_tpu.interp.registry import CIRCUIT_LAYERS, load_frozen_sae
    from sparse_vision_tpu.models.backbone import layer_dimensions, make_backbone
    from sparse_vision_tpu.ops.losses import get_criterion

    BATCH = 32
    STEPS = 8

    net = make_backbone("inceptionv1", "imagenet")
    params, state = net.init(jax.random.key(0), (229, 229, 3))
    dims = layer_dimensions(net, "imagenet")
    saes = {n: load_frozen_sae(n, dims[n][-1]) for n in CIRCUIT_LAYERS}
    eng = CircuitEngine(net, params, saes, get_criterion("cross_entropy"), state=state)

    images = jax.random.normal(jax.random.key(1), (BATCH, 229, 229, 3))
    labels = remap_torch_to_tf_labels(
        jax.random.randint(jax.random.key(2), (BATCH,), 0, 1000)
    )

    avgs = eng.compute_averages([(images, labels)])  # also compiles the tap pass
    node_fn = eng._node_batch
    out = node_fn(images, labels, avgs.enc, avgs.err, avgs.out)  # compile
    jax.block_until_ready(out)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = node_fn(images, labels, avgs.enc, avgs.err, avgs.out)
        _ = float(out[CIRCUIT_LAYERS[0]]["error"])
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]

    # edge IE on one mixed3a->mixed3b pair, top-64 features per side — the
    # reference's hottest loop (per-feature backward with retain_graph,
    # compute_ie.py:589-624) runs here as ONE batched-cotangent vjp per pair
    import numpy as np

    feats = {n: list(range(64)) for n in CIRCUIT_LAYERS[:2]}
    pair_layers = list(CIRCUIT_LAYERS[:2])
    # smaller batch for the edge pass: the batched cotangent stack is
    # [chunk, B, H, W, C] and must fit HBM alongside the retained forward
    E_BATCH = 8
    e_images, e_labels = images[:E_BATCH], labels[:E_BATCH]
    e_batches = [(e_images, e_labels)]
    # amortized per-batch rate within ONE call (compute_edge_ie traces its pair
    # functions per invocation; production sweeps hundreds of batches per call)
    t0 = time.perf_counter()
    _ = eng.compute_edge_ie(e_batches, avgs, feats, custom_layers=pair_layers,
                            cotangent_chunk=16)  # compile + 1 batch
    t1 = time.perf_counter() - t0
    N_EDGE = 6
    t0 = time.perf_counter()
    edges = eng.compute_edge_ie(e_batches * N_EDGE, avgs, feats,
                                custom_layers=pair_layers, cotangent_chunk=16)
    tN = time.perf_counter() - t0
    edge_rate = (N_EDGE - 1) * E_BATCH / max(tN - t1, 1e-9) if tN > t1 else (
        N_EDGE * E_BATCH / tN)
    print(
        json.dumps(
            {
                "metric": "edge_ie_images_per_sec",
                "value": round(edge_rate, 2),
                "unit": "images/s",
                "pair": "->".join(pair_layers),
                "features_per_side": 64,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "node_ie_images_per_sec",
                "value": round(BATCH * STEPS / dt, 2),
                "unit": "images/s",
                "layers": len(CIRCUIT_LAYERS),
            }
        )
    )


if __name__ == "__main__":
    main()
