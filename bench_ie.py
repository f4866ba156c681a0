"""Circuit-tier benchmark: attribution-patching throughput on GoogLeNet.

Not the driver headline (bench.py is); this measures the BASELINE.json secondary
metric "compute_ie images/sec" on the flagship configuration: all 8 mixed layers with
per-layer frozen SAEs (registry expansion factors), 229px inputs.

Sections (each prints one JSON line):
- node_ie_images_per_sec            device-resident inputs (kernel truth)
- node_ie_tar_input_images_per_sec  tar-shard JPEGs -> decode pool -> prefetch ->
                                    node pass (the real-data rate, VERDICT r2 #5)
- edge_ie_images_per_sec            one pair, 64 feats/side (quick mode)
- IE_SCALE=full adds edge_ie_full_circuit: ALL 7 consecutive pairs + the loss node
  at production feature counts (hundreds/layer from the node-IE ranking) through
  the feature-chunked cotangent path, with peak-HBM reporting (VERDICT r2 #4;
  reference hottest loop compute_ie.py:589-624 at its actual scale).

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

WORK = os.environ.get("IE_BENCH_DIR", "/tmp/ie_bench")


def _peak_hbm_gb():
    stats = jax.local_devices()[0].memory_stats()
    if not stats:  # the tunneled axon runtime exposes no memory stats
        return None
    return round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)


def main():
    import numpy as np

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
    w = eng._weights  # weights are jit ARGUMENTS (not baked constants), circuit.py
    out = node_fn(w, images, labels, avgs.enc, avgs.err, avgs.out)  # compile
    jax.block_until_ready(out)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = node_fn(w, images, labels, avgs.enc, avgs.err, avgs.out)
        _ = float(out[CIRCUIT_LAYERS[0]]["error"])
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]
    print(json.dumps({
        "metric": "node_ie_images_per_sec",
        "value": round(BATCH * STEPS / dt, 2),
        "unit": "images/s",
        "layers": len(CIRCUIT_LAYERS),
    }))

    # ---- node IE from tar-shard input (decode pool + device prefetch) ---------
    # the interp/ie.py production loop reads tar shards through the same
    # decode-parallel prefetch path as every Pipeline epoch; this measures that
    # REAL-DATA rate (VERDICT r2 #5) against the device-resident number above.
    try:
        node_tar_rate = _node_ie_from_tars(eng, avgs, node_fn, BATCH)
        print(json.dumps({
            "metric": "node_ie_tar_input_images_per_sec",
            "value": round(node_tar_rate, 2),
            "unit": "images/s",
            "host_cpus": os.cpu_count(),
        }))
    except Exception as e:  # PIL missing etc. — keep the kernel numbers flowing
        print(f"tar-input node IE skipped: {e}")

    # ---- edge IE: quick mode (one pair, 64 feats/side) ------------------------
    feats = {n: list(range(64)) for n in CIRCUIT_LAYERS[:2]}
    pair_layers = list(CIRCUIT_LAYERS[:2])
    # smaller batch for the edge pass: the batched cotangent stack is
    # [chunk, B, H, W, C] and must fit HBM alongside the retained forward
    E_BATCH = 8
    e_images, e_labels = images[:E_BATCH], labels[:E_BATCH]
    e_batches = [(e_images, e_labels)]
    # amortized per-batch rate. compute_edge_ie retraces its pair functions per
    # invocation, so each call carries a trace(+cached-compile) prefix; two WARM
    # calls with different batch counts cancel it exactly:
    # rate = (N-1)*B / (t_warm(N) - t_warm(1)). A cold call1 would NOT cancel a
    # warm call2's prefix and inflate the rate (round-3 review finding).
    def _edge_call(n):
        t0 = time.perf_counter()
        eng.compute_edge_ie(e_batches * n, avgs, feats,
                            custom_layers=pair_layers, cotangent_chunk=16)
        return time.perf_counter() - t0

    _edge_call(1)  # cold: compile (discarded)
    N_EDGE = 12
    t1 = min(_edge_call(1) for _ in range(2))  # warm: trace + 1 batch
    tN = min(_edge_call(N_EDGE) for _ in range(2))  # warm: trace + N batches
    marginal = tN - t1
    # at 64 feats/side the marginal device time can sit BELOW the per-call
    # trace-overhead noise through the tunnel (round-3 queue printed 4e10
    # img/s from a negative subtraction); report null rather than noise
    noisy = marginal <= 0.05 * t1
    print(json.dumps({
        "metric": "edge_ie_images_per_sec",
        "value": None if noisy else round((N_EDGE - 1) * E_BATCH / marginal, 2),
        "unit": "images/s",
        "pair": "->".join(pair_layers),
        "features_per_side": 64,
        "note": ("marginal time below per-call trace noise; "
                 "edge_ie_full_circuit is the controlled measurement")
                if noisy else None,
    }))

    # ---- edge IE: FULL-CIRCUIT production scale (IE_SCALE=full) ---------------
    if os.environ.get("IE_SCALE") == "full":
        node = eng.compute_node_ie([(e_images, e_labels)], avgs)
        n_feats = int(os.environ.get("IE_FEATURES", "256"))
        chunk = int(os.environ.get("IE_CHUNK", "32"))
        feature_indices = {
            n: [int(i) for i in
                np.argsort(-np.abs(np.asarray(node.features[n])))[:n_feats]]
            for n in CIRCUIT_LAYERS
        }
        counts = {n: len(v) for n, v in feature_indices.items()}

        def timed_call(n):
            t0 = time.perf_counter()
            edges = eng.compute_edge_ie(
                [(e_images, e_labels)] * n, avgs, feature_indices,
                cotangent_chunk=chunk,
            )
            jax.block_until_ready(list(edges.values()))
            return time.perf_counter() - t0, edges

        t_compile1, _ = timed_call(1)  # cold: compile + 1 batch (reported)
        # steady-state marginal rate: each compute_edge_ie invocation retraces its
        # pair functions — a per-CALL overhead of ~40-180 s (tunnel-variable) that
        # production sweeps pay once over hundreds of batches. t(n) = trace + n*c;
        # warm calls at two batch counts cancel the trace term, but the trace
        # VARIANCE here is tens of seconds, so (a) the large call must carry enough
        # batches that n*c dominates the noise and (b) min-of-2 per point filters
        # the tail (round-3 measurement bug: a 2-point slope on small n reported
        # trace noise as the rate).
        timed_call(1)  # extra warmup: the remote-compile path speeds up early
        n_small, n_big = 2, int(os.environ.get("IE_FULL_BATCHES", "40"))
        t_a = min(timed_call(n_small)[0] for _ in range(2))
        tN, edges = timed_call(n_big)
        tN = min(tN, timed_call(n_big)[0])
        full_rate = (n_big - n_small) * E_BATCH / max(tN - t_a, 1e-9)
        shapes = {n: list(np.asarray(m).shape) for n, m in edges.items()}
        print(json.dumps({
            "metric": "edge_ie_full_circuit_images_per_sec",
            "value": round(full_rate, 3),
            "unit": "images/s",
            "pairs": len(CIRCUIT_LAYERS) - 1,
            "loss_node": True,
            "features_per_layer": counts,
            "cotangent_chunk": chunk,
            "batch": E_BATCH,
            "compile_plus_first_batch_s": round(t_compile1, 1),
            "per_call_trace_overhead_s": round(
                t_a - n_small * (tN - t_a) / (n_big - n_small), 1
            ),
            "peak_hbm_gb": _peak_hbm_gb(),
            "edge_matrix_shapes": shapes,
        }))


def _node_ie_from_tars(eng, avgs, node_fn, batch: int) -> float:
    """Node-IE rate with the full input pipeline: tar shards -> thread-pool JPEG
    decode -> device prefetch -> fused node pass."""
    from sparse_vision_tpu.data.datasets import load_imagenet_tars
    from sparse_vision_tpu.data.labels import remap_torch_to_tf_labels
    from sparse_vision_tpu.data.prefetch import prefetch

    tar_dir = os.path.join(WORK, "imagenet")
    n_imgs = int(os.environ.get("IE_TAR_IMAGES", "256"))
    if not os.path.isdir(tar_dir):
        from bench_northstar import make_standin_jpegs

        make_standin_jpegs(n_imgs, WORK, seed=7, prefix="train")
    ds = load_imagenet_tars(WORK, "train")
    if ds is None:
        raise RuntimeError(f"no tar shards under {tar_dir}")

    def run_epoch():
        n = 0
        out = None
        for b in prefetch(ds.batches(batch, shuffle=False, workers=None), None):
            out = node_fn(eng._weights, b.images,
                          remap_torch_to_tf_labels(b.labels),
                          avgs.enc, avgs.err, avgs.out)
            n += b.images.shape[0]
        if out is None:
            raise RuntimeError(
                f"no full batches: need >= {batch} tar images (IE_TAR_IMAGES)"
            )
        jax.block_until_ready(out[next(iter(out))]["error"])
        return n

    run_epoch()  # warm: tar index build + any residual compiles
    t0 = time.perf_counter()
    n = run_epoch()
    return n / (time.perf_counter() - t0)


if __name__ == "__main__":
    main()
