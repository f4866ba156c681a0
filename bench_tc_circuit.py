"""Transcoder-circuit edge throughput on GoogLeNet: the two-matmul edge pass
(interp/transcoder_circuit.py) at production scale, against bench_ie.py's SAE
edge-IE numbers for the same model.

SAE edge IE costs one (chunked) cotangent backward per downstream feature
group — the reference's hottest loop (compute_ie.py:589-624), measured at
10.5 img/s for the full circuit at 256 feats/layer (PARITY.md). Transcoder
edges need NO backward passes: one backbone forward + two matmuls per layer
pair, covering EVERY latent pair (h_up x h_down edge columns, not a 256-feature
subset). This bench measures that rate on the longest eligible GoogLeNet chain
(mixed4b -> 4c -> 4d -> 4e at registry expansion factors; random weights —
throughput does not depend on training).

    PYTHONPATH=/root/repo:$PYTHONPATH python bench_tc_circuit.py
"""

import json
import os
import time

from sparse_vision_tpu.utils.platform import pin_cpu_if_requested, probe_tpu_or_pin_cpu

probe_tpu_or_pin_cpu("bench_tc_circuit")
pin_cpu_if_requested()

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SVT_JAX_CACHE", os.path.expanduser("~/.cache/svt_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main():
    from sparse_vision_tpu.interp.registry import LAYER_SAE_CONFIGS
    from sparse_vision_tpu.interp.transcoder_circuit import (
        make_chain_edge_fn,
        transcoder_chains,
    )
    from sparse_vision_tpu.models.backbone import layer_dimensions, make_backbone
    from sparse_vision_tpu.models.sae import init_transcoder
    from sparse_vision_tpu.train.multilayer import transcoder_pairs

    on_tpu = jax.default_backend() != "cpu"
    batch = 32 if on_tpu else 4
    steps = 8 if on_tpu else 2

    net = make_backbone("inceptionv1", "imagenet")
    params, state = net.init(jax.random.key(0), (229, 229, 3))
    dims = layer_dimensions(net, "imagenet")
    pairs = transcoder_pairs(net, "imagenet")
    chain = max(transcoder_chains(pairs), key=len)

    tcs = []
    for k, (a, b) in enumerate(chain):
        ef = LAYER_SAE_CONFIGS[a].expansion_factor if a in LAYER_SAE_CONFIGS else 4
        tcs.append(init_transcoder(
            jax.random.key(100 + k), dims[a][-1], ef, dims[b][-1],
        ))
    hs = [t["b_enc"].shape[0] for t in tcs]
    edge_cols = sum(h1 * h2 for h1, h2 in zip(hs, hs[1:]))

    edge_fn = make_chain_edge_fn(net, chain, tcs)
    images = jax.random.normal(jax.random.key(1), (batch, 229, 229, 3))
    sums, t = edge_fn(params, state, images)  # compile + warmup
    _ = float(sums[0][0, 0])

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            sums, t = edge_fn(params, state, images)
        _ = float(sums[-1][0, 0])  # host readback forces tunnel sync
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    img_s = batch * steps / dt

    print(json.dumps({
        "metric": "transcoder_circuit_edges_images_per_sec",
        "backend": jax.default_backend(),
        "chain": [list(p) for p in chain],
        "latents_per_pair": hs,
        "edge_matrix_columns": edge_cols,
        "batch": batch,
        "images_per_sec": round(img_s, 1),
        "edge_columns_per_sec": round(img_s * edge_cols, 0),
        "note": "full h_up x h_down edge coverage, zero backward passes; "
                "compare bench_ie edge_ie_full_circuit (10.5 img/s at 256 "
                "feats/layer via chunked cotangent backwards)",
    }))


if __name__ == "__main__":
    main()
