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
import time

import jax


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
