"""IE run orchestration: wires the Pipeline to the CircuitEngine, with artifact
persistence — the mode dispatch of the reference's deploy_model IE branch
(model_pipeline.py:1366-1407) plus the IE class's save/load plumbing
(compute_ie.py:57-72, 217-226, 314-337, 465-471).

Modes (cfg.compute_ie):
  "1"  dataset averages per layer  -> averages.npz + sparsity/dead-units CSVs
  "2"  node IE                     -> node_ie.npz (needs averages)
  "3"  edge IE                     -> edge_ie.npz (needs averages + node IE)
  "4i" faithfulness at thresholds[i] (model_pipeline.py:1403-1405) -> faithfulness.csv
       rows for both the SAE-circuit and model-neuron variants + threshold plot

For GoogLeNet/InceptionV1 the circuit spans the 8 mixed layers with per-layer frozen
SAEs from the registry (compute_ie.py:52, 64-72); for any other backbone the circuit is
the single configured sae_layer with the pipeline's current SAE — a generalization the
reference does not have (its IE code is GoogLeNet-only, compute_ie.py:9).
"""

from __future__ import annotations

import csv
import os
from typing import Optional

import jax
import numpy as np

from sparse_vision_tpu.interp.circuit import (
    FAITHFULNESS_THRESHOLDS,
    Averages,
    CircuitEngine,
    FrozenSAE,
    NodeIE,
)


def _ie_dir(pipeline) -> str:
    d = pipeline.paths["ie_related_quantities"]
    os.makedirs(d, exist_ok=True)
    return d


def build_engine(pipeline) -> CircuitEngine:
    cfg = pipeline.cfg
    if cfg.model_name in ("inceptionv1", "googlenet"):
        from sparse_vision_tpu.interp.registry import (
            CIRCUIT_LAYERS,
            layer_ckpt_dir,
            load_frozen_sae,
        )
        from sparse_vision_tpu.models.backbone import layer_dimensions

        dims = layer_dimensions(pipeline.net, cfg.dataset_name)
        saes = {}
        missing = []
        for name in CIRCUIT_LAYERS:
            # the directory Pipeline used when this layer's SAE was trained with the
            # registry hyperparameters (sae_layer=name run)
            ckpt_dir = layer_ckpt_dir(
                pipeline.paths["checkpoints"], name, cfg.sae_model_name
            )
            has_ckpt = os.path.isdir(ckpt_dir)
            if not has_ckpt:
                missing.append(name)
            saes[name] = load_frozen_sae(
                name, dims[name][-1], cfg.sae_model_name,
                checkpoint_dir=ckpt_dir if has_ckpt else None,
            )
        if missing:
            print(
                "WARNING: no trained SAE checkpoints for layers "
                f"{missing} under {pipeline.paths['checkpoints']} — circuit "
                "discovery will run on RANDOMLY-INITIALIZED SAEs and produce "
                "meaningless artifacts. Train per-layer SAEs first."
            )
    else:
        saes = {
            cfg.sae_layer: FrozenSAE(
                cfg.sae_model_name,
                jax.lax.stop_gradient(pipeline.ts.params),
                cfg.sae_expansion_factor,
            )
        }
    return CircuitEngine(
        pipeline.net, pipeline.frozen_params, saes, pipeline.criterion,
        state=pipeline.net_state,
    )


def _batches(pipeline):
    """IE uses the train dataset (compute_ie.py:49-51), labels translated for
    GoogLeNet's old-convention ids (utils.py:2072-2122) when on ImageNet.

    Batches route through the Pipeline's decode-parallel + device-prefetch path
    (pipeline._batches: thread-pool decode per cfg.data_workers, one batch staged
    ahead) so all four IE passes overlap host decode/transfer with device compute
    instead of paying it serially per batch."""
    cfg = pipeline.cfg
    translate = (
        cfg.model_name in ("inceptionv1", "googlenet") and cfg.dataset_name == "imagenet"
    )
    if translate:
        from sparse_vision_tpu.data.labels import remap_torch_to_tf_labels
    for b in pipeline._batches(pipeline.train_ds, cfg.sae_batch_size, shuffle=False):
        labels = remap_torch_to_tf_labels(b.labels) if translate else b.labels
        yield b.images, labels


# ---------------------------------------------------------------------------
# artifact persistence (replaces per-layer torch.save .pt files,
# compute_ie.py:217-226, 465-471)
# ---------------------------------------------------------------------------

def save_averages(path: str, avgs: Averages) -> None:
    arrays = {}
    for name in avgs.enc:
        arrays[f"enc:{name}"] = np.asarray(avgs.enc[name])
        arrays[f"err:{name}"] = np.asarray(avgs.err[name])
        arrays[f"out:{name}"] = np.asarray(avgs.out[name])
        arrays[f"dead:{name}"] = np.asarray(avgs.dead[name])
        arrays[f"sparsity:{name}"] = np.asarray(avgs.sparsity[name])
    np.savez(path, **arrays)


def load_averages(path: str) -> Averages:
    z = np.load(path)
    names = sorted({k.split(":", 1)[1] for k in z.files})
    return Averages(
        enc={n: z[f"enc:{n}"] for n in names},
        err={n: z[f"err:{n}"] for n in names},
        out={n: z[f"out:{n}"] for n in names},
        dead={n: z[f"dead:{n}"] for n in names},
        sparsity={n: float(z[f"sparsity:{n}"]) for n in names},
    )


def save_node_ie(path: str, node: NodeIE) -> None:
    arrays = {}
    for name in node.features:
        arrays[f"features:{name}"] = np.asarray(node.features[name])
        arrays[f"error:{name}"] = np.asarray(node.error[name])
        arrays[f"model_neurons:{name}"] = np.asarray(node.model_neurons[name])
    np.savez(path, **arrays)


def load_node_ie(path: str) -> NodeIE:
    z = np.load(path)
    names = sorted({k.split(":", 1)[1] for k in z.files})
    return NodeIE(
        features={n: z[f"features:{n}"] for n in names},
        error={n: z[f"error:{n}"] for n in names},
        model_neurons={n: z[f"model_neurons:{n}"] for n in names},
    )


# ---------------------------------------------------------------------------
# mode dispatch
# ---------------------------------------------------------------------------

def run_ie(pipeline, flag: str, top_features_per_layer: Optional[int] = None):
    cfg = pipeline.cfg
    if top_features_per_layer is None:
        top_features_per_layer = cfg.ie_top_features
    eng = build_engine(pipeline)
    d = _ie_dir(pipeline)
    avg_path = os.path.join(d, "averages.npz")
    node_path = os.path.join(d, "node_ie.npz")

    if flag == "1":
        avgs = eng.compute_averages(_batches(pipeline))
        save_averages(avg_path, avgs)
        # perc-dead + sparsity CSVs (compute_ie.py:210-215)
        from sparse_vision_tpu.ops.metrics import perc_dead

        with open(os.path.join(d, "perc_dead_units.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["Layer", "Percentage dead units"])
            for n in eng.layers:
                w.writerow([n, float(perc_dead(avgs.dead[n]))])
        with open(os.path.join(d, "sparsity.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["Layer", "Sparsity"])
            for n in eng.layers:
                w.writerow([n, float(avgs.sparsity[n])])
        return avgs

    avgs = load_averages(avg_path)

    if flag == "2":
        node = eng.compute_node_ie(_batches(pipeline), avgs)
        save_node_ie(node_path, node)
        return node

    node = load_node_ie(node_path)

    if flag == "3":
        # The reference requires manually-listed feature indices per layer
        # (compute_ie.py:81-88, left commented); here they default to the
        # top-|IE| features from the node pass.
        feature_indices = {
            n: [int(i) for i in
                np.argsort(-np.abs(np.asarray(node.features[n])))[:top_features_per_layer]]
            for n in eng.layers
        }
        edges = eng.compute_edge_ie(
            _batches(pipeline), avgs, feature_indices,
            cotangent_chunk=cfg.ie_cotangent_chunk,
        )
        np.savez(
            os.path.join(d, "edge_ie.npz"),
            **{n: np.asarray(m) for n, m in edges.items()},
            **{f"idx:{n}": np.asarray(feature_indices[n]) for n in feature_indices},
        )
        return edges

    if flag.startswith("4"):
        threshold = FAITHFULNESS_THRESHOLDS[int(flag[1:])]
        rows = []
        for variant in ("sae", "model"):
            r = eng.compute_faithfulness(
                _batches(pipeline), node, threshold,
                model_or_sae=variant, averages=avgs,
            )
            r["variant"] = variant
            rows.append(r)
        store_faithfulness(os.path.join(d, "faithfulness.csv"), rows)
        plot_faithfulness(os.path.join(d, "faithfulness.csv"),
                          os.path.join(d, "faithfulness.png"))
        return rows

    raise ValueError(f"Unknown compute_ie flag: {flag!r}")


FAITHFULNESS_COLUMNS = [
    "variant", "feature_node_threshold", "error_node_threshold",
    "faithfulness_sae_errors_zero_ablated", "faithfulness_sae_errors_mean_ablated",
    "faithfulness", "m_C", "m_empty", "m_M",
]


def store_faithfulness(path: str, rows: list[dict]) -> None:
    """Append/update faithfulness rows keyed on (variant, thresholds) — the
    reference's xlsx update-in-place semantics (compute_ie.py:917-944), as CSV."""
    existing: dict[tuple, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            for row in csv.DictReader(f):
                existing[(row["variant"], row["feature_node_threshold"],
                          row["error_node_threshold"])] = row
    for r in rows:
        clean = {c: str(r.get(c, "")) for c in FAITHFULNESS_COLUMNS}
        existing[(clean["variant"], clean["feature_node_threshold"],
                  clean["error_node_threshold"])] = clean
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=FAITHFULNESS_COLUMNS)
        w.writeheader()
        for key in sorted(existing):
            w.writerow(existing[key])


def plot_faithfulness(csv_path: str, out_path: str) -> str:
    """Faithfulness vs threshold, one panel per variant column
    (compute_ie.py:946-960)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(csv_path) as f:
        rows = [r for r in csv.DictReader(f) if r["variant"] == "sae"]
    rows.sort(key=lambda r: float(r["feature_node_threshold"]))
    cols = ["faithfulness_sae_errors_zero_ablated",
            "faithfulness_sae_errors_mean_ablated", "faithfulness"]
    fig, ax = plt.subplots(1, 3, figsize=(20, 5))
    for i, col in enumerate(cols):
        # keep (x, y) PAIRS together when a cell is empty — filtering only ys would
        # shift every later point onto the wrong threshold
        pairs = [(float(r["feature_node_threshold"]), float(r[col]))
                 for r in rows if r[col] != ""]
        xs = [p[0] for p in pairs]
        ys = [p[1] for p in pairs]
        ax[i].plot(xs, ys, label=col)
        ax[i].set_xlabel("Feature node threshold")
        ax[i].set_ylabel("Faithfulness")
        ax[i].set_title(col)
        ax[i].legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path
