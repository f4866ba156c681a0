"""Analysis-figure utilities — equivalents of the reference's "used but supplementary"
figure scripts (supplementary_files_2/, README.md:7), as functions over data instead of
scripts with hardcoded result values:

- IE distributions & node counts     visualize_ie.py (histograms/medians of node IE,
                                     node-count vs threshold curves)
- MIS over epochs                    visualize_mis.py (median MIS per epoch per config;
                                     the reference hardcodes the numbers at :29-87)
- pixel- vs channel-sparsity         comparing_pixel_and_channel_sparsity.py
- class-count dataset audits         class_*.py (per-class counts/ratios)
- dead-unit-adjusted MIS             mis_adjust_for_dead_units.py (mean/median with
                                     dead units' rows removed)
- reinit-adjusted MIS                compute_mis_adjust_for_reinit_neurons.py (per-
                                     epoch medians with re-initialized units dropped)
"""

from __future__ import annotations

import os
from typing import Mapping, Sequence

import numpy as np


def _save(fig, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=150)
    import matplotlib.pyplot as plt

    plt.close(fig)
    return path


def plot_ie_histograms(node_features: Mapping[str, np.ndarray], path: str) -> str:
    """Per-layer histograms of |node IE| with the median marked
    (visualize_ie.py's histogram/median panels)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    layers = list(node_features)
    cols = min(4, len(layers))
    rows = (len(layers) + cols - 1) // cols
    fig, axs = plt.subplots(rows, cols, figsize=(5 * cols, 4 * rows), squeeze=False)
    for i, name in enumerate(layers):
        ax = axs[i // cols][i % cols]
        vals = np.abs(np.asarray(node_features[name]))
        ax.hist(vals, bins=100, color="dodgerblue")
        med = float(np.median(vals))
        ax.axvline(med, color="red", label=f"median={med:.2e}")
        ax.set_yscale("log")
        ax.set_title(name)
        ax.legend()
    fig.suptitle("|node IE| per SAE feature")
    fig.tight_layout()
    return _save(fig, path)


def plot_node_count_vs_threshold(
    node_features: Mapping[str, np.ndarray],
    thresholds: Sequence[float],
    path: str,
) -> str:
    """Number of circuit nodes surviving each IE threshold, per layer and total
    (visualize_ie.py's node-count-vs-threshold curves)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    total = np.zeros(len(thresholds))
    for name, vals in node_features.items():
        vals = np.abs(np.asarray(vals))
        counts = [int(np.sum(vals > t)) for t in thresholds]
        total += np.asarray(counts)
        ax.plot(thresholds, counts, marker="o", label=name)
    ax.plot(thresholds, total, "k--", marker="s", label="total")
    ax.set_xscale("log")
    ax.set_xlabel("IE threshold")
    ax.set_ylabel("nodes above threshold")
    ax.legend(fontsize=8)
    fig.tight_layout()
    return _save(fig, path)


def plot_mis_over_epochs(
    mis_by_config: Mapping[str, Mapping[int, float]],
    path: str,
    baseline: float | None = None,
    baseline_label: str = "original layer",
) -> str:
    """Median MIS per epoch, one line per configuration, with an optional horizontal
    baseline (visualize_mis.py — e.g. 0.834 for raw GoogLeNet mixed3a, :24)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    for label, series in mis_by_config.items():
        epochs = sorted(series)
        ax.plot(epochs, [series[e] for e in epochs], marker="o", label=label)
    if baseline is not None:
        ax.axhline(baseline, color="gray", linestyle="--", label=baseline_label)
    ax.set_xlabel("epoch")
    ax.set_ylabel("median MIS")
    ax.legend()
    fig.tight_layout()
    return _save(fig, path)


def plot_pixel_vs_channel_sparsity(
    pixel_sparsity: Mapping[int, float],
    channel_sparsity: Mapping[int, float],
    path: str,
) -> str:
    """Pixel-wise vs channel-wise sparsity over epochs
    (comparing_pixel_and_channel_sparsity.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    for label, series in [("pixel-wise", pixel_sparsity), ("channel-wise", channel_sparsity)]:
        epochs = sorted(series)
        ax.plot(epochs, [series[e] for e in epochs], marker="o", label=label)
    ax.set_xlabel("epoch")
    ax.set_ylabel("sparsity")
    ax.legend()
    fig.tight_layout()
    return _save(fig, path)


def _load_mis_frame(mis_csv, layer_name: str | None):
    """Per-unit MIS CSV -> frame, filtered to ``layer_name`` rows excluding
    'bottleneck' variants like the reference (mis_adjust_for_dead_units.py:47-48,
    compute_mis.py:20-22)."""
    import pandas as pd

    df = pd.read_csv(mis_csv) if isinstance(mis_csv, str) else mis_csv.copy()
    if layer_name:
        df = df[
            df["layer_name"].astype(str).str.contains(layer_name)
            & ~df["layer_name"].astype(str).str.contains("bottleneck")
        ].reset_index(drop=True)
    return df


def _as_positions(indices) -> np.ndarray:
    idx = np.asarray(indices)
    return np.flatnonzero(idx) if idx.dtype == bool else idx.astype(np.int64)


def mis_adjusted_for_dead_units(
    mis_csv, dead_units, layer_name: str | None = None
) -> dict:
    """Dead-unit-adjusted MIS aggregation (mis_adjust_for_dead_units.py:1-109):
    mean/median of MIS_confidence before removal, after dropping dead units' rows,
    and over the dead units alone.

    ``mis_csv``: per-unit MIS CSV path or frame (the compute_mis output);
    ``dead_units``: bool mask or index array of dead units (the filename-indices
    npz's 'dead_units' entry). Indices are POSITIONS within the (layer-filtered)
    frame — the reference mixes .iloc and label-based .drop (:53-54), identical when
    the file holds one layer; here both selections are positional."""
    df = _load_mis_frame(mis_csv, layer_name)
    dead = _as_positions(dead_units)
    conf = df["MIS_confidence"]
    dead_rows = conf.iloc[dead]
    alive_rows = conf.drop(conf.index[dead])
    return {
        "n_dead": int(len(dead)),
        "n_units": int(len(conf)),
        "average_before": float(conf.mean()),
        "median_before": float(conf.median()),
        "average_after": float(alive_rows.mean()) if len(alive_rows) else None,
        "median_after": float(alive_rows.median()) if len(alive_rows) else None,
        "average_dead": float(dead_rows.mean()) if len(dead_rows) else None,
        "median_dead": float(dead_rows.median()) if len(dead_rows) else None,
    }


def adjusted_median_mis(mis_csv, drop_indices, layer_name: str | None = None) -> float:
    """Median MIS_confidence after dropping the given units' rows — the per-epoch core
    of the reinit-adjusted aggregation (compute_mis_adjust_for_reinit_neurons.py:
    84-105: read per-unit CSV, drop re-initialized neurons' indices, median of the
    remaining MIS_confidence values)."""
    df = _load_mis_frame(mis_csv, layer_name)
    drop = _as_positions(drop_indices)
    conf = df["MIS_confidence"].drop(df.index[drop])
    return float(conf.median())


def mis_adjusted_series(
    mis_csvs: Mapping[int, str], drop_indices_by_epoch: Mapping[int, "np.ndarray"],
    layer_name: str | None = None,
) -> dict[int, float]:
    """Reinit-adjusted median-MIS-over-epochs series: per epoch, drop that epoch's
    re-initialized (or dead) units and take the median
    (compute_mis_adjust_for_reinit_neurons.py:66-113 loop). Epochs without an index
    file keep the unadjusted median. Feed the result to plot_mis_over_epochs for the
    reference's adjusted-median figure (:116-137)."""
    out: dict[int, float] = {}
    for epoch, csv_path in mis_csvs.items():
        drop = drop_indices_by_epoch.get(epoch)
        out[epoch] = adjusted_median_mis(
            csv_path, drop if drop is not None else np.zeros(0, np.int64), layer_name
        )
    return out


def class_counts(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """Per-class sample counts (the class_*.py dataset audits)."""
    return np.bincount(np.asarray(labels, np.int64), minlength=num_classes)


def plot_class_counts(labels: np.ndarray, num_classes: int, path: str) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    counts = class_counts(labels, num_classes)
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.bar(np.arange(num_classes), counts)
    ax.set_xlabel("class")
    ax.set_ylabel("count")
    fig.tight_layout()
    return _save(fig, path)
