"""Analysis-figure utilities — equivalents of the reference's "used but supplementary"
figure scripts (supplementary_files_2/, README.md:7), as functions over data instead of
scripts with hardcoded result values:

- IE distributions & node counts     visualize_ie.py (histograms/medians of node IE,
                                     node-count vs threshold curves)
- MIS over epochs                    visualize_mis.py (median MIS per epoch per config;
                                     the reference hardcodes the numbers at :29-87)
- pixel- vs channel-sparsity         comparing_pixel_and_channel_sparsity.py
- class-count dataset audits         class_*.py (per-class counts/ratios)
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
