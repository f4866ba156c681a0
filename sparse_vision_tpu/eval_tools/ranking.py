"""Post-hoc SAE ranking and Pareto plots over the merged sweep results CSV.

Reference: evaluation.py — compute_sae_ranking (35-64) ranks runs by mean rank over 7
metrics; plot_rec_loss_vs_sparsity (67-281) draws reconstruction loss against
lambda/L1/sparsity colored by expansion factor and lambda; the all-epochs variant
(285-470) draws the same grid per epoch. Plot styling is simplified; the quantities,
axes, color-grouping, and rank directions are preserved.
"""

from __future__ import annotations

import os
from typing import Optional

import pandas as pd

# metric -> ascending (True: lower is better, rank 1 = lowest value)
# (reference evaluation.py:46-53; rec loss is ranked on NRMSE)
RANK_DIRECTIONS = {
    "var_expl": False,
    "l1_loss": True,
    "nrmse_loss": True,
    "perc_dead_units": True,
    "rel_sparsity": False,
    "loss_diff": True,
    "median_mis": False,
}


def compute_sae_ranking(csv_path: str, out_path: Optional[str] = None) -> pd.DataFrame:
    """Rank SAE runs by the mean of their per-metric ranks; write the rank table CSV
    (reference evaluation.py:35-64)."""
    df = pd.read_csv(csv_path)
    rank_cols = []
    for metric, ascending in RANK_DIRECTIONS.items():
        col = f"{metric}_rank"
        df[col] = df[metric].rank(ascending=ascending)
        rank_cols.append(col)
    df["average_ranking"] = df[rank_cols].mean(axis=1)
    # method='min' so ties share a rank instead of pandas' default average rank being
    # truncated by the int cast into duplicate/skipped positions (the reference's
    # evaluation.py:55 has that truncation; deliberately not replicated)
    df["final_ranking"] = df["average_ranking"].rank(ascending=True, method="min").astype(int)
    df = df.sort_values(by="final_ranking")
    out_path = out_path or os.path.join(os.path.dirname(csv_path), "sae_rank_table.csv")
    df.to_csv(out_path, index=False)
    return df


def plot_rec_loss_vs_sparsity(
    csv_path: str,
    out_path: str,
    rec_loss: str = "nrmse_loss",
    title: str = "SAE Evaluation Results",
) -> str:
    """Pareto grid: reconstruction loss vs lambda / L1 / sparsity / dead-units, points
    colored by expansion factor (solid) and grouped by lambda (reference
    evaluation.py:67-281, simplified styling)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = pd.read_csv(csv_path)
    fig, axs = plt.subplots(2, 2, figsize=(14, 10))
    fig.suptitle(title)
    exp_facs = sorted(df["expansion_factor"].unique())
    cmap = plt.colormaps.get_cmap("tab10")
    colors = {k: cmap(i % 10) for i, k in enumerate(exp_facs)}

    panels = [
        ("lambda_sparse", rec_loss, axs[0][0]),
        ("l1_loss", rec_loss, axs[0][1]),
        ("rel_sparsity", rec_loss, axs[1][0]),
        ("perc_dead_units", rec_loss, axs[1][1]),
    ]
    for x, y, ax in panels:
        for k in exp_facs:
            sub = df[df["expansion_factor"] == k].sort_values(x)
            ax.plot(sub[x], sub[y], "o-", color=colors[k], label=f"k={k}")
        ax.set_xlabel(x)
        ax.set_ylabel(y)
    axs[0][0].legend(title="expansion factor")
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def plot_rec_loss_vs_sparsity_all_epochs(
    csv_paths: dict[int, str], out_path: str, rec_loss: str = "nrmse_loss"
) -> str:
    """Multi-epoch grid: one loss-vs-sparsity panel per epoch
    (reference evaluation.py:285-470)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    epochs = sorted(csv_paths)
    n = len(epochs)
    cols = min(4, n)
    rows = (n + cols - 1) // cols
    fig, axs = plt.subplots(rows, cols, figsize=(5 * cols, 4 * rows), squeeze=False)
    for ax_idx, e in enumerate(epochs):
        ax = axs[ax_idx // cols][ax_idx % cols]
        df = pd.read_csv(csv_paths[e])
        for k in sorted(df["expansion_factor"].unique()):
            sub = df[df["expansion_factor"] == k].sort_values("rel_sparsity")
            ax.plot(sub["rel_sparsity"], sub[rec_loss], "o-", label=f"k={k}")
        ax.set_title(f"epoch {e}")
        ax.set_xlabel("rel_sparsity")
        ax.set_ylabel(rec_loss)
    axs[0][0].legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path
