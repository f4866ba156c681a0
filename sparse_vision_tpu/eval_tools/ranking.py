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


def evaluate_sweep_config(cfg) -> dict:
    """Post-hoc evaluation for one eval-sweep entry (the reference's
    ExecuteProject.evaluation role, execute_project.py:221-235): locate the sweep's
    merged results CSV through the path scheme and produce the rank table, the
    single-epoch Pareto grid, and the all-epochs Pareto grid."""
    from sparse_vision_tpu.utils.paths import folder_paths

    folder = folder_paths(cfg)["evaluation_results"]
    csv_path = os.path.join(folder, "sae_eval_results.csv")
    if not os.path.exists(csv_path):
        raise FileNotFoundError(
            f"No results CSV at {csv_path} — run the training sweep first"
        )
    rank_path = os.path.join(folder, "sae_rank_table.csv")
    df = compute_sae_ranking(csv_path, rank_path)
    if getattr(cfg, "wandb_status", False):
        # the reference logs the rank table as a wandb.Table keyed by the sweep's
        # parameter string (evaluation.py:62-63)
        from sparse_vision_tpu.utils.logging import RunLogger
        from sparse_vision_tpu.utils.paths import run_id

        rid = run_id(cfg)
        logger = RunLogger(f"{rid}_evaluation", use_wandb=True)
        logger.log_table(f"sae_eval_results/{rid}", df)
        logger.finish()
    p1 = plot_rec_loss_vs_sparsity(csv_path, os.path.join(folder, "pareto.png"))
    p2 = plot_rec_loss_vs_sparsity_all_epochs(
        csv_path, os.path.join(folder, "pareto_all_epochs.png")
    )
    return {"csv": csv_path, "rank_table": rank_path, "pareto": p1,
            "pareto_all_epochs": p2}


def plot_rec_loss_vs_sparsity_all_epochs(
    csv_path: str,
    out_path: str,
    rec_loss: str = "nrmse_loss",
    epochs: Optional[list] = None,
) -> str:
    """Multi-epoch Pareto grid from ONE merged results CSV: the per-epoch rows (the
    ``epochs`` column the results store writes every eval epoch) expand into one
    loss-vs-density panel per epoch, lines grouped by expansion factor and points
    colored by lambda, with axis limits SHARED across panels so epochs are visually
    comparable (reference evaluation.py:285-470; its hardcoded per-layer axis-limit
    tables become data-derived global limits)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = pd.read_csv(csv_path)
    if "epochs" not in df.columns:
        raise ValueError(f"{csv_path} has no 'epochs' column")
    all_epochs = sorted(df["epochs"].dropna().unique())
    epochs = [e for e in (epochs or all_epochs) if e in set(all_epochs)]
    if not epochs:
        raise ValueError(f"no matching epochs in {csv_path} (have {all_epochs})")
    n = len(epochs)
    cols = min(3, n)
    rows = (n + cols - 1) // cols
    fig, axs = plt.subplots(rows, cols, figsize=(5 * cols, 4 * rows), squeeze=False)

    exp_facs = sorted(df["expansion_factor"].unique())
    lambdas = sorted(df["lambda_sparse"].unique())
    cmap = plt.colormaps.get_cmap("tab10")
    k_color = {k: cmap(i % 10) for i, k in enumerate(exp_facs)}
    l_color = {l: cmap((i + len(exp_facs)) % 10) for i, l in enumerate(lambdas)}

    # shared limits with a 5% margin, from the rows actually plotted
    sel = df[df["epochs"].isin(epochs)]
    xs, ys = sel["rel_sparsity"], sel[rec_loss]

    def limits(v):
        lo, hi = float(v.min()), float(v.max())
        pad = 0.05 * (hi - lo) or 0.05 * max(abs(hi), 1.0)
        return lo - pad, hi + pad

    xlim, ylim = limits(xs), limits(ys)

    for ax_idx, e in enumerate(epochs):
        ax = axs[ax_idx // cols][ax_idx % cols]
        sub_e = df[df["epochs"] == e]
        for k in exp_facs:
            sub = sub_e[sub_e["expansion_factor"] == k].sort_values("rel_sparsity")
            ax.plot(sub["rel_sparsity"], sub[rec_loss], "-", color=k_color[k],
                    label=f"k={k}")
            ax.scatter(sub["rel_sparsity"], sub[rec_loss],
                       c=[l_color[l] for l in sub["lambda_sparse"]], zorder=3)
        ax.set_xlim(*xlim)
        ax.set_ylim(*ylim)
        ax.text(0.5, 0.93, f"Epoch {int(e)}", ha="center", transform=ax.transAxes)
    for ax_idx in range(n, rows * cols):
        axs[ax_idx // cols][ax_idx % cols].axis("off")
    from matplotlib.lines import Line2D

    axs[0][-1].legend(title="expansion factor", loc="upper right")
    lam_handles = [Line2D([], [], color=l_color[l], marker="o", linestyle="None",
                          label=f"{l}") for l in lambdas]
    # figure-level legend: an axes keeps only its LAST .legend() call, so with a
    # single panel a second axes legend would replace the expansion-factor one
    fig.legend(handles=lam_handles, title="lambda", loc="upper left")
    fig.supxlabel("Density")
    fig.supylabel(f"Rec. loss ({rec_loss})")
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path
