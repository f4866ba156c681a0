"""Eval-tier tests: streaming histograms vs torch.histc, SAE ranking vs the reference's
pandas recipe, Pareto plot smoke, MIS task construction + scoring properties."""

import os

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
import torch

from sparse_vision_tpu.eval_tools import ranking
from sparse_vision_tpu.interp import mis
from sparse_vision_tpu.ops import histograms


def test_streaming_histogram_matches_torch_histc(rng):
    B, U, BINS = 64, 5, 16
    mins = jnp.asarray(rng.uniform(-2, -1, U).astype(np.float32))
    maxs = jnp.asarray(rng.uniform(1, 2, U).astype(np.float32))
    state = histograms.init_histogram(BINS, mins, maxs)
    batches = [rng.normal(0, 1.5, (B, U)).astype(np.float32) for _ in range(3)]
    for b in batches:
        state = histograms.update_histogram(state, jnp.asarray(b))

    all_acts = np.concatenate(batches, axis=0)
    for u in range(U):
        golden = torch.histc(
            torch.tensor(all_acts[:, u]), bins=BINS,
            min=float(mins[u]), max=float(maxs[u]),
        ).numpy()
        np.testing.assert_allclose(np.asarray(state.counts[:, u]), golden, err_msg=f"unit {u}")


def test_histogram_plot_smoke(tmp_path, rng):
    state = histograms.init_histogram(8, jnp.zeros(4), jnp.ones(4))
    state = histograms.update_histogram(state, jnp.asarray(rng.uniform(0, 1, (32, 4))))
    p = histograms.plot_histograms(state, [0, 1, 2, 3], str(tmp_path / "h.png"), "t")
    assert os.path.exists(p)


@pytest.fixture
def results_csv(tmp_path, rng):
    rows = []
    for i, (lam, k) in enumerate([(0.1, 2), (0.1, 4), (1.0, 2), (1.0, 4), (5.0, 2)]):
        rows.append({
            "lambda_sparse": lam, "expansion_factor": k, "batch_size": 64,
            "optimizer_name": "constrained_adam", "learning_rate": 1e-3,
            "rec_loss": rng.uniform(), "l1_loss": rng.uniform(),
            "nrmse_loss": rng.uniform(), "rmse_loss": rng.uniform(), "aux_loss": 0.0,
            "rel_sparsity": rng.uniform(), "var_expl": rng.uniform(),
            "perc_dead_units": rng.uniform(), "loss_diff": rng.uniform(),
            "median_mis": rng.uniform(), "epochs": 3,
        })
    path = str(tmp_path / "sae_eval_results.csv")
    pd.DataFrame(rows).to_csv(path, index=False)
    return path


def test_sae_ranking_matches_reference_recipe(results_csv):
    """Golden: the reference's exact pandas rank recipe (evaluation.py:46-56)."""
    out = ranking.compute_sae_ranking(results_csv)

    df = pd.read_csv(results_csv)
    df["var_expl_rank"] = df["var_expl"].rank(ascending=False)
    df["l1_rank"] = df["l1_loss"].rank(ascending=True)
    df["rec_loss_rank"] = df["nrmse_loss"].rank(ascending=True)
    df["perc_dead_units_rank"] = df["perc_dead_units"].rank(ascending=True)
    df["sparsity_rank"] = df["rel_sparsity"].rank(ascending=False)
    df["loss_diff_rank"] = df["loss_diff"].rank(ascending=True)
    df["mis_rank"] = df["median_mis"].rank(ascending=False)
    avg = df[["var_expl_rank", "l1_rank", "rec_loss_rank", "perc_dead_units_rank",
              "sparsity_rank", "loss_diff_rank", "mis_rank"]].mean(axis=1)
    golden_final = avg.rank(ascending=True).astype(int)

    got = out.sort_index()["final_ranking"]
    assert list(got) == list(golden_final)
    assert os.path.exists(os.path.join(os.path.dirname(results_csv), "sae_rank_table.csv"))


def test_pareto_plots_smoke(results_csv, tmp_path, rng):
    p1 = ranking.plot_rec_loss_vs_sparsity(results_csv, str(tmp_path / "pareto.png"))
    # add a second epoch's rows: the all-epochs grid expands the single CSV's
    # `epochs` column into per-epoch panels (reference evaluation.py:285-470)
    df = pd.read_csv(results_csv)
    df2 = df.copy()
    df2["epochs"] = 4
    df2["nrmse_loss"] = rng.uniform(size=len(df2))
    pd.concat([df, df2]).to_csv(results_csv, index=False)
    p2 = ranking.plot_rec_loss_vs_sparsity_all_epochs(
        results_csv, str(tmp_path / "pareto_epochs.png")
    )
    assert os.path.exists(p1) and os.path.exists(p2)
    # selecting a subset of epochs works; asking for absent epochs raises
    ranking.plot_rec_loss_vs_sparsity_all_epochs(
        results_csv, str(tmp_path / "pareto_e3.png"), epochs=[3]
    )
    with pytest.raises(ValueError):
        ranking.plot_rec_loss_vs_sparsity_all_epochs(
            results_csv, str(tmp_path / "nope.png"), epochs=[99]
        )


# ---------------------------------------------------------------------------
# MIS
# ---------------------------------------------------------------------------

N_MIS, K_MIS = 4, 3  # 4 tasks, 3 refs + 1 query per side


def _unit_indices(base):
    """k_total = n_mis * (k_mis + 1) filename indices for one side."""
    return [base + i for i in range(N_MIS * (K_MIS + 1))]


def test_build_unit_tasks_layout():
    maxs = _unit_indices(100)  # descending activation order
    mins = _unit_indices(200)  # ascending activation order
    tasks = mis.build_unit_tasks(maxs, mins, N_MIS)
    assert len(tasks) == N_MIS
    all_items = [x for t in tasks for x in t]
    assert sorted(all_items) == sorted(maxs + mins)  # every image used exactly once
    max_queries = set(maxs[:N_MIS])
    min_queries = set(mins[-N_MIS:])
    for t in tasks:
        assert len(t) == 2 * (K_MIS + 1)
        half = len(t) // 2
        assert all(x in mins for x in t[:half])  # min half first
        assert all(x in maxs for x in t[half:])
        assert t[half - 1] in min_queries  # query last in each half
        assert t[-1] in max_queries


def test_mis_separable_embeddings_score_one():
    """Perfectly separable embeddings (max images cluster vs min images cluster) must
    give MIS == 1 and confidence == 1 for every unit; anti-separated gives 0."""
    maxs = np.array([_unit_indices(100)]).T  # [k_total, 1 unit]
    mins = np.array([_unit_indices(200)]).T
    idx_to_filename = {i: i for i in range(400)}
    emb = {i: np.array([1.0, 0.0]) if i < 200 else np.array([0.0, 1.0])
           for i in range(400)}
    out = mis.compute_mis(maxs, mins, idx_to_filename, N_MIS,
                          mis.embedding_similarity(emb), layer_name="fc1")
    assert out["median_mis"] == 1.0 and out["average_mis"] == 1.0
    assert all(r["MIS"] == 1.0 for r in out["per_unit"])


def test_mis_csv_written(tmp_path):
    maxs = np.array([_unit_indices(0), _unit_indices(50)]).T
    mins = np.array([_unit_indices(100), _unit_indices(150)]).T
    idx_to_filename = {i: f"img_{i}" for i in range(200)}
    rng = np.random.default_rng(0)
    emb = {f"img_{i}": rng.normal(size=4) for i in range(200)}
    out_csv = str(tmp_path / "mis.csv")
    out = mis.compute_mis(maxs, mins, idx_to_filename, N_MIS,
                          mis.embedding_similarity(emb), out_csv=out_csv)
    assert os.path.exists(out_csv)
    assert len(out["per_unit"]) == 2
    assert 0.0 <= out["median_mis"] <= 1.0
