"""Eval-sweep tier parity (VERDICT r1 item 6).

Reference: a separate 17-field parameters_eval.txt (specify_parameters.py:296-322)
that main.py loops (main.py:117-155) to build per-epoch Pareto grids from the shared
results CSV (evaluation.py:285-470). Here: `--run_evaluation --parameters <spec>`
over a 2-lambda x 2-epoch trained sweep produces the all-epochs grid + rank table in
one command.
"""

import dataclasses
import os

import pytest

from sparse_vision_tpu.config import LEGACY_EVAL_FIELDS, RunConfig, Sweep
from sparse_vision_tpu.cli import main as cli_main
from sparse_vision_tpu.train.pipeline import Pipeline
from sparse_vision_tpu.utils.paths import folder_paths


def _base(tmp_path):
    return RunConfig(
        directory_path=str(tmp_path), dataset_name="synthetic", sae_epochs=2,
        sae_batch_size=64, sae_expansion_factor=2, dead_neurons_steps=10_000,
        log_every=1000,
    )


def test_eval_line_round_trip(tmp_path):
    cfg = _base(tmp_path)
    line = cfg.to_legacy_eval_line()
    assert len(line.split(",")) == len(LEGACY_EVAL_FIELDS) == 17
    back = RunConfig.from_legacy_eval_line(line)
    for f in LEGACY_EVAL_FIELDS:
        assert getattr(back, f) == getattr(cfg, f), f
    assert back.training is False  # eval lines always describe evaluation runs


def test_sweep_writes_collapsed_eval_file(tmp_path):
    sweep = Sweep(axes={"sae_lambda_sparse": [0.1, 1.0],
                        "sae_expansion_factor": [2, 4]},
                  base=_base(tmp_path))
    p = str(tmp_path / "parameters_eval.txt")
    # 4 training combos differ only in lambda/k, which the 17-field eval schema
    # excludes -> they share one results CSV -> ONE eval line
    assert sweep.write_legacy_eval(p) == 1


@pytest.mark.slow
def test_run_evaluation_over_sweep_produces_grid_and_rank_table(tmp_path):
    base = _base(tmp_path)
    # train the 2-lambda sweep; each run stores per-epoch rows (epochs 1 and 2)
    for lam in (0.1, 1.0):
        Pipeline(dataclasses.replace(base, sae_lambda_sparse=lam)).train_sae()

    spec = str(tmp_path / "parameters_eval.txt")
    n = Sweep(axes={"sae_lambda_sparse": [0.1, 1.0]}, base=base).write_legacy_eval(spec)
    assert n == 1
    rc = cli_main(["--run_evaluation", "--parameters", spec])
    assert rc == 0

    folder = folder_paths(base)["evaluation_results"]
    assert os.path.exists(os.path.join(folder, "sae_rank_table.csv"))
    assert os.path.exists(os.path.join(folder, "pareto.png"))
    assert os.path.exists(os.path.join(folder, "pareto_all_epochs.png"))

    import pandas as pd

    df = pd.read_csv(os.path.join(folder, "sae_eval_results.csv"))
    # 2 lambdas x epochs {0, 1, 2} (pre-training eval stores nothing; epoch rows do)
    assert set(df["epochs"]) >= {1, 2}
    assert set(df["lambda_sparse"]) == {0.1, 1.0}
    rank = pd.read_csv(os.path.join(folder, "sae_rank_table.csv"))
    assert "final_ranking" in rank.columns and len(rank) == len(df)
