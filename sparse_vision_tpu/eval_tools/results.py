"""Durable scalar-results store.

Reference semantics (utils.py:1001-1168 store_sae_eval_results): a CSV keyed on
(lambda_sparse, expansion_factor, batch_size, optimizer_name, learning_rate, epochs)
holding rec/l1/nrmse/rmse/aux losses, rel_sparsity, var_expl, perc_dead_units,
loss_diff, median_mis; rows are updated in place when the key already exists.

TPU-native redesign (SURVEY.md §5): concurrent sweep jobs write PER-RUN JSON files (no
shared-file locking — the reference's FileLock with a 10 s print-on-timeout,
utils.py:1045-1069, is its entire cross-job coordination); ``merge_results`` folds them
into the same CSV schema for the post-hoc evaluation tier.
"""

from __future__ import annotations

import csv
import json
import os
from typing import Optional

RESULT_COLUMNS = [
    "lambda_sparse",
    "expansion_factor",
    "batch_size",
    "optimizer_name",
    "learning_rate",
    "rec_loss",
    "l1_loss",
    "nrmse_loss",
    "rmse_loss",
    "aux_loss",
    "rel_sparsity",
    "var_expl",
    "perc_dead_units",
    "loss_diff",
    "median_mis",
    "epochs",
]

KEY_COLUMNS = [
    "lambda_sparse",
    "expansion_factor",
    "batch_size",
    "optimizer_name",
    "learning_rate",
    "epochs",
]


def store_run_result(folder_path: str, run_name: str, row: dict) -> str:
    """Write one run's scalar results as JSON (one file per run; no locking).

    Written via temp file + os.replace so concurrent mergers never observe a
    partially-written JSON."""
    os.makedirs(folder_path, exist_ok=True)
    path = os.path.join(folder_path, f"{run_name}.json")
    clean = {c: row.get(c) for c in RESULT_COLUMNS}
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(clean, f, sort_keys=True, indent=1)
    os.replace(tmp, path)
    return path


def merge_results(folder_path: str, csv_path: Optional[str] = None) -> str:
    """Fold all per-run JSONs into the reference-schema CSV, replacing rows whose key
    columns match (reference update-in-place semantics, utils.py:1094-1140).

    The CSV is published atomically (temp + os.replace): concurrent mergers each
    regenerate from ALL per-run files visible to them, so the last merge — e.g. the
    post-sweep aggregation step — always produces the complete table and no reader
    ever sees a truncated file (the reference needed a FileLock for this,
    utils.py:1045-1069)."""
    csv_path = csv_path or os.path.join(folder_path, "sae_eval_results.csv")
    rows: dict[tuple, dict] = {}
    if os.path.exists(csv_path):
        with open(csv_path) as f:
            for row in csv.DictReader(f):
                rows[tuple(row[k] for k in KEY_COLUMNS)] = row
    for fn in sorted(os.listdir(folder_path)):
        if not fn.endswith(".json"):
            continue
        with open(os.path.join(folder_path, fn)) as f:
            row = json.load(f)
        row = {c: ("" if row.get(c) is None else str(row[c])) for c in RESULT_COLUMNS}
        rows[tuple(row[k] for k in KEY_COLUMNS)] = row
    tmp = csv_path + f".tmp{os.getpid()}"
    with open(tmp, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=RESULT_COLUMNS)
        w.writeheader()
        for key in sorted(rows):
            w.writerow(rows[key])
    os.replace(tmp, csv_path)
    return csv_path


def read_results(csv_path: str) -> list[dict]:
    with open(csv_path) as f:
        out = []
        for row in csv.DictReader(f):
            parsed = {}
            for k, v in row.items():
                if v == "":
                    parsed[k] = None
                    continue
                try:
                    parsed[k] = float(v)
                except ValueError:
                    parsed[k] = v
            out.append(parsed)
        return out
