"""Machine Interpretability Score (MIS) subsystem.

Reference behavior (utils.py:2227-2343 compute_mis, after Zimmermann et al.): for each
unit, take the k most- and least-activating images (filename indices saved by the "mis"
epoch, model_pipeline.py:948-961), build ``n_mis`` binary 2-AFC tasks — each with
reference images on both extremes and one query per side, query images LAST — score
them with a similarity model, and record per-unit MIS + confidence to CSV plus the
layer median into the results store.

The reference delegates scoring to the external ``machine_interpretability`` package
with dreamsim feature/regression pickles available only on the author's cluster
(utils.py:2251-2255). Here the task-construction scaffold is reproduced exactly and the
similarity model is a PLUGGABLE callable (SURVEY.md §7.1); ``embedding_similarity``
provides a self-contained default (cosine similarity in any embedding space — e.g. a
backbone tap).

Task-batch layout per the reference (utils.py:2262-2294): ``batch = mins + maxs`` where
mins = [min_refs..., min_query] and maxs = [max_refs..., max_query] — i.e. each half
has its query image last.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import numpy as np


def make_fair_batches(items: list, n_batches: int, reverse: bool = False) -> list[list]:
    """Distribute ``items`` (sorted by ascending activation) round-robin over
    ``n_batches`` so every batch spans the activation range fairly; each batch keeps
    ascending order and the LAST element of each batch is from the end of the list
    (the query position). ``reverse=True`` flips each batch (used for the min side so
    its query — the least activating — also lands last).

    Mirrors the contract of sg_utils.make_fair_batches as the reference uses it
    (utils.py:2280-2294): inputs are ref images followed by query images; outputs are
    n_batches lists with the query last.
    """
    batches = [items[i::n_batches] for i in range(n_batches)]
    # re-balance so each batch ends with one of the last n_batches items (the queries)
    if reverse:
        batches = [list(reversed(b)) for b in batches]
    return batches


def build_unit_tasks(
    max_filenames: Sequence, min_filenames: Sequence, n_mis: int
) -> list[list]:
    """Build the n_mis 2-AFC task batches for one unit (utils.py:2262-2294).

    ``max_filenames`` / ``min_filenames`` are sorted by DESCENDING activation for max
    (most activating first) and ASCENDING for min (most-extreme min first), with
    length n_mis * (k_mis + 1) each. Query selection follows the reference exactly
    (utils.py:2256-2260): max queries = first n_mis (the strongest); min queries =
    LAST n_mis of the min list — i.e. the MILDEST of the min set, a deliberate
    reference choice its own comment block discusses ("min_refs < min_queries <
    max_queries < max_refs"). Queries are placed last within each half;
    batch = mins + maxs.
    """
    max_filenames = list(max_filenames)
    min_filenames = list(min_filenames)
    max_queries = max_filenames[:n_mis]
    max_refs = max_filenames[n_mis:]
    min_queries = min_filenames[-n_mis:]
    min_refs = min_filenames[:-n_mis]

    max_lists = make_fair_batches(max_refs + max_queries, n_mis)
    min_lists = make_fair_batches(min_queries + min_refs, n_mis, reverse=True)
    return [mins + maxs for mins, maxs in zip(min_lists, max_lists)]


def score_task(batch: list, similarity: Callable) -> float:
    """Score one 2-AFC task: both halves end with their query; the task is solved when
    each query is more similar to its own half's references than to the other half's.

    Returns the mean of the two query decisions in {0, 0.5, 1}.
    """
    half = len(batch) // 2
    mins, maxs = batch[:half], batch[half:]
    min_refs, min_query = mins[:-1], mins[-1]
    max_refs, max_query = maxs[:-1], maxs[-1]
    s_min_own = np.mean([similarity(min_query, r) for r in min_refs])
    s_min_other = np.mean([similarity(min_query, r) for r in max_refs])
    s_max_own = np.mean([similarity(max_query, r) for r in max_refs])
    s_max_other = np.mean([similarity(max_query, r) for r in min_refs])
    return (int(s_min_own > s_min_other) + int(s_max_own > s_max_other)) / 2.0


def prepare_machine_interpretability_score(similarity: Callable):
    """Factory mirroring mis_utils.prepare_machine_interpretability_score
    (utils.py:2296-2301): returns ``f(task_batches) -> (mis, confidence)`` where mis is
    the mean task score and confidence its binomial-style certainty |2·mis − 1|."""

    def compute(task_batches: list[list], include_individual_scores: bool = False):
        scores = [score_task(b, similarity) for b in task_batches]
        mis = float(np.mean(scores))
        confidence = abs(2.0 * mis - 1.0)
        if include_individual_scores:
            return mis, confidence, scores
        return mis, confidence

    return compute


def embedding_similarity(embeddings: dict) -> Callable:
    """Self-contained default similarity: cosine similarity between precomputed
    embeddings keyed by filename/index (stands in for the unavailable dreamsim
    pickles, utils.py:2251-2255)."""

    def sim(a, b) -> float:
        va, vb = np.asarray(embeddings[a]), np.asarray(embeddings[b])
        return float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb) + 1e-12))

    return sim


def load_reference_mis_stats() -> dict:
    """Summary statistics of the thesis's per-unit MIS table (dreamsim scores
    on InceptionV1 units; derived from the reference
    supplementary_files_2/mis_reference_values.txt — see the asset's _source
    note). Keyed by layer group ('mixed3a', ...), each with n_units,
    median/mean MIS_confidence, confidence quantiles, and the fraction of
    units whose raw MIS sits at the 1.0 ceiling. BASELINE.md's 0.834 mixed3a
    anchor is this table's median_confidence for that group."""
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "data", "assets",
                        "mis_reference_stats.json")
    with open(os.path.normpath(path)) as f:
        return json.load(f)


def mis_distribution_check(confidences: Sequence[float],
                           group: str = "mixed3a") -> dict:
    """Shape sanity check of a layer's per-unit MIS_confidence distribution
    against the thesis's dreamsim distribution for ``group``.

    CAVEAT (the honest contract): the shipped default similarity — cosine in a
    backbone embedding (compute_mis_for_run) — is a STAND-IN for dreamsim, so
    ABSOLUTE scores are not directly comparable to the reference anchors. What
    should transfer for a trained, interpretable layer is the distribution
    SHAPE: most units well above chance (confidence 0), a heavy mass near the
    ceiling, and a thin left tail. This helper quantifies that: quantile gaps
    against the reference, plus the two headline stats side by side. Use it to
    catch a broken similarity (confidences ~0, or uniform), not to certify
    parity with dreamsim.
    """
    import numpy as np

    stats = load_reference_mis_stats()["groups"][group]
    conf = np.asarray(list(confidences), np.float64)
    if conf.size == 0:
        raise ValueError("no confidences given")
    qs = sorted(float(q) for q in stats["confidence_quantiles"])
    ours_q = {q: float(np.quantile(conf, q)) for q in qs}
    ref_q = {float(q): v for q, v in stats["confidence_quantiles"].items()}
    gaps = {q: round(ours_q[q] - ref_q[q], 4) for q in qs}
    return {
        "group": group,
        "n_units": int(conf.size),
        "median_confidence": float(np.median(conf)),
        "reference_median_confidence": stats["median_confidence"],
        "mean_confidence": float(np.mean(conf)),
        "reference_mean_confidence": stats["mean_confidence"],
        "quantile_gaps_vs_reference": gaps,
        "max_abs_quantile_gap": float(max(abs(g) for g in gaps.values())),
        # shape flags a broken similarity regardless of embedder choice
        "above_chance_fraction": float((conf > 0.05).mean()),
    }


def compute_mis_for_run(pipeline, n_mis: int = 20, k_mis: int = 9,
                        embed_fn=None):
    """Mode mis="2" (utils.py:2227-2343 compute_mis driven from deploy_model:1345-1365):
    load the per-unit max/min sample indices saved by the mis="1" epoch, score every
    unit, write the per-unit CSV and record the layer median into the run's results
    row.

    THE RECOMMENDED SIMILARITY (docs/MIS.md): the external dreamsim pickles the
    reference requires are unavailable (utils.py:2251-2255), so scoring uses
    cosine similarity in a semantic image embedding. The default ``embed_fn``
    is the run's own frozen backbone at its penultimate stage (for a converted
    GoogLeNet that is the pre-logits avgpool representation — the closest
    built-in stand-in for dreamsim's perceptual space). Pass ``embed_fn``
    (jittable ``[B, H, W, C] images -> [B, D] embeddings``) to use a stronger
    embedder, e.g. a converted CLIP tower's image embedding:

        clip = make_backbone("clip_vit_b16", "imagenet")  # + convert_hf_clip_vision
        embed_fn = lambda x: clip.apply(clip_params, x, stop_at="post_ln")[1]["post_ln"]

    Absolute scores are embedder-dependent and NOT directly comparable to the
    thesis's dreamsim anchors; check the distribution SHAPE instead with
    ``mis_distribution_check`` (see its caveat note)."""
    import jax

    from sparse_vision_tpu.eval_tools import results as results_store
    from sparse_vision_tpu.ops.metrics import spatial_mean

    cfg = pipeline.cfg
    epoch = cfg.sae_checkpoint_epoch
    fn_dir = os.path.join(pipeline.paths["evaluation_results"], "filename_indices")
    data = np.load(os.path.join(fn_dir, f"{pipeline.run_id}_epoch_{epoch}.npz"))
    max_idx, min_idx = data["max_filename_indices"], data["min_filename_indices"]
    need = n_mis * (k_mis + 1)
    if max_idx.shape[0] != need:
        raise ValueError(
            f"MIS scoring needs top-k indices with k={need} rows (one mis='1' collection "
            f"epoch), but the saved file for epoch {epoch} has k={max_idx.shape[0]} — "
            "run the mis='1' mode first (a regular eval epoch saves k=25)."
        )
    if (max_idx < 0).any() or (min_idx < 0).any():
        raise ValueError(
            f"MIS needs {need} distinct samples per extreme but the collected top-k "
            "contains unfilled sentinel rows — the train dataset is smaller than "
            f"{need}; reduce n_mis/k_mis or use a larger dataset."
        )

    needed = sorted(set(max_idx.ravel().tolist()) | set(min_idx.ravel().tolist()))
    needed = [i for i in needed if i >= 0]  # drop top-k sentinel rows

    from sparse_vision_tpu.data.datasets import Batch, fetch_images_batches
    from sparse_vision_tpu.data.prefetch import prefetch

    if embed_fn is None:
        # default: cosine in the frozen backbone's penultimate representation
        penult = pipeline.net.stage_names[-2]

        @jax.jit
        def embed(x):
            _, taps, _ = pipeline.net.apply(
                pipeline.frozen_params, x, state=pipeline.net_state, stop_at=penult
            )
            return spatial_mean(taps[penult])
    else:
        embed = embed_fn

    # decode-parallel chunk fetch (cfg.data_workers thread pool) + one chunk staged
    # on device ahead of the embed dispatch — the same input-pipeline treatment as
    # every Pipeline epoch loop, instead of serial decode -> transfer -> embed
    def _chunks():
        for chunk_idx, imgs in fetch_images_batches(
            pipeline.train_ds, needed, 64, workers=cfg.data_workers
        ):
            yield Batch(imgs, chunk_idx, chunk_idx.astype(np.int32))

    embs = {}
    for b in prefetch(_chunks(), None):
        e = np.asarray(embed(b.images))
        for local, ds_idx in enumerate(np.asarray(b.indices)):
            embs[int(ds_idx)] = e[local]

    out_csv = os.path.join(
        pipeline.paths["evaluation_results"], "MIS",
        f"{pipeline.run_id}_mis_epoch_{epoch}.csv",
    )
    result = compute_mis(
        max_idx, min_idx, {i: i for i in needed + [-1]}, n_mis,
        embedding_similarity(embs), out_csv=out_csv, layer_name=cfg.sae_layer,
    )
    # record median_mis into the run's results row (utils.py:2325-2342)
    folder = pipeline.paths["evaluation_results"]
    import json

    run_json = os.path.join(folder, f"{pipeline.run_id}_epoch_{epoch}.json")
    row = {}
    if os.path.exists(run_json):
        with open(run_json) as f:
            row = json.load(f)
    row["median_mis"] = result["median_mis"]
    row.setdefault("lambda_sparse", cfg.sae_lambda_sparse)
    row.setdefault("expansion_factor", cfg.sae_expansion_factor)
    row.setdefault("batch_size", cfg.sae_batch_size)
    row.setdefault("optimizer_name", cfg.sae_optimizer_name)
    row.setdefault("learning_rate", cfg.sae_learning_rate)
    row.setdefault("epochs", epoch)
    results_store.store_run_result(folder, f"{pipeline.run_id}_epoch_{epoch}", row)
    results_store.merge_results(folder)
    return result


def compute_mis(
    max_filename_indices: np.ndarray,  # [k_total, U] most-activating, descending
    min_filename_indices: np.ndarray,  # [k_total, U] least-activating, ascending
    idx_to_filename: dict,
    n_mis: int,
    similarity: Callable,
    out_csv: str | None = None,
    layer_name: str = "",
) -> dict:
    """Per-unit MIS over a whole layer (utils.py:2262-2342): build tasks per unit,
    score, write the per-unit CSV, and return summary stats (median/average of the
    confidence values, matching the reference's median_mis = median of
    mis_confidence_list, utils.py:2317-2320)."""
    scorer = prepare_machine_interpretability_score(similarity)
    rows = []
    for unit_idx in range(max_filename_indices.shape[1]):
        max_names = [idx_to_filename[int(i)] for i in max_filename_indices[:, unit_idx]]
        min_names = [idx_to_filename[int(i)] for i in min_filename_indices[:, unit_idx]]
        tasks = build_unit_tasks(max_names, min_names, n_mis)
        mis, conf = scorer(tasks)
        rows.append({"unit_idx": unit_idx, "MIS": mis, "MIS_confidence": conf,
                     "layer_name": layer_name})
    confs = [r["MIS_confidence"] for r in rows]
    result = {
        "per_unit": rows,
        "median_mis": float(np.median(confs)),
        "average_mis": float(np.mean(confs)),
    }
    if out_csv:
        import csv

        os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
        with open(out_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["unit_idx", "MIS", "MIS_confidence",
                                              "layer_name"])
            w.writeheader()
            w.writerows(rows)
    return result
