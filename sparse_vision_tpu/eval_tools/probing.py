"""Sparse probing: how much class-relevant signal do FEW latents carry?

Beyond-reference evaluation tier (the reference scores SAEs by fidelity,
sparsity and MIS only — evaluation.py:35-120, utils.py:2227-2343). Sparse
probing is the community-standard complement (Gao et al. 2024 "Scaling and
evaluating sparse autoencoders" §4.3; SAEBench): for every class, select the k
latents whose train-split mean activation differs most between the class and
the rest, fit a 1-vs-all logistic probe on just those k features, and score it
on the held-out split. A good dictionary concentrates class evidence into few
latents, so its k-sparse probes approach the dense (all-features) probe; raw
channels at the same layer are the baseline the SAE must beat.

TPU shape: probe fitting is one ``lax.scan`` of full-batch Adam steps over a
class-vmapped weighted-BCE objective — classes are processed in fixed-size
chunks so every chunk reuses one compiled program ([chunk, N, k] gathers stay
small; k <= 32). Feature pooling reuses the eval step's channel/token-mean
POST-activation code (train/steps.py make_sae_eval_step 'probe_acts'); the
pre-activation 'topk_acts' quantity stays with the top-k collection path
(model_pipeline.py:344-358), which is where the reference uses pre-ReLU.

Entry points: ``compute_sparse_probing(pipeline, ks=...)`` on a trained
Pipeline (writes per-class CSV + summary JSON under
``evaluation_results/probing/``), or the CLI's ``--sparse_probing "1,2,5"``
(composable with ``--run_pipeline``: train/eval, then probe).
"""

from __future__ import annotations

import csv
import json
import os
from functools import partial

import numpy as np


def _standardize(x_tr: np.ndarray, x_te: np.ndarray):
    mu = x_tr.mean(axis=0)
    sd = x_tr.std(axis=0) + 1e-6
    return (x_tr - mu) / sd, (x_te - mu) / sd


def select_features_mean_diff(x_tr: np.ndarray, y_tr: np.ndarray,
                              n_classes: int, k: int) -> np.ndarray:
    """[C, k] feature indices: per class, the k features with the largest
    |mean(class) - mean(rest)| on the train split (the SAEBench selection rule).
    Classes absent from the train split get arbitrary (first-k) indices; their
    probes are masked out of every summary by the caller."""
    n, f = x_tr.shape
    onehot = np.zeros((n, n_classes), np.float32)
    onehot[np.arange(n), y_tr] = 1.0
    counts = onehot.sum(axis=0)  # [C]
    sum_pos = onehot.T @ x_tr  # [C, F]
    mu_pos = sum_pos / np.maximum(counts, 1.0)[:, None]
    mu_neg = (x_tr.sum(axis=0)[None, :] - sum_pos) / np.maximum(
        n - counts, 1.0
    )[:, None]
    score = np.abs(mu_pos - mu_neg)
    k = min(k, f)
    idx = np.argpartition(-score, k - 1, axis=1)[:, :k]
    # stable ordering (descending score) so results are deterministic
    order = np.argsort(-np.take_along_axis(score, idx, axis=1), axis=1,
                       kind="stable")
    return np.take_along_axis(idx, order, axis=1).astype(np.int32)


def _auc_from_scores(z: np.ndarray, pos: np.ndarray) -> float:
    """Rank-based ROC-AUC (Mann-Whitney U); ties get average ranks."""
    n_pos = int(pos.sum())
    n_neg = pos.shape[0] - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(z, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(z) + 1)
    zs = z[order]
    # average ranks over tie groups
    i = 0
    while i < len(zs):
        j = i
        while j + 1 < len(zs) and zs[j + 1] == zs[i]:
            j += 1
        if j > i:
            ranks[order[i:j + 1]] = 0.5 * (i + 1 + j + 1)
        i = j + 1
    r_pos = ranks[pos.astype(bool)].sum()
    return float((r_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def _fit_chunk_jit(steps: int, lr: float):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=())
    def fit(x_tr, y_tr, pos_w):
        # x_tr [C, N, k] standardized features; y_tr [C, N] in {0,1};
        # pos_w [C] positive-class weight (n_neg/n_pos, balancing the BCE)
        c, n, k = x_tr.shape
        w0 = jnp.zeros((c, k)), jnp.zeros((c,))

        def loss_fn(params):
            w, b = params
            z = jnp.einsum("cnk,ck->cn", x_tr, w) + b[:, None]
            # weighted BCE: softplus(-z) on positives (scaled), softplus(z) on negs
            per = (pos_w[:, None] * y_tr * jax.nn.softplus(-z)
                   + (1.0 - y_tr) * jax.nn.softplus(z))
            denom = pos_w[:, None] * y_tr + (1.0 - y_tr)
            return (per.sum() / jnp.maximum(denom.sum(), 1.0)
                    + 1e-4 * (w * w).sum() / c)

        grad_fn = jax.grad(loss_fn)
        b1, b2, eps = 0.9, 0.999, 1e-8

        def step(carry, t):
            params, m, v = carry
            g = grad_fn(params)
            m = jax.tree.map(lambda a, b_: b1 * a + (1 - b1) * b_, m, g)
            v = jax.tree.map(lambda a, b_: b2 * a + (1 - b2) * b_ * b_, v, g)
            tt = t + 1
            mhat = jax.tree.map(lambda a: a / (1 - b1 ** tt), m)
            vhat = jax.tree.map(lambda a: a / (1 - b2 ** tt), v)
            params = jax.tree.map(
                lambda p, mh, vh: p - lr * mh / (jnp.sqrt(vh) + eps),
                params, mhat, vhat,
            )
            return (params, m, v), None

        zeros = jax.tree.map(jnp.zeros_like, w0)
        (params, _, _), _ = jax.lax.scan(
            step, (w0, zeros, zeros), jnp.arange(steps, dtype=jnp.float32)
        )
        return params

    return fit


def _fit_dense_jit(steps: int, lr: float):
    # dense probes share the feature matrix: one [N, F] x [C, F] einsum per step
    # instead of a per-class [C, N, F] gathered copy
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fit(x_tr, y_tr, pos_w):
        c = y_tr.shape[0]
        f = x_tr.shape[1]
        w0 = jnp.zeros((c, f)), jnp.zeros((c,))

        def loss_fn(params):
            w, b = params
            z = jnp.einsum("nf,cf->cn", x_tr, w) + b[:, None]
            per = (pos_w[:, None] * y_tr * jax.nn.softplus(-z)
                   + (1.0 - y_tr) * jax.nn.softplus(z))
            denom = pos_w[:, None] * y_tr + (1.0 - y_tr)
            return (per.sum() / jnp.maximum(denom.sum(), 1.0)
                    + 1e-4 * (w * w).sum() / c)

        grad_fn = jax.grad(loss_fn)
        b1, b2, eps = 0.9, 0.999, 1e-8

        def step(carry, t):
            params, m, v = carry
            g = grad_fn(params)
            m = jax.tree.map(lambda a, b_: b1 * a + (1 - b1) * b_, m, g)
            v = jax.tree.map(lambda a, b_: b2 * a + (1 - b2) * b_ * b_, v, g)
            tt = t + 1
            mhat = jax.tree.map(lambda a: a / (1 - b1 ** tt), m)
            vhat = jax.tree.map(lambda a: a / (1 - b2 ** tt), v)
            params = jax.tree.map(
                lambda p, mh, vh: p - lr * mh / (jnp.sqrt(vh) + eps),
                params, mhat, vhat,
            )
            return (params, m, v), None

        zeros = jax.tree.map(jnp.zeros_like, w0)
        (params, _, _), _ = jax.lax.scan(
            step, (w0, zeros, zeros), jnp.arange(steps, dtype=jnp.float32)
        )
        return params

    return fit


def fit_probes(x_tr: np.ndarray, y_tr: np.ndarray, x_te: np.ndarray,
               y_te: np.ndarray, n_classes: int, k: int, *,
               steps: int = 300, lr: float = 0.05,
               class_chunk: int = 128) -> dict:
    """k-sparse 1-vs-all logistic probes for every class.

    Returns {'auc': [C], 'balanced_acc': [C], 'valid': [C] bool,
    'mean_auc', 'mean_balanced_acc'} — means over classes present in BOTH
    splits. ``k=0`` means dense (all features, no selection)."""
    import jax.numpy as jnp

    x_tr = np.asarray(x_tr, np.float32)
    x_te = np.asarray(x_te, np.float32)
    y_tr = np.asarray(y_tr).astype(np.int64)
    y_te = np.asarray(y_te).astype(np.int64)
    x_tr, x_te = _standardize(x_tr, x_te)
    n_tr, f = x_tr.shape
    dense = k == 0 or k >= f

    counts_tr = np.bincount(y_tr, minlength=n_classes).astype(np.float64)
    counts_te = np.bincount(y_te, minlength=n_classes).astype(np.float64)
    valid = (counts_tr > 0) & (counts_te > 0) & (counts_te < len(y_te))
    pos_w_all = (n_tr - counts_tr) / np.maximum(counts_tr, 1.0)

    auc = np.full(n_classes, np.nan)
    bacc = np.full(n_classes, np.nan)

    def _score(c, z):
        pos = (y_te == c)
        auc[c] = _auc_from_scores(z, pos)
        tpr = float((z[pos] > 0).mean()) if pos.any() else np.nan
        tnr = float((z[~pos] <= 0).mean()) if (~pos).any() else np.nan
        bacc[c] = 0.5 * (tpr + tnr)

    if dense:
        sel = None
        fit = _fit_dense_jit(steps, lr)
        ys_tr = (y_tr[None, :] == np.arange(n_classes)[:, None]).astype(np.float32)
        w, b = fit(jnp.asarray(x_tr), jnp.asarray(ys_tr),
                   jnp.asarray(pos_w_all, jnp.float32))
        w, b = np.asarray(w), np.asarray(b)
        z_all = x_te @ w.T + b  # [N_te, C]
        for c in range(n_classes):
            if valid[c]:
                _score(c, z_all[:, c])
    else:
        sel = select_features_mean_diff(x_tr, y_tr, n_classes, k)
        fit = _fit_chunk_jit(steps, lr)
        for start in range(0, n_classes, class_chunk):
            cls = np.arange(start, min(start + class_chunk, n_classes))
            # pad the tail chunk so every chunk reuses one compiled program
            pad = class_chunk - len(cls)
            cls_p = np.concatenate([cls, np.repeat(cls[-1:], pad)]) if pad else cls
            xs_tr = x_tr[:, sel[cls_p]].transpose(1, 0, 2)  # [chunk, N_tr, k]
            ys_tr = (y_tr[None, :] == cls_p[:, None]).astype(np.float32)
            w, b = fit(jnp.asarray(xs_tr), jnp.asarray(ys_tr),
                       jnp.asarray(pos_w_all[cls_p], jnp.float32))
            w = np.asarray(w)
            b = np.asarray(b)
            for row, c in enumerate(cls):
                if valid[c]:
                    _score(c, x_te[:, sel[c]] @ w[row] + b[row])
    return {
        "auc": auc,
        "balanced_acc": bacc,
        "valid": valid,
        "selected": sel,
        "mean_auc": float(np.nanmean(auc[valid])) if valid.any() else float("nan"),
        "mean_balanced_acc": (
            float(np.nanmean(bacc[valid])) if valid.any() else float("nan")
        ),
    }


def collect_pooled_activations(pipeline, ds, side: str = "sae",
                               batch_size: int | None = None):
    """One pass over ``ds`` -> ([N, U] channel/token-mean activations, [N] labels).

    ``side='sae'``: the run's POST-activation sparse code via the cached eval
    step's 'probe_acts' (any SAE variant, transcoders, crosscoders) — the
    quantity SAEBench/Gao et al. probe ('topk_acts' is the dense PRE-activation
    code, kept for the top-k collection path only). ``side='original'``:
    the raw cfg.sae_layer tap, spatially pooled — the baseline representation at
    the same layer (for crosscoders this is the FIRST configured layer)."""
    import jax

    from sparse_vision_tpu.ops.metrics import spatial_mean

    bs = batch_size or pipeline.cfg.eval_batch_size or pipeline._auto_eval_batch_size()
    if side == "sae":
        step = pipeline._sae_eval_step_fn

        def acts_of(b):
            _, arrays = step(pipeline.ts.params, pipeline.frozen_params,
                             pipeline.net_state, b.images, b.labels)
            return arrays["probe_acts"]
    elif side == "original":
        layer = pipeline.cfg.sae_layer

        @jax.jit
        def tap(x):
            _, taps, _ = pipeline.net.apply(
                pipeline.frozen_params, x, state=pipeline.net_state, stop_at=layer
            )
            return spatial_mean(taps[layer])

        def acts_of(b):
            return tap(b.images)
    else:
        raise ValueError(f"side must be 'sae' or 'original', got {side!r}")

    acts, labels = [], []
    for b in pipeline._batches(ds, bs, shuffle=False):
        acts.append(np.asarray(acts_of(b), np.float32))
        labels.append(np.asarray(b.labels))
    if not acts:
        raise ValueError("Empty dataset for probing")
    return np.concatenate(acts), np.concatenate(labels)


def compute_sparse_probing(pipeline, ks=(1, 2, 5, 16), *, include_dense=True,
                           sides=None, steps: int = 300,
                           lr: float = 0.05, batch_size: int | None = None) -> dict:
    """Full probing sweep for a trained run: for each side (SAE latents vs raw
    layer channels) and each k, fit per-class probes on the TRAIN split and
    score on the VAL split. Writes ``probing/{run_id}_probing_epoch_{E}.csv``
    (side, k, class, auc, balanced_acc) + a summary JSON; returns the summary
    {'sae': {k: mean_auc, ...}, 'original': {...}, ...}.

    On an original-model run (no SAE; sae_layer names a backbone layer, the
    reference's parameter reuse, specify_parameters.py:245-247) only the raw
    channel side is probed."""
    cfg = pipeline.cfg
    if sides is None:
        sides = ("sae", "original") if cfg.use_sae else ("original",)
    epoch = (cfg.sae_checkpoint_epoch or cfg.sae_epochs) if cfg.use_sae else 0
    n_classes = len(pipeline.category_names)

    out_dir = os.path.join(pipeline.paths["evaluation_results"], "probing")
    os.makedirs(out_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, f"{pipeline.run_id}_probing_epoch_{epoch}.csv")
    json_path = os.path.join(out_dir, f"{pipeline.run_id}_probing_epoch_{epoch}.json")

    k_list = sorted({int(k) for k in ks if int(k) > 0})
    if include_dense:
        k_list = k_list + [0]  # 0 == dense (all features)

    summary: dict = {"run_id": pipeline.run_id, "epoch": epoch,
                     "n_classes": n_classes, "ks": k_list}
    rows = []
    for side in sides:
        tr_acts, tr_y = collect_pooled_activations(
            pipeline, pipeline.train_ds, side, batch_size
        )
        te_acts, te_y = collect_pooled_activations(
            pipeline, pipeline.val_ds, side, batch_size
        )
        summary[side] = {}
        n_feats = tr_acts.shape[1]
        for k in k_list:
            if 0 < n_feats <= k:
                # fit_probes falls back to the dense path here; labelling the
                # result 'k{k}' would report a duplicate of 'dense' as a
                # k-sparse probe, so collapse the key and say so.
                print(f"[probing] {side}: k={k} >= {n_feats} features — "
                      "dense fallback, recorded as 'dense'")
                if "dense" in summary[side]:
                    continue
                key = "dense"
            else:
                key = "dense" if k == 0 else f"k{k}"
            res = fit_probes(tr_acts, tr_y, te_acts, te_y, n_classes, k,
                             steps=steps, lr=lr)
            summary[side][key] = {
                "mean_auc": res["mean_auc"],
                "mean_balanced_acc": res["mean_balanced_acc"],
            }
            for c in range(n_classes):
                if not res["valid"][c]:
                    continue
                rows.append({
                    "side": side, "k": ("dense" if key == "dense" else k),
                    "class_idx": c,
                    "auc": res["auc"][c], "balanced_acc": res["balanced_acc"][c],
                })
            print(f"[probing] {side} {key}: mean AUC {res['mean_auc']:.4f}, "
                  f"balanced acc {res['mean_balanced_acc']:.4f}")

    with open(csv_path, "w", newline="") as f:
        writer = csv.DictWriter(
            f, fieldnames=["side", "k", "class_idx", "auc", "balanced_acc"]
        )
        writer.writeheader()
        writer.writerows(rows)
    with open(json_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[probing] wrote {csv_path}")
    return summary
