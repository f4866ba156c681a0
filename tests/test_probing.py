"""Sparse-probing evaluation tier (eval_tools/probing.py).

Beyond-reference capability (Gao et al. 2024 §4.3 / SAEBench sparse probing):
k-sparse 1-vs-all probes on pooled SAE latents vs raw layer channels. Pinned
here: the rank-based AUC (hand-counted goldens incl. ties), the mean-diff
feature selection rule, probe quality on a synthetic separable task, the dense
(shared-feature) path, and the full pipeline tier end-to-end on a trained run.
"""

import numpy as np
import pytest

from sparse_vision_tpu.eval_tools.probing import (
    _auc_from_scores,
    compute_sparse_probing,
    fit_probes,
    select_features_mean_diff,
)


def test_auc_golden_hand_counted():
    z = np.array([0.1, 0.4, 0.35, 0.8])
    pos = np.array([0, 0, 1, 1], bool)
    assert _auc_from_scores(z, pos) == pytest.approx(0.75)
    # ties get 0.5 credit per tied pair
    z = np.array([1.0, 1.0, 0.0, 0.0])
    pos = np.array([1, 0, 1, 0], bool)
    assert _auc_from_scores(z, pos) == pytest.approx(0.5)
    # degenerate: single-class test split has no defined AUC
    assert np.isnan(_auc_from_scores(z, np.ones(4, bool)))


def test_mean_diff_selection_picks_indicator_features():
    rng = np.random.default_rng(0)
    n, c, f = 600, 4, 24
    y = rng.integers(0, c, n)
    x = rng.normal(0, 1.0, (n, f)).astype(np.float32)
    for cls in range(c):
        x[:, cls] = (y == cls) * 3.0 + rng.normal(0, 0.1, n)
    sel = select_features_mean_diff(x, y, c, k=2)
    assert sel.shape == (c, 2)
    # the indicator feature is each class's top pick
    np.testing.assert_array_equal(sel[:, 0], np.arange(c))


def _synthetic_probe_task(seed=0, n_tr=500, n_te=300, c=4, f=32):
    rng = np.random.default_rng(seed)
    y_tr = rng.integers(0, c, n_tr)
    y_te = rng.integers(0, c, n_te)

    def feats(y, n):
        x = rng.normal(0, 1.0, (n, f)).astype(np.float32)
        for cls in range(c):
            x[:, cls] = (y == cls) * 2.0 + rng.normal(0, 0.3, n)
        return x

    return feats(y_tr, n_tr), y_tr, feats(y_te, n_te), y_te


def test_fit_probes_sparse_recovers_separable_task():
    x_tr, y_tr, x_te, y_te = _synthetic_probe_task()
    res = fit_probes(x_tr, y_tr, x_te, y_te, n_classes=4, k=1, steps=150)
    assert res["valid"].all()
    assert res["mean_auc"] > 0.97, res["mean_auc"]
    assert res["mean_balanced_acc"] > 0.9, res["mean_balanced_acc"]
    # k=1 selected exactly the indicator features
    np.testing.assert_array_equal(res["selected"][:, 0], np.arange(4))


def test_fit_probes_dense_path_and_chunk_padding():
    x_tr, y_tr, x_te, y_te = _synthetic_probe_task(seed=1)
    dense = fit_probes(x_tr, y_tr, x_te, y_te, n_classes=4, k=0, steps=150)
    assert dense["mean_auc"] > 0.95, dense["mean_auc"]
    # chunking with a tail chunk (class_chunk=3 over 4 classes) matches the
    # single-chunk fit exactly: padded classes are re-fit, not garbage
    a = fit_probes(x_tr, y_tr, x_te, y_te, n_classes=4, k=2, steps=100,
                   class_chunk=3)
    b = fit_probes(x_tr, y_tr, x_te, y_te, n_classes=4, k=2, steps=100,
                   class_chunk=8)
    np.testing.assert_allclose(a["auc"], b["auc"], atol=1e-6)


def test_uninformative_features_give_chance_auc():
    rng = np.random.default_rng(2)
    x_tr = rng.normal(size=(400, 16)).astype(np.float32)
    x_te = rng.normal(size=(300, 16)).astype(np.float32)
    y_tr = rng.integers(0, 3, 400)
    y_te = rng.integers(0, 3, 300)
    res = fit_probes(x_tr, y_tr, x_te, y_te, n_classes=3, k=2, steps=100)
    assert 0.35 < res["mean_auc"] < 0.65, res["mean_auc"]


def test_sparse_probing_tier_e2e(tmp_path):
    """Train a tiny SAE run, then run the full probing tier: SAE latents beat
    chance, the raw-channel baseline is present, CSV + JSON artifacts land."""
    import json
    import os

    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfg = RunConfig(
        model_name="custom_mlp_9",
        sae_model_name="sae_mlp",
        sae_layer="fc1",
        directory_path=str(tmp_path),
        dataset_name="synthetic",
        model_epochs=1,
        model_learning_rate=1e-2,
        batch_size=64,
        model_optimizer_name="adam",
        sae_epochs=1,
        sae_learning_rate=1e-3,
        sae_optimizer_name="constrained_adam",
        sae_batch_size=64,
        sae_lambda_sparse=0.05,
        sae_expansion_factor=2,
        dead_neurons_steps=10_000,
        log_every=1000,
        original_model=False,
        training=True,
    )
    pipe = Pipeline(cfg)
    pipe.train_sae()
    summary = compute_sparse_probing(pipe, ks=(1, 4), steps=120)

    for side in ("sae", "original"):
        assert side in summary
        for key in ("k1", "k4", "dense"):
            auc = summary[side][key]["mean_auc"]
            assert np.isfinite(auc), (side, key, summary)
    # the synthetic blobs are linearly separable at fc1: dense probes on raw
    # channels must be near-perfect, and few-latent SAE probes beat chance
    assert summary["original"]["dense"]["mean_auc"] > 0.9, summary
    assert summary["sae"]["k4"]["mean_auc"] > 0.6, summary

    probing_dir = os.path.join(pipe.paths["evaluation_results"], "probing")
    epoch = cfg.sae_epochs
    csv_path = os.path.join(
        probing_dir, f"{pipe.run_id}_probing_epoch_{epoch}.csv"
    )
    json_path = os.path.join(
        probing_dir, f"{pipe.run_id}_probing_epoch_{epoch}.json"
    )
    assert os.path.exists(csv_path)
    with open(json_path) as f:
        on_disk = json.load(f)
    assert on_disk["sae"]["k1"]["mean_auc"] == summary["sae"]["k1"]["mean_auc"]


def test_probing_on_original_model_run(tmp_path):
    """No SAE in play (the reference's original_model sae_layer reuse,
    specify_parameters.py:245-247): only the raw-channel side is probed."""
    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfg = RunConfig(
        model_name="custom_mlp_9",
        sae_model_name="None",
        sae_layer="fc1",
        directory_path=str(tmp_path),
        dataset_name="synthetic",
        model_epochs=1,
        model_learning_rate=1e-2,
        batch_size=64,
        model_optimizer_name="adam",
        original_model=True,
        training=False,
        log_every=1000,
    )
    summary = compute_sparse_probing(Pipeline(cfg), ks=(2,), steps=100)
    assert "sae" not in summary
    # random-init fc1 features are random projections of linearly separable
    # blobs: the dense probe must still be far above chance
    assert summary["original"]["dense"]["mean_auc"] > 0.8, summary
