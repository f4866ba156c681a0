"""MIS pinned against an EXTERNAL similarity model (VERDICT r1 item 10).

The MIS scaffold (interp/mis.py: fair batches, 2-AFC task layout, query placement,
scoring, confidence) previously validated only against itself. Here it is pinned
end-to-end against a frozen torch conv embedder — a similarity model computed by a
DIFFERENT framework with deterministic weights (seeded numpy, no binary asset) — on a
fixed image fixture, with golden per-unit scores recorded below.

The fixture runs in float64 so the smallest 2-AFC decision margin (~1.9e-5) is ~7
orders of magnitude above cross-platform conv noise: the goldens are exact, not
tolerance-matched. Any change to task construction or scoring semantics breaks them.

Reference anchors (BASELINE.md): the reference's dreamsim-based MIS medians for
GoogLeNet mixed3a are 0.83-0.87; dreamsim's feature/regression pickles are private
(utils.py:2251-2255), so absolute parity is out of reach — this golden pins the task
construction numerically instead (see docs/MIGRATION.md §8).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from sparse_vision_tpu.interp.mis import (
    build_unit_tasks,
    compute_mis,
    embedding_similarity,
)

N_MIS, K_MIS = 4, 3
K_TOTAL = N_MIS * (K_MIS + 1)  # 16 samples per extreme per unit
N_IMG = 64

# golden values, generated once from this exact fixture + embedder
GOLDEN_MIS = [0.75, 0.375, 0.5]
GOLDEN_CONF = [0.5, 0.25, 0.0]
GOLDEN_MEDIAN = 0.25
GOLDEN_AVERAGE = 0.25


class _Embedder(nn.Module):
    """Tiny frozen conv embedder; weights are a deterministic numpy draw, so the
    'external model' ships as code, not a binary."""

    def __init__(self):
        super().__init__()
        self.c1 = nn.Conv2d(3, 8, 5, stride=2)
        self.c2 = nn.Conv2d(8, 16, 5, stride=2)

    def forward(self, x):
        return torch.relu(self.c2(torch.relu(self.c1(x)))).mean(dim=(2, 3))


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:28, 0:28].astype(np.float64)
    imgs = np.zeros((N_IMG, 28, 28, 3), np.float64)
    for i in range(N_IMG):
        # grating orientation sweeps vertical -> horizontal across the dataset,
        # giving the embedding space cluster structure the 2-AFC tasks can use
        theta = (np.pi / 2) * i / (N_IMG - 1)
        wave = np.sin((np.cos(theta) * xx + np.sin(theta) * yy) / 2.0)
        imgs[i] = 0.5 + 0.5 * wave[..., None] + 0.05 * rng.normal(size=(28, 28, 3))

    # three synthetic units: clean (activation == orientation), structure-free
    # (shuffled), and noisy-structured
    a0 = np.arange(N_IMG, dtype=np.float64)
    a1 = rng.permutation(N_IMG).astype(np.float64)
    a2 = a0 + rng.normal(0, 25, N_IMG)
    acts = np.stack([a0, a1, a2], 1)
    max_idx = np.argsort(-acts, axis=0)[:K_TOTAL]
    min_idx = np.argsort(acts, axis=0)[:K_TOTAL]

    wrng = np.random.default_rng(7)
    net = _Embedder().double()
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.from_numpy(wrng.normal(0, 0.2, p.shape)))
        emb = net(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    return max_idx, min_idx, {i: emb[i] for i in range(N_IMG)}


def test_mis_golden_against_torch_embedder(fixture):
    max_idx, min_idx, embs = fixture
    res = compute_mis(
        max_idx, min_idx, {i: i for i in range(N_IMG)}, N_MIS,
        embedding_similarity(embs), layer_name="fixture",
    )
    assert [r["MIS"] for r in res["per_unit"]] == GOLDEN_MIS
    assert [r["MIS_confidence"] for r in res["per_unit"]] == GOLDEN_CONF
    assert res["median_mis"] == GOLDEN_MEDIAN
    assert res["average_mis"] == GOLDEN_AVERAGE


def test_mis_decision_margins_are_robust(fixture):
    """Every 2-AFC decision in the golden fixture has a margin far above float
    noise — the goldens cannot flip from platform/BLAS differences."""
    max_idx, min_idx, embs = fixture
    sim = embedding_similarity(embs)
    margins = []
    for u in range(max_idx.shape[1]):
        for t in build_unit_tasks(list(max_idx[:, u]), list(min_idx[:, u]), N_MIS):
            half = len(t) // 2
            mins, maxs = t[:half], t[half:]
            for q, own, other in (
                (mins[-1], mins[:-1], maxs[:-1]),
                (maxs[-1], maxs[:-1], mins[:-1]),
            ):
                s_own = np.mean([sim(q, r) for r in own])
                s_other = np.mean([sim(q, r) for r in other])
                margins.append(abs(s_own - s_other))
    assert min(margins) > 1e-6, min(margins)


def test_mis_clean_unit_beats_shuffled_unit(fixture):
    """Sanity on the metric itself: a unit whose activation tracks real image
    structure scores above a structure-free (shuffled) unit."""
    max_idx, min_idx, embs = fixture
    res = compute_mis(
        max_idx, min_idx, {i: i for i in range(N_IMG)}, N_MIS,
        embedding_similarity(embs),
    )
    per = [r["MIS"] for r in res["per_unit"]]
    assert per[0] > per[1]


def test_reference_mis_stats_asset():
    """The derived thesis MIS distribution stats load and pin the BASELINE
    anchor: mixed3a median dreamsim confidence 0.8340 (reference
    supplementary_files_2/mis_reference_values.txt via compute_mis.py's
    aggregation: substring match, bottlenecks excluded)."""
    from sparse_vision_tpu.interp.mis import load_reference_mis_stats

    stats = load_reference_mis_stats()
    g = stats["groups"]
    assert g["mixed3a"]["median_confidence"] == pytest.approx(0.834, abs=5e-4)
    assert g["mixed3a"]["n_units"] == 256
    assert sum(v["n_units"] for v in g.values()) == 6812
    # deeper layers trend MORE interpretable in the thesis table
    assert g["mixed5b"]["median_confidence"] > g["mixed3a"]["median_confidence"]


def test_mis_distribution_check_shape_tripwire():
    """mis_distribution_check flags a broken similarity (all-chance scores)
    and passes a ceiling-shaped distribution with small quantile gaps."""
    from sparse_vision_tpu.interp.mis import mis_distribution_check

    rng = np.random.default_rng(0)
    # healthy: heavy ceiling mass, thin left tail (the thesis shape)
    healthy = np.clip(1.0 - rng.exponential(0.12, size=256), 0.0, 1.0)
    ok = mis_distribution_check(healthy, group="mixed3a")
    assert ok["above_chance_fraction"] > 0.9
    assert ok["max_abs_quantile_gap"] < 0.25
    assert ok["reference_median_confidence"] == pytest.approx(0.834, abs=5e-4)

    # broken similarity: confidence ~0 everywhere
    broken = np.abs(rng.normal(0.0, 0.02, size=256))
    bad = mis_distribution_check(broken, group="mixed3a")
    assert bad["above_chance_fraction"] < 0.5
    assert bad["max_abs_quantile_gap"] > 0.5
