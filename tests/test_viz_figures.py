"""Viz + figure-utilities tests: feature visualization actually maximizes the target
unit, grids/plots get written, tar extraction pulls the right members, profiler
harness produces traces and timings."""

import os
import tarfile

import jax
import jax.numpy as jnp
import numpy as np

from sparse_vision_tpu.eval_tools import figures, viz
from sparse_vision_tpu.models.layers import SeqNet, conv, flatten, linear, relu


def _hf_energy_fraction(img: np.ndarray, thresh: float = 0.25) -> float:
    """Fraction of (mean-removed) spectral energy above ``thresh`` cycles/px."""
    img = np.asarray(img, np.float32)
    img = img - img.mean(axis=(0, 1), keepdims=True)
    spec = np.abs(np.fft.rfft2(img, axes=(0, 1))) ** 2
    h, w = img.shape[:2]
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    freqs = np.sqrt(fx * fx + fy * fy)
    total = float(spec.sum()) + 1e-12
    return float(spec[freqs > thresh].sum()) / total


def test_feature_visualization_increases_activation():
    """Both modes maximize the target unit; the FFT/decorrelated default
    (lucent's render recipe, reference utils.py:1892-1932) concentrates its
    energy at LOWER spatial frequencies than raw-pixel ascent — the property
    that keeps ImageNet-scale renders legible."""
    net = SeqNet([
        conv("conv1", 8, kernel=3, padding=1), relu("relu1"),
        flatten("flatten"), linear("fc", 4),
    ])
    params, _ = net.init(jax.random.key(0), (20, 20, 3))
    unit = 3

    def mean_act(x):
        _, taps, _ = net.apply(params, x[None], stop_at="relu1")
        return float(jnp.mean(taps["relu1"][..., unit]))

    x0 = 0.1 * np.asarray(jax.random.normal(jax.random.key(0), (20, 20, 3)))
    base = mean_act(jnp.asarray(x0))

    img_px = viz.feature_visualization(
        net, params, "relu1", unit, (20, 20, 3), steps=80, jitter=2, seed=0,
        mode="pixel",
    )
    assert mean_act(jnp.asarray(img_px)) > base + 0.1

    img_fft = viz.feature_visualization(
        net, params, "relu1", unit, (20, 20, 3), steps=200, lr=0.1, jitter=2,
        seed=0, mode="fft",
    )
    assert img_fft.min() >= 0.0 and img_fft.max() <= 1.0  # display-ready
    # the sigmoid constrains the image to [0, 1], so the fair baseline is the
    # mode's own near-gray starting render, not an unconstrained random input
    gray = 0.5 * np.ones((20, 20, 3), np.float32)
    assert mean_act(jnp.asarray(img_fft)) > mean_act(jnp.asarray(gray)) + 0.05
    assert mean_act(jnp.asarray(img_fft)) > base
    assert _hf_energy_fraction(img_fft) < _hf_energy_fraction(img_px)


def test_irfft2_dft_matmul_matches_numpy():
    """The explicit DFT-matmul inverse real FFT (viz._fft_param_image — jnp.fft
    has no lowering on the target TPU runtime) is numerically numpy's irfft2,
    including the Hermitian handling at f=0 / Nyquist, for odd AND even sizes,
    and stays differentiable."""
    rng = np.random.default_rng(0)
    for h, w in [(20, 20), (21, 21), (20, 21), (21, 20), (8, 3)]:
        spec = rng.normal(size=(2, 3, h, w // 2 + 1)).astype(np.float32)
        scale = rng.uniform(0.5, 2.0, (h, w // 2 + 1)).astype(np.float32)
        got = np.asarray(
            viz._fft_param_image(jnp.asarray(spec), jnp.asarray(scale), h, w))
        want = np.fft.irfft2(
            (spec[0] + 1j * spec[1]) * scale, s=(h, w)).transpose(1, 2, 0) / 4.0
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=2e-4, atol=2e-6)
    g = jax.grad(lambda s: jnp.sum(
        viz._fft_param_image(s, jnp.asarray(scale), h, w) ** 2))(
        jnp.asarray(spec))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


def test_grids_written(tmp_path, rng):
    imgs = rng.uniform(0, 1, (8, 10, 10, 1)).astype(np.float32)
    labels = rng.integers(0, 3, 8)
    logits = rng.normal(size=(8, 3)).astype(np.float32)
    p1 = viz.show_classification_with_images(
        imgs, labels, logits, ["a", "b", "c"], str(tmp_path / "cls.png")
    )
    by_unit = {0: imgs[:4], 5: imgs[4:]}
    vals = {0: rng.uniform(size=4), 5: rng.uniform(size=4)}
    p2 = viz.show_top_k_samples(by_unit, vals, str(tmp_path / "topk.png"))
    assert os.path.exists(p1) and os.path.exists(p2)


def test_gather_topk_images(rng):
    from sparse_vision_tpu.data.datasets import make_synthetic

    ds = make_synthetic(num_samples=32)
    topk_idx = np.array([[3, 5], [7, 1], [-1, 0]])  # one sentinel row
    out = viz.gather_topk_images(ds, topk_idx, units=[0, 1])
    assert out[0].shape[0] == 2  # sentinel dropped
    np.testing.assert_array_equal(out[0][0], ds.images[3])
    np.testing.assert_array_equal(out[1][2], ds.images[0])


def test_tar_extraction(tmp_path):
    src = tmp_path / "shard0.tar"
    os.makedirs(tmp_path / "payload", exist_ok=True)
    names = ["img_a.jpg", "img_b.jpg", "img_c.jpg"]
    for n in names:
        (tmp_path / "payload" / n).write_bytes(b"data-" + n.encode())
    with tarfile.open(src, "w") as tf:
        for n in names:
            tf.add(tmp_path / "payload" / n, arcname=f"train/{n}")
    out = viz.extract_images_from_tars(
        [str(src)], ["img_a.jpg", "img_c"], str(tmp_path / "out")
    )
    got = sorted(os.path.basename(p) for p in out)
    assert got == ["img_a.jpg", "img_c.jpg"]
    assert (tmp_path / "out" / "img_a.jpg").read_bytes() == b"data-img_a.jpg"


def test_figures_written(tmp_path, rng):
    node = {"mixed3a": rng.normal(size=128), "mixed3b": rng.normal(size=256)}
    assert os.path.exists(figures.plot_ie_histograms(node, str(tmp_path / "ie.png")))
    assert os.path.exists(figures.plot_node_count_vs_threshold(
        node, [1e-3, 1e-2, 1e-1, 1.0], str(tmp_path / "nodes.png")))
    assert os.path.exists(figures.plot_mis_over_epochs(
        {"exp8 l5": {1: 0.854, 5: 0.867, 15: 0.822}}, str(tmp_path / "mis.png"),
        baseline=0.834))
    assert os.path.exists(figures.plot_pixel_vs_channel_sparsity(
        {1: 0.757, 5: 0.9}, {1: 0.76, 5: 0.95}, str(tmp_path / "sp.png")))
    counts = figures.class_counts(np.array([0, 0, 1, 2, 2, 2]), 4)
    np.testing.assert_array_equal(counts, [2, 1, 3, 0])
    assert os.path.exists(figures.plot_class_counts(
        np.array([0, 0, 1]), 3, str(tmp_path / "cc.png")))


def test_timeit_device():
    from sparse_vision_tpu.utils.profiling import timeit_device

    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((64, 64))
    out = timeit_device(f, x, iters=3, trials=3)
    assert out["median_s"] > 0 and len(out["all_s"]) == 3


def test_maybe_profile(tmp_path):
    from sparse_vision_tpu.utils.profiling import maybe_profile

    with maybe_profile(None):
        pass  # no-op path
    with maybe_profile(str(tmp_path / "trace")):
        jnp.ones((4,)).sum().block_until_ready()
    assert os.path.isdir(tmp_path / "trace")


def test_gather_topk_images_empty_unit():
    from sparse_vision_tpu.data.datasets import make_synthetic
    from sparse_vision_tpu.eval_tools import viz
    import numpy as np

    ds = make_synthetic(num_samples=8)
    topk_idx = np.array([[-1, 2], [-1, 3]])  # unit 0 fully sentinel (dead unit)
    out = viz.gather_topk_images(ds, topk_idx, units=[0, 1])
    assert out[0].shape == (0, 28, 28, 1)
    assert out[1].shape[0] == 2


def _mis_csv(tmp_path, confs):
    import csv

    path = str(tmp_path / "mis.csv")
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["unit_idx", "MIS", "MIS_confidence",
                                          "layer_name"])
        w.writeheader()
        for i, c in enumerate(confs):
            w.writerow({"unit_idx": i, "MIS": (c + 1) / 2, "MIS_confidence": c,
                        "layer_name": "mixed3a"})
    return path


def test_mis_adjusted_for_dead_units(tmp_path):
    """mis_adjust_for_dead_units.py:1-109 semantics: mean/median before, after
    dropping dead rows, and over the dead rows alone."""
    confs = [0.9, 0.8, 0.1, 0.7, 0.2]  # units 2 and 4 dead with low MIS
    path = _mis_csv(tmp_path, confs)
    dead_mask = np.array([False, False, True, False, True])
    out = figures.mis_adjusted_for_dead_units(path, dead_mask, layer_name="mixed3a")
    assert out["n_dead"] == 2 and out["n_units"] == 5
    np.testing.assert_allclose(out["average_before"], np.mean(confs))
    np.testing.assert_allclose(out["median_before"], np.median(confs))
    np.testing.assert_allclose(out["average_after"], np.mean([0.9, 0.8, 0.7]))
    np.testing.assert_allclose(out["median_after"], 0.8)
    np.testing.assert_allclose(out["average_dead"], np.mean([0.1, 0.2]))
    # index-array input agrees with the mask input
    out2 = figures.mis_adjusted_for_dead_units(path, np.array([2, 4]))
    assert out2 == out


def test_mis_adjusted_layer_filter_excludes_bottleneck(tmp_path):
    import csv

    path = str(tmp_path / "mis.csv")
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["unit_idx", "MIS", "MIS_confidence",
                                          "layer_name"])
        w.writeheader()
        w.writerow({"unit_idx": 0, "MIS": 0.9, "MIS_confidence": 0.8,
                    "layer_name": "mixed3a"})
        w.writerow({"unit_idx": 1, "MIS": 0.2, "MIS_confidence": 0.1,
                    "layer_name": "mixed3a_bottleneck"})  # excluded (reference :47-48)
        w.writerow({"unit_idx": 2, "MIS": 0.5, "MIS_confidence": 0.4,
                    "layer_name": "mixed3b"})  # excluded by layer filter
    out = figures.mis_adjusted_for_dead_units(path, np.zeros(0, np.int64),
                                              layer_name="mixed3a")
    assert out["n_units"] == 1
    np.testing.assert_allclose(out["median_before"], 0.8)


def test_reinit_adjusted_median_series(tmp_path):
    """compute_mis_adjust_for_reinit_neurons.py:84-113: per-epoch medians with
    re-initialized units dropped; epochs without indices keep the raw median."""
    p1 = _mis_csv(tmp_path, [0.9, 0.1, 0.8])
    np.testing.assert_allclose(figures.adjusted_median_mis(p1, np.array([1])), 0.85)
    series = figures.mis_adjusted_series(
        {1: p1, 2: p1}, {2: np.array([1])}
    )
    np.testing.assert_allclose(series[1], 0.8)  # unadjusted median
    np.testing.assert_allclose(series[2], 0.85)


def test_run_logger_log_table():
    """log_table forwards a dataframe as wandb.Table under eval/ with commit=False
    (reference evaluation.py:62-63)."""
    import pandas as pd

    from sparse_vision_tpu.utils.logging import RunLogger

    calls = []

    class FakeWandb:
        class Table:
            def __init__(self, dataframe):
                self.df = dataframe

        @staticmethod
        def log(payload, commit=True):
            calls.append((payload, commit))

    logger = RunLogger.__new__(RunLogger)
    logger.wandb = FakeWandb
    df = pd.DataFrame({"a": [1, 2]})
    logger.log_table("sae_eval_results/run", df)
    (payload, commit), = calls
    assert commit is False
    assert list(payload) == ["eval/sae_eval_results/run"]
    assert payload["eval/sae_eval_results/run"].df.equals(df)
