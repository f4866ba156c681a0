"""Eval-epoch observability parity (VERDICT r1 item 4).

The reference's live eval-epoch figure set:
- channel-activation-FREQUENCY histogram every eval epoch (model_pipeline.py:1046-1068)
- last epoch: per-unit top-k/bottom-k activating-sample grids (utils.py:1496-1784)
  and streaming per-unit activation histograms with fixed bins from the recorded
  extrema, filled by one extra inference pass (model_pipeline.py:1488-1541,
  utils.py:1934-1994)

These tests assert (a) the files exist after a final eval epoch, and (b) the
channel-frequency figure is computed from the per-unit activation FREQUENCY
(mean over batches of the per-batch active fraction), NOT the per-unit max.
"""

import glob
import os

import jax
import numpy as np

from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.train.pipeline import Pipeline


def _cfg(tmp_path, **kw):
    defaults = dict(
        model_name="custom_mlp_9",
        sae_model_name="sae_mlp",
        sae_layer="fc1",
        directory_path=str(tmp_path),
        dataset_name="synthetic",
        sae_epochs=1,
        sae_batch_size=64,
        sae_expansion_factor=2,
        dead_neurons_steps=10_000,
        log_every=1000,
    )
    defaults.update(kw)
    return RunConfig(**defaults)


def test_final_eval_emits_reference_figure_set(tmp_path):
    pipe = Pipeline(_cfg(tmp_path))
    pipe.eval_modified(epoch=0, store=False, final=True)
    res = pipe.paths["evaluation_results"]
    assert glob.glob(os.path.join(res, "channel_frequency_histograms", "*_epoch_0.png"))
    assert glob.glob(os.path.join(res, "top_k_samples", "*_top_k_samples_epoch_0.png"))
    assert glob.glob(os.path.join(res, "top_k_samples", "*_small_k_samples_epoch_0.png"))
    assert glob.glob(os.path.join(res, "activation_histograms", "*_epoch_0.png"))
    # the MIS index artifact still appears alongside the figures
    assert glob.glob(os.path.join(res, "filename_indices", "*_epoch_0.npz"))


def test_non_final_eval_emits_frequency_histogram_only(tmp_path):
    pipe = Pipeline(_cfg(tmp_path))
    pipe.eval_modified(epoch=0, store=False, final=False)
    res = pipe.paths["evaluation_results"]
    assert glob.glob(os.path.join(res, "channel_frequency_histograms", "*_epoch_0.png"))
    assert not glob.glob(os.path.join(res, "top_k_samples", "*"))
    assert not glob.glob(os.path.join(res, "activation_histograms", "*"))


def test_channel_frequency_figure_plots_frequency_not_max(tmp_path, monkeypatch):
    pipe = Pipeline(_cfg(tmp_path))
    captured = {}
    orig = Pipeline._channel_frequency_figure

    def capture(self, freq, epoch):
        captured["freq"] = np.asarray(freq)
        return orig(self, freq, epoch)

    monkeypatch.setattr(Pipeline, "_channel_frequency_figure", capture)
    pipe.eval_modified(epoch=0, store=False)

    # independent recomputation: per-batch activation frequency, averaged over batches
    # (reference model_pipeline.py:815-818, 1007)
    step_fn = pipe._sae_eval_step_fn
    freq_sum, n = None, 0
    for b in pipe._batches(pipe.val_ds, pipe.cfg.sae_batch_size, shuffle=False):
        _, arrays = step_fn(
            pipe.ts.params, pipe.frozen_params, pipe.net_state, b.images, b.labels
        )
        f = np.asarray(arrays["freq"], np.float64)
        freq_sum = f if freq_sum is None else freq_sum + f
        n += 1
    expected = freq_sum / n
    np.testing.assert_allclose(captured["freq"], expected, rtol=1e-6)
    # frequencies are fractions in [0, 1] — the old (wrong) figure plotted max
    # activations, which are unbounded
    assert captured["freq"].min() >= 0.0 and captured["freq"].max() <= 1.0


def test_final_figures_cover_tar_shard_datasets(tmp_path):
    """gather_topk_images random access works on TarShardDataset (get_image)."""
    from sparse_vision_tpu.data.datasets import TarShardDataset, write_tar_shards
    from sparse_vision_tpu.eval_tools.viz import gather_topk_images

    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    paths, labels = [], []
    rng = np.random.default_rng(0)
    for i in range(8):
        p = str(img_dir / f"{i}.jpg")
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(p)
        paths.append(p)
        labels.append(i % 2)
    shards = write_tar_shards(paths, labels, str(tmp_path / "shards"), shard_size=4)
    ds = TarShardDataset(shards, ["a", "b"], decode_bytes_fn=_decode16)
    topk = np.array([[0, 3], [5, -1]], np.int32)  # [k=2, U=2] with one sentinel
    out = gather_topk_images(ds, topk, units=[0, 1])
    assert out[0].shape == (2, 16, 16, 3)
    assert out[1].shape == (1, 16, 16, 3)
    np.testing.assert_array_equal(out[0][0], ds.get_image(0))


def _decode16(data: bytes) -> np.ndarray:
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def test_feature_report_html(tmp_path):
    """write_feature_report consolidates a finished eval's artifacts into one
    self-contained HTML: headline metrics row, embedded base64 figures, and a
    per-unit table with persisted activity frequencies + dead flags."""
    from sparse_vision_tpu.eval_tools.report import write_feature_report

    pipe = Pipeline(_cfg(tmp_path))
    pipe.eval_modified(epoch=1, store=True, final=True)
    res = pipe.paths["evaluation_results"]
    out = write_feature_report(res, pipe.run_id, str(tmp_path / "report.html"))
    page = open(out).read()
    assert pipe.run_id in page
    assert page.count("data:image/png;base64,") >= 3  # embedded figure set
    n_units = pipe.num_units
    assert f"Per-unit stats ({n_units} latents" in page
    assert page.count("<tr><td>") >= n_units  # one row per latent
    assert "activity freq" in page and "Run metrics" in page
    # activity_freq persisted alongside the MIS indices (new npz field)
    import numpy as np

    npz = glob.glob(os.path.join(res, "filename_indices", "*_epoch_1.npz"))[0]
    with np.load(npz) as z:
        assert z["activity_freq"].shape == (n_units,)

    # a probing summary JSON (eval_tools/probing.py artifact) gains its own
    # section on re-render
    import json

    probing_dir = os.path.join(res, "probing")
    os.makedirs(probing_dir, exist_ok=True)
    with open(os.path.join(
            probing_dir, f"{pipe.run_id}_probing_epoch_1.json"), "w") as f:
        json.dump({"sae": {"k1": {"mean_auc": 0.91, "mean_balanced_acc": 0.84},
                           "dense": {"mean_auc": 0.99, "mean_balanced_acc": 0.97}},
                   "original": {"k1": {"mean_auc": 0.88,
                                       "mean_balanced_acc": 0.80}}}, f)
    page = open(write_feature_report(
        res, pipe.run_id, str(tmp_path / "report2.html"))).read()
    assert "Sparse probing" in page
    assert "0.9100" in page and "raw channels" in page
    # missing original-side dense entry renders as empty cells, not a crash
    assert "SAE latents" in page


def test_feature_report_cli_composes_with_run_pipeline(tmp_path):
    from sparse_vision_tpu.cli import main as cli_main

    cfg = _cfg(tmp_path)
    out = str(tmp_path / "r.html")
    rc = cli_main(["--run_pipeline", "--config", cfg.to_json(),
                   "--feature_report", out])
    assert rc == 0
    assert os.path.exists(out)
    assert "Feature report" in open(out).read()


def test_feature_report_circuit_section(tmp_path):
    """Passing ie_dir renders the circuit tier: node-IE histogram + top-node
    and top-edge tables from interp/ie.py's npz formats (save_node_ie, the
    edge_ie.npz idx: convention) and the faithfulness figure."""
    from sparse_vision_tpu.eval_tools.report import write_feature_report

    pipe = Pipeline(_cfg(tmp_path))
    pipe.eval_modified(epoch=1, store=True, final=True)
    res = pipe.paths["evaluation_results"]

    rng = np.random.default_rng(0)
    ie_dir = tmp_path / "ie"
    ie_dir.mkdir()
    np.savez(ie_dir / "node_ie.npz",
             **{"features:fc1": rng.normal(size=16),
                "error:fc1": np.float64(0.1),
                "model_neurons:fc1": rng.normal(size=8)})
    np.savez(ie_dir / "edge_ie.npz",
             **{"fc1->fc2": rng.normal(size=(5, 5)),
                "idx:fc1": np.arange(4), "idx:fc2": np.arange(4)})
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(1, 1))
    fig.savefig(ie_dir / "faithfulness.png")
    plt.close(fig)

    out = write_feature_report(res, pipe.run_id, str(tmp_path / "c.html"),
                               ie_dir=str(ie_dir))
    page = open(out).read()
    assert "Top nodes by |IE|" in page
    assert "Top edges by |IE|" in page
    assert "err/loss[4]" in page  # +1 row/col maps past the idx list
    assert "Faithfulness vs threshold" in page

    # without ie_dir the section stays absent (old pages unchanged)
    out2 = write_feature_report(res, pipe.run_id, str(tmp_path / "p.html"))
    assert "Top nodes by |IE|" not in open(out2).read()
