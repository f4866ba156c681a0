"""End-to-end mode tests through the CLI and Pipeline dispatch: sweep -> train SAE ->
results CSV -> post-hoc evaluation; MIS collection + scoring; IE modes 1/2/3/4i.

These drive the same five run modes as the reference's main.py/deploy_model dispatch
(model_pipeline.py:1288-1425) on the synthetic dataset.
"""

import json
import os

import numpy as np
import pytest

from sparse_vision_tpu.cli import main as cli_main
from sparse_vision_tpu.config import RunConfig, Sweep
from sparse_vision_tpu.train.pipeline import Pipeline


def _base_cfg(tmp_path, **kw):
    defaults = dict(
        model_name="custom_mlp_9",
        sae_layer="fc1",
        dataset_name="synthetic",
        directory_path=str(tmp_path / "runs"),
        sae_epochs=1,
        sae_batch_size=64,
        batch_size=64,
        sae_expansion_factor=2,
        dead_neurons_steps=100,
        wandb_status=False,
        log_every=1000,
    )
    defaults.update(kw)
    return RunConfig(**defaults)


def test_cli_sweep_train_and_evaluate(tmp_path):
    sweep = Sweep(
        axes={"sae_lambda_sparse": [0.1, 1.0]},
        base=_base_cfg(tmp_path),
    )
    params_path = str(tmp_path / "sweep.jsonl")
    n = sweep.write_jsonl(params_path)
    assert n == 2

    rc = cli_main(["--run_pipeline", "--parameters", params_path])
    assert rc == 0

    results_dir = str(tmp_path / "runs" / "custom_mlp_9" / "synthetic" /
                      "evaluation_results_sae_mlp")
    csv_path = os.path.join(results_dir, "sae_eval_results.csv")
    assert os.path.exists(csv_path)

    rc = cli_main(["--run_evaluation", "--results_csv", csv_path])
    assert rc == 0
    assert os.path.exists(os.path.join(results_dir, "sae_rank_table.csv"))
    assert os.path.exists(os.path.join(results_dir, "pareto.png"))


def test_cli_single_line_and_legacy_format(tmp_path):
    cfg = _base_cfg(tmp_path)
    legacy_path = str(tmp_path / "parameters.txt")
    with open(legacy_path, "w") as f:
        f.write(cfg.to_legacy_line() + "\n")
        f.write(cfg.to_legacy_line() + "\n")
    rc = cli_main(["--run_pipeline", "--parameters", legacy_path, "--line", "0"])
    assert rc == 0


def test_mis_collect_then_score(tmp_path):
    # train one epoch so a checkpoint exists
    train_cfg = _base_cfg(tmp_path)
    Pipeline(train_cfg).run()

    # mode mis="1": collect per-unit max/min sample indices on TRAIN data
    collect_cfg = _base_cfg(tmp_path, training=False, mis="1", sae_checkpoint_epoch=1)
    p = Pipeline(collect_cfg)
    p.run()
    fn_dir = os.path.join(p.paths["evaluation_results"], "filename_indices")
    saved = [f for f in os.listdir(fn_dir) if f.endswith("_epoch_1.npz")]
    assert saved
    data = np.load(os.path.join(fn_dir, saved[0]))
    assert data["max_filename_indices"].shape[0] == 200  # n_mis*(k_mis+1)

    # mode mis="2": score
    score_cfg = _base_cfg(tmp_path, training=False, mis="2", sae_checkpoint_epoch=1)
    p2 = Pipeline(score_cfg)
    result = p2.run()
    assert 0.0 <= result["median_mis"] <= 1.0
    mis_dir = os.path.join(p2.paths["evaluation_results"], "MIS")
    assert os.listdir(mis_dir)
    # median_mis recorded into the merged results CSV
    import csv as csvmod

    with open(os.path.join(p2.paths["evaluation_results"], "sae_eval_results.csv")) as f:
        rows = list(csvmod.DictReader(f))
    assert any(r["median_mis"] not in ("", None) for r in rows)


def test_ie_modes(tmp_path):
    train_cfg = _base_cfg(tmp_path)
    Pipeline(train_cfg).run()

    def run_flag(flag):
        cfg = _base_cfg(tmp_path, training=False, compute_ie=flag, sae_checkpoint_epoch=1)
        return Pipeline(cfg).run()

    avgs = run_flag("1")
    p = Pipeline(_base_cfg(tmp_path, training=False, compute_ie="1", sae_checkpoint_epoch=1))
    d = p.paths["ie_related_quantities"]
    assert os.path.exists(os.path.join(d, "averages.npz"))
    assert os.path.exists(os.path.join(d, "sparsity.csv"))
    assert avgs.enc["fc1"].shape == (32,)  # width 16 * expansion 2

    node = run_flag("2")
    assert node.features["fc1"].shape == (32,)
    assert os.path.exists(os.path.join(d, "node_ie.npz"))

    edges = run_flag("3")
    # single-layer circuit: only the loss-node column for the last (=only) layer
    assert edges["fc1"].shape == (17, 1)  # top-16 features + error node
    assert os.path.exists(os.path.join(d, "edge_ie.npz"))

    rows = run_flag("40")  # threshold = FAITHFULNESS_THRESHOLDS[0] = 1e-10
    assert {r["variant"] for r in rows} == {"sae", "model"}
    assert os.path.exists(os.path.join(d, "faithfulness.csv"))
    assert os.path.exists(os.path.join(d, "faithfulness.png"))


def test_cached_sae_training_mode(tmp_path):
    """use_activation_cache=True: cache is built once, SAE trains from it, losses
    improve, checkpoints + results written like the standard path."""
    cfg = _base_cfg(tmp_path, use_activation_cache=True, cache_tokens_per_step=512,
                    sae_epochs=2)
    p = Pipeline(cfg)
    result = p.run()
    assert result is not None and "sae_rec_loss" in result
    cache_dir = os.path.join(p.paths["evaluation_results"], "activation_cache", "fc1")
    assert os.path.exists(os.path.join(cache_dir, "meta.json"))
    assert int(p.ts.step) > 0
    # second run reuses the cache (meta unchanged) and resumes cleanly
    cfg2 = _base_cfg(tmp_path, use_activation_cache=True, cache_tokens_per_step=512,
                     sae_epochs=3, sae_checkpoint_epoch=2)
    p2 = Pipeline(cfg2)
    p2.run()
    assert int(p2.ts.step) > int(p.ts.step)


def test_ie_with_original_model_rejected(tmp_path):
    """IE stays SAE-only (reference guard specify_parameters.py:229-230); MIS on the
    original model is supported (see test_mis_original_model_collect_then_score)."""
    cfg = _base_cfg(tmp_path, original_model=True, training=False, compute_ie="1")
    with pytest.raises(ValueError, match="original"):
        Pipeline(cfg).run()
    # the CLI validates configs before running them (the reference's sweep guards)
    rc = None
    try:
        cli_main(["--run_pipeline", "--config", cfg.to_json()])
    except ValueError:
        rc = "raised"
    assert rc == "raised"


def test_mis_original_model_collect_then_score(tmp_path):
    """MIS on the ORIGINAL model's channels — the reference's control experiment
    (specify_parameters.py:245-247 reuses sae_layer to name a backbone layer;
    model_pipeline.py:344-345 collects top-k when no SAE is in play). Produced the
    original-mixed3a MIS anchors 0.834/0.804 (visualize_mis.py:24, 119-120)."""
    # train the original model one epoch so trained weights exist
    Pipeline(_base_cfg(tmp_path, original_model=True, training=True,
                       model_epochs=1)).run()

    # mode mis="1": collect per-unit max/min sample indices of the fc1 channels
    collect_cfg = _base_cfg(tmp_path, original_model=True, training=False, mis="1")
    p = Pipeline(collect_cfg)
    p.run()
    assert p.num_units == 16  # custom_mlp_9 fc1 width
    fn_dir = os.path.join(p.paths["evaluation_results"], "filename_indices")
    saved = [f for f in os.listdir(fn_dir) if f.endswith("_epoch_0.npz")]
    assert saved
    data = np.load(os.path.join(fn_dir, saved[0]))
    assert data["max_filename_indices"].shape == (200, 16)  # n_mis*(k_mis+1) x units
    assert (data["max_filename_indices"] >= 0).all()
    assert data["dead_units"].shape == (16,)

    # mode mis="2": score the original layer's channels
    score_cfg = _base_cfg(tmp_path, original_model=True, training=False, mis="2")
    p2 = Pipeline(score_cfg)
    result = p2.run()
    assert 0.0 <= result["median_mis"] <= 1.0
    assert len(result["per_unit"]) == 16
    mis_dir = os.path.join(p2.paths["evaluation_results"], "MIS")
    assert os.listdir(mis_dir)


def test_eval_original_final_figures(tmp_path):
    """Standalone original-model eval with a named layer is its own last epoch:
    top-k grids + activation histograms + frequency histogram over that layer's
    channels (record_top_samples semantics for (layer, 'original'))."""
    cfg = _base_cfg(tmp_path, original_model=True, training=False)
    p = Pipeline(cfg)
    means = p.run()
    assert "accuracy" in means
    res = p.paths["evaluation_results"]
    assert any(f.endswith(".png") for f in
               os.listdir(os.path.join(res, "top_k_samples")))
    assert any(f.endswith(".png") for f in
               os.listdir(os.path.join(res, "activation_histograms")))
    assert any(f.endswith(".png") for f in
               os.listdir(os.path.join(res, "channel_frequency_histograms")))


def test_registry_checkpoint_contract(tmp_path):
    """layer_ckpt_dir must name EXACTLY the directory Pipeline saves a registry-
    hyperparameter SAE run into, and load_frozen_sae must restore those params."""
    import jax
    import jax.numpy as jnp

    from sparse_vision_tpu.interp.registry import (
        LAYER_SAE_CONFIGS,
        layer_ckpt_dir,
        load_frozen_sae,
    )
    from sparse_vision_tpu.train import checkpoint as ckpt
    from sparse_vision_tpu.utils.paths import folder_paths

    reg = LAYER_SAE_CONFIGS["mixed3a"]
    # a Pipeline run training mixed3a's SAE with the registry hyperparameters
    # (tiny width stand-in for the real 256-channel layer)
    cfg = _base_cfg(
        tmp_path, sae_layer="mixed3a",
        sae_learning_rate=reg.learning_rate, sae_batch_size=reg.batch_size,
        sae_optimizer_name=reg.optimizer, sae_expansion_factor=reg.expansion_factor,
        sae_lambda_sparse=reg.lambda_sparse, dead_neurons_steps=reg.dead_neurons_steps,
    )
    p = Pipeline.__new__(Pipeline)  # only need the path scheme, not a real run
    p.cfg = cfg
    p.paths = folder_paths(cfg)
    expected_dir = p._sae_ckpt_dir()
    assert layer_ckpt_dir(p.paths["checkpoints"], "mixed3a") == expected_dir

    # write a Pipeline-style checkpoint at the registry's known-good epoch and
    # verify load_frozen_sae restores those exact params
    from sparse_vision_tpu.models.sae import init_sae_mlp

    width = 16
    trained = init_sae_mlp(jax.random.key(42), width, reg.expansion_factor)
    trained = {k: v + 1.5 for k, v in trained.items()}  # distinguish from random init
    ckpt.save_checkpoint(
        expected_dir, reg.checkpoint_epoch,
        {"params": trained, "opt_state": {}, "step": jnp.int32(7),
         "dead_acc": jnp.ones(width * reg.expansion_factor, bool)},
    )
    frozen = load_frozen_sae("mixed3a", width, checkpoint_dir=expected_dir)
    np.testing.assert_allclose(
        np.asarray(frozen.params["W_dec"]), np.asarray(trained["W_dec"]), rtol=1e-6
    )


def test_store_faithfulness_update_in_place(tmp_path):
    """Rows keyed on (variant, thresholds) update in place like the reference's xlsx
    (compute_ie.py:917-944)."""
    import csv as csvmod

    from sparse_vision_tpu.interp.ie import store_faithfulness

    path = str(tmp_path / "faithfulness.csv")
    store_faithfulness(path, [
        {"variant": "sae", "feature_node_threshold": 1e-4,
         "error_node_threshold": 1e-4, "faithfulness": 0.5},
        {"variant": "model", "feature_node_threshold": 1e-4,
         "error_node_threshold": 1e-4, "faithfulness": 0.4},
    ])
    # same key again -> overwrite; new threshold -> append
    store_faithfulness(path, [
        {"variant": "sae", "feature_node_threshold": 1e-4,
         "error_node_threshold": 1e-4, "faithfulness": 0.7},
        {"variant": "sae", "feature_node_threshold": 1e-3,
         "error_node_threshold": 1e-3, "faithfulness": 0.9},
    ])
    with open(path) as f:
        rows = list(csvmod.DictReader(f))
    assert len(rows) == 3
    by_key = {(r["variant"], r["feature_node_threshold"]): r["faithfulness"]
              for r in rows}
    assert by_key[("sae", "0.0001")] == "0.7"  # overwritten
    assert by_key[("sae", "0.001")] == "0.9"
    assert by_key[("model", "0.0001")] == "0.4"


def test_cli_line_out_of_range(tmp_path):
    cfg = _base_cfg(tmp_path)
    p = str(tmp_path / "params.jsonl")
    with open(p, "w") as f:
        f.write(cfg.to_json() + "\n")
    with pytest.raises(IndexError):
        cli_main(["--run_pipeline", "--parameters", p, "--line", "5"])


def test_examples_run(tmp_path):
    """The shipped examples must stay runnable (they are user-facing docs)."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=root + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "examples", "discover_circuit.py")],
        # generous: on a 1-CPU box the parent pytest process's XLA device threads
        # contend with this subprocess (observed 229s solo, >560s in round 2,
        # >900s in round 3 as the suite grew to 215 tests)
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "faithfulness=1.0000" in r.stdout


def test_multichip_example_runs(tmp_path):
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=root + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "examples", "multichip_cached_training.py"),
         str(tmp_path)],
        # same 1-core contention allowance as test_examples_run
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "multichip example OK" in r.stdout
    assert "tensor-parallel mesh (2, 4)" in r.stdout


def test_new_examples_run(tmp_path):
    """vmap_sweep and train_transcoder examples stay runnable (user-facing docs)."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=root + os.pathsep + os.environ.get("PYTHONPATH", ""))
    for script in ("vmap_sweep.py", "train_transcoder.py",
                    "crosscoder_diffing.py", "transcoder_circuit.py",
                    "serving.py", "probe_clip_sae.py", "vit_circuit.py"):
        r = subprocess.run(
            [sys.executable, os.path.join(root, "examples", script),
             str(tmp_path / script[:-3])],
            # same 1-core contention allowance as test_examples_run
            env=env, capture_output=True, text=True, timeout=1800,
        )
        assert r.returncode == 0, script + ": " + r.stdout[-2000:] + r.stderr[-2000:]
        assert r.stdout.rstrip().endswith("OK"), script


def test_mis_comparison_example_runs(tmp_path):
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=root + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "examples", "mis_original_vs_sae.py"),
         str(tmp_path)],
        # same 1-core contention allowance as test_examples_run
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "MIS comparison example OK" in r.stdout


def test_cli_multilayer(tmp_path):
    """--multilayer trains SAEs for a comma list of layers off one shared dump
    (train/multilayer.py through the CLI)."""
    cfg = _base_cfg(tmp_path, use_activation_cache=True, cache_tokens_per_step=512)
    rc = cli_main(["--run_pipeline", "--config", cfg.to_json(),
                   "--multilayer", "fc1"])
    assert rc == 0
    evald = str(tmp_path / "runs" / "custom_mlp_9" / "synthetic" /
                "evaluation_results_sae_mlp")
    assert os.path.exists(os.path.join(evald, "activation_cache", "fc1", "meta.json"))
    assert os.path.exists(os.path.join(evald, "sae_eval_results.csv"))


def test_multilayer_circuit_example_runs(tmp_path):
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=root + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "examples", "multilayer_circuit.py"),
         str(tmp_path)],
        # same 1-core contention allowance as test_examples_run
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "multilayer circuit example OK" in r.stdout


def test_cli_does_not_override_pinned_platform(tmp_path, monkeypatch):
    """cli_main must not flip jax_platforms when a caller already pinned one:
    re-applying the env value moved every later computation in a CPU-forced
    process onto the env's accelerator (TPU default-precision matmuls silently
    replacing f32 CPU math — the source of an order-dependent parity flake)."""
    import jax

    assert jax.config.jax_platforms == "cpu"  # pinned by conftest
    monkeypatch.setenv("JAX_PLATFORMS", "tpu")
    rc = cli_main([])  # exits early ("nothing to do") after the platform block
    assert rc == 2
    assert jax.config.jax_platforms == "cpu"


def test_cli_multilayer_vit_attention_taps(tmp_path):
    """--multilayer on a split ViT tower: SAEs for two ATTENTION taps train off
    ONE shared multi-tap dump of rank-3 [B, N, D] token streams."""
    cfg = _base_cfg(tmp_path, model_name="vit_test_split", sae_layer="block0_attn",
                    batch_size=32, sae_batch_size=32,
                    use_activation_cache=True, cache_tokens_per_step=512)
    rc = cli_main(["--run_pipeline", "--config", cfg.to_json(),
                   "--multilayer", "block0_attn,block1_attn"])
    assert rc == 0
    evald = str(tmp_path / "runs" / "vit_test_split" / "synthetic" /
                "evaluation_results_sae_mlp")
    for layer in ("block0_attn", "block1_attn"):
        assert os.path.exists(
            os.path.join(evald, "activation_cache", layer, "meta.json")), layer
    assert os.path.exists(os.path.join(evald, "sae_eval_results.csv"))
