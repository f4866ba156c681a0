"""End-to-end slice (SURVEY.md §7.2 item 4 / BASELINE.json config 1): train-original ->
train-SAE -> eval-modified on synthetic data, single host, with checkpoint/resume.
This is the minimum-working-example analogue of the reference's smoke configs
(specify_parameters.py:64-99)."""

import dataclasses

import numpy as np
import pytest

from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.eval_tools.results import read_results
from sparse_vision_tpu.train.pipeline import Pipeline


def _base_cfg(tmp_path, **kw):
    defaults = dict(
        model_name="custom_mlp_9",
        sae_model_name="sae_mlp",
        sae_layer="fc1",
        directory_path=str(tmp_path),
        dataset_name="synthetic",
        model_epochs=2,
        model_learning_rate=1e-2,
        batch_size=64,
        model_optimizer_name="adam",
        sae_epochs=1,
        sae_learning_rate=1e-3,
        sae_optimizer_name="constrained_adam",
        sae_batch_size=64,
        sae_lambda_sparse=0.1,
        sae_expansion_factor=2,
        dead_neurons_steps=10_000,
        log_every=1000,
    )
    defaults.update(kw)
    return RunConfig(**defaults)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("runs")


def test_train_original_model_learns(workdir):
    cfg = _base_cfg(workdir, original_model=True, training=True, sae_model_name="None",
                    sae_layer="fc1")
    pipe = Pipeline(cfg)
    pipe.train_original()
    final = pipe.eval_original(epoch=cfg.model_epochs)
    assert final["accuracy"] > 0.8, f"model failed to learn: {final}"


def test_train_sae_improves_reconstruction(workdir):
    cfg = _base_cfg(workdir, original_model=False, training=True, sae_epochs=2)
    pipe = Pipeline(cfg)
    before = pipe.eval_modified(epoch=0, store=False)
    result = pipe.train_sae()
    assert result["sae_rec_loss"] < before["sae_rec_loss"], (before, result)
    # decoder latent directions stay unit-norm through training (ConstrainedAdam)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pipe.ts.params["W_dec"]), axis=1), 1.0, atol=1e-5
    )
    # results CSV written with the reference schema
    import os

    csv_path = os.path.join(pipe.paths["evaluation_results"], "sae_eval_results.csv")
    rows = read_results(csv_path)
    assert any(r["epochs"] == 2 for r in rows)
    row = [r for r in rows if r["epochs"] == 2][0]
    assert row["rec_loss"] is not None and row["perc_dead_units"] is not None


def test_checkpoint_resume_matches_straight_run(workdir):
    common = dict(original_model=False, training=True, dead_neurons_steps=10_000)
    cfg2 = _base_cfg(workdir, sae_epochs=2, directory_path=str(workdir / "straight"),
                     **common)
    pipe2 = Pipeline(cfg2)
    pipe2.train_sae()

    cfg1 = _base_cfg(workdir, sae_epochs=1, directory_path=str(workdir / "resumed"),
                     **common)
    pipe1 = Pipeline(cfg1)
    pipe1.train_sae()

    cfg_resume = dataclasses.replace(cfg1, sae_epochs=2, sae_checkpoint_epoch=1)
    pipe_r = Pipeline(cfg_resume)
    assert int(pipe_r.ts.step) == int(pipe1.ts.step)
    pipe_r.train_sae()

    assert int(pipe_r.ts.step) == int(pipe2.ts.step)
    for name in pipe_r.ts.params:
        np.testing.assert_allclose(
            np.asarray(pipe_r.ts.params[name]),
            np.asarray(pipe2.ts.params[name]),
            atol=1e-6,
            err_msg=f"resumed {name} != straight-run {name}",
        )


def test_gated_sae_end_to_end(workdir):
    cfg = _base_cfg(
        workdir, original_model=False, training=True, sae_model_name="gated_sae",
        sae_criterion_name="gated_sae_loss", sae_epochs=1,
        directory_path=str(workdir / "gated"),
    )
    pipe = Pipeline(cfg)
    result = pipe.train_sae()
    assert result["sae_aux_loss"] > 0  # gated loss has a live aux term


def test_mis_epoch_collects_200_indices(workdir):
    cfg = _base_cfg(workdir, original_model=False, training=False, mis="1",
                    directory_path=str(workdir / "mis"))
    pipe = Pipeline(cfg)
    pipe.run()
    import glob
    import os

    files = glob.glob(
        os.path.join(pipe.paths["evaluation_results"], "filename_indices", "*.npz")
    )
    assert files
    data = np.load(files[0])
    assert data["max_filename_indices"].shape[0] == 200  # n_mis*(k_mis+1), mp.py:82-102


def test_resnet18_finetune_path_with_scheduler(tmp_path):
    """The Tiny-ImageNet fine-tune configuration (reference utils.py:230-275):
    resnet18 surgery stem trained with sgd_w_scheduler on 64px synthetic data — the
    per-epoch StepLR advance must tick."""
    import jax
    import numpy as np

    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.ops.optim import EpochLRState
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfg = RunConfig(
        model_name="resnet18", dataset_name="synthetic", original_model=True,
        training=True, model_epochs=1, batch_size=64,
        model_optimizer_name="sgd_w_scheduler", model_learning_rate=1e-2,
        directory_path=str(tmp_path), log_every=1000,
    )
    # resnet18 expects 64px 3-channel input; synthetic defaults to 28x28x1.
    # Shrink the synthetic dataset too: a CPU resnet18 epoch over 512 images is slow.
    import functools

    import sparse_vision_tpu.config as C
    from sparse_vision_tpu.data import datasets as D

    old = C.IMG_SIZES["synthetic"]
    C.IMG_SIZES["synthetic"] = (64, 64, 3)
    old_make = D.make_synthetic
    D.make_synthetic = functools.partial(old_make, num_samples=128)
    try:
        p = Pipeline(cfg)
        mts = p.run()
        assert isinstance(mts.opt_state, EpochLRState)
        assert int(mts.opt_state.epoch) == 1  # scheduler ticked once
        assert int(mts.step) > 0
        assert np.all(np.isfinite(np.asarray(jax.tree.leaves(mts.params)[0])))
    finally:
        C.IMG_SIZES["synthetic"] = old
        D.make_synthetic = old_make


def test_async_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    import numpy as np

    from sparse_vision_tpu.train import checkpoint as ckpt

    tree = {"a": jnp.arange(8.0), "b": {"c": jnp.ones((3, 3))}}
    ckpt.save_checkpoint(str(tmp_path), 2, tree, blocking=False)
    ckpt.wait_for_saves()
    back = ckpt.load_checkpoint(str(tmp_path), 2, like=tree)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.arange(8.0))
    assert ckpt.latest_epoch(str(tmp_path)) == 2


def test_prefetch_reraises_producer_errors():
    import pytest

    from sparse_vision_tpu.data.datasets import Batch
    from sparse_vision_tpu.data.prefetch import prefetch

    def bad_iter():
        yield Batch(np.zeros((2, 4, 4, 1), np.float32), np.zeros(2, np.int32),
                    np.arange(2, dtype=np.int32))
        raise IOError("corrupt shard")

    it = prefetch(bad_iter())
    next(it)
    with pytest.raises(IOError, match="corrupt shard"):
        next(it)
