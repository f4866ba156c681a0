"""End-to-end KL finetune after MSE training (train/e2e_finetune.py;
arXiv:2503.17272 "a short finetune is all you need"): the spliced model's
fidelity metrics must improve beyond what MSE training reached."""

import numpy as np
import pytest

from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.train.pipeline import Pipeline


def _cfg(d, **kw):
    defaults = dict(
        model_name="custom_mlp_9", sae_model_name="sae_mlp", sae_layer="fc1",
        dataset_name="synthetic", directory_path=str(d),
        sae_epochs=2, sae_batch_size=64, batch_size=64,
        sae_learning_rate=1e-3, sae_optimizer_name="constrained_adam",
        sae_lambda_sparse=0.1, sae_expansion_factor=2,
        dead_neurons_steps=10_000, log_every=1000,
    )
    defaults.update(kw)
    return RunConfig(**defaults)


def test_e2e_finetune_improves_kld(tmp_path):
    """MSE-train, then 3 KL epochs: downstream KLD drops below the MSE-trained
    model's, and the finetune's per-epoch checkpoints/results land after the
    training epochs."""
    from sparse_vision_tpu.eval_tools.results import read_results
    from sparse_vision_tpu.train import checkpoint as ckpt

    base = Pipeline(_cfg(tmp_path / "mse"))
    r_mse = base.run()

    ft = Pipeline(_cfg(tmp_path / "ft", sae_e2e_finetune_epochs=3))
    ft.frozen_params, ft.net_state = base.frozen_params, base.net_state
    r_ft = ft.run()
    assert r_ft["kld"] < r_mse["kld"], (r_mse["kld"], r_ft["kld"])
    assert r_ft["perc_same"] >= r_mse["perc_same"] - 0.02
    # decoder rows stay unit-norm through the KL pass (ConstrainedAdam)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(ft.ts.params["W_dec"]), axis=1), 1.0, atol=1e-4
    )
    # finetune epochs checkpoint after the training epochs (resume-compatible)
    assert ckpt.latest_epoch(ft._sae_ckpt_dir()) == 2 + 3
    import os

    rows = read_results(
        os.path.join(ft.paths["evaluation_results"], "sae_eval_results.csv")
    )
    assert any(r["epochs"] == 5 for r in rows)


def test_e2e_finetune_cached_path(tmp_path):
    """The cached trainer runs the finetune too (activation-cache MSE epochs,
    then image-driven KL epochs)."""
    pipe = Pipeline(_cfg(
        tmp_path, use_activation_cache=True, cache_tokens_per_step=64,
        sae_epochs=1, sae_e2e_finetune_epochs=1,
    ))
    before = pipe.eval_modified(epoch=0, store=False)
    r = pipe.run()
    assert int(pipe.ts.step) > 0
    assert r["kld"] < before["kld"]


def test_e2e_finetune_data_mesh(tmp_path):
    """The finetune runs under the 8-device data mesh via GSPMD (sharded image
    batches, replicated SAE state) and matches the single-device result."""
    p1 = Pipeline(_cfg(tmp_path / "single", sae_epochs=1,
                       sae_e2e_finetune_epochs=1,
                       use_activation_cache=True, cache_tokens_per_step=64))
    r1 = p1.run()
    p8 = Pipeline(_cfg(tmp_path / "mesh", sae_epochs=1,
                       sae_e2e_finetune_epochs=1, mesh_shape=(8,),
                       use_activation_cache=True, cache_tokens_per_step=64))
    p8.frozen_params, p8.net_state = p1.frozen_params, p1.net_state
    r8 = p8.run()
    for k in ("kld", "sae_rec_loss"):
        np.testing.assert_allclose(float(r8[k]), float(r1[k]), rtol=1e-4, err_msg=k)


def test_e2e_finetune_resume_runs_remainder(tmp_path):
    """Resuming with sae_checkpoint_epoch past the MSE epochs runs only the
    REMAINING finetune epochs, numbered continuously — matching the straight run."""
    from sparse_vision_tpu.train import checkpoint as ckpt

    kw = dict(sae_epochs=1, sae_e2e_finetune_epochs=2)
    p_straight = Pipeline(_cfg(tmp_path / "straight", **kw))
    r_straight = p_straight.run()

    # stop after MSE + 1 finetune epoch, then resume for the remainder
    p_a = Pipeline(_cfg(tmp_path / "resume", sae_epochs=1,
                        sae_e2e_finetune_epochs=1))
    p_a.frozen_params, p_a.net_state = p_straight.frozen_params, p_straight.net_state
    p_a.run()
    p_b = Pipeline(_cfg(tmp_path / "resume", sae_checkpoint_epoch=2, **kw))
    p_b.frozen_params, p_b.net_state = p_straight.frozen_params, p_straight.net_state
    r_b = p_b.run()
    assert ckpt.latest_epoch(p_b._sae_ckpt_dir()) == 3
    for k in ("kld", "sae_rec_loss"):
        np.testing.assert_allclose(
            float(r_b[k]), float(r_straight[k]), rtol=1e-4, err_msg=k
        )


def test_e2e_finetune_alpha_mse_anchor(tmp_path):
    """alpha_mse > 0 keeps the reconstruction from drifting while KL improves."""
    pipe = Pipeline(_cfg(tmp_path, sae_epochs=1, sae_e2e_finetune_epochs=2,
                         sae_e2e_alpha_mse=1.0))
    r = pipe.run()
    assert np.isfinite(r["sae_rec_loss"]) and np.isfinite(r["kld"])


def _transcoder_cfg(d, **kw):
    defaults = dict(
        model_name="custom_mlp_8", sae_model_name="transcoder",
        sae_layer="fc1", transcoder_target_layer="fc2",
        dataset_name="synthetic", directory_path=str(d),
        sae_epochs=1, sae_batch_size=64, batch_size=64,
        sae_learning_rate=1e-3, sae_optimizer_name="constrained_adam",
        sae_lambda_sparse=0.05, sae_expansion_factor=2,
        dead_neurons_steps=10_000, use_activation_cache=True,
        cache_tokens_per_step=64, log_every=1000,
    )
    defaults.update(kw)
    return RunConfig(**defaults)


def test_e2e_finetune_transcoder(tmp_path):
    """The KL finetune works through the transcoder's segment-skip splice:
    KLD drops below the MSE-trained transcoder's, the rectangular decoder rows
    stay unit-norm (ConstrainedAdam), and the finetune epochs checkpoint after
    the training epochs."""
    from sparse_vision_tpu.train import checkpoint as ckpt

    p_mse = Pipeline(_transcoder_cfg(tmp_path / "mse"))
    r_mse = p_mse.run()
    p_ft = Pipeline(_transcoder_cfg(tmp_path / "ft", sae_e2e_finetune_epochs=2))
    p_ft.frozen_params, p_ft.net_state = p_mse.frozen_params, p_mse.net_state
    r_ft = p_ft.run()
    assert r_ft["kld"] < r_mse["kld"], (r_mse["kld"], r_ft["kld"])
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(p_ft.ts.params["W_dec"]), axis=1), 1.0,
        atol=1e-4,
    )
    assert ckpt.latest_epoch(p_ft._sae_ckpt_dir()) == 1 + 2


def _crosscoder_cfg(d, **kw):
    defaults = dict(
        model_name="custom_mlp_3", sae_model_name="crosscoder",
        sae_layer="fc1", crosscoder_layers="fc2,fc3",
        dataset_name="synthetic", directory_path=str(d),
        sae_epochs=1, sae_batch_size=64, batch_size=64,
        sae_learning_rate=1e-3, sae_optimizer_name="adam",
        sae_lambda_sparse=0.05, sae_expansion_factor=2,
        dead_neurons_steps=10_000, use_activation_cache=True,
        cache_tokens_per_step=64, log_every=1000,
    )
    defaults.update(kw)
    return RunConfig(**defaults)


def test_e2e_finetune_crosscoder(tmp_path):
    """The KL finetune works through the crosscoder's acausal splice: KLD
    drops below the MSE-trained crosscoder's, and the decoder-norm diffing CSV
    is re-written from the FINETUNED params."""
    import os

    import pandas as pd

    from sparse_vision_tpu.models.crosscoder import crosscoder_decoder_norms

    p_mse = Pipeline(_crosscoder_cfg(tmp_path / "mse"))
    r_mse = p_mse.run()
    p_ft = Pipeline(_crosscoder_cfg(tmp_path / "ft", sae_e2e_finetune_epochs=2))
    p_ft.frozen_params, p_ft.net_state = p_mse.frozen_params, p_mse.net_state
    r_ft = p_ft.run()
    assert r_ft["kld"] < r_mse["kld"], (r_mse["kld"], r_ft["kld"])
    csvs = [f for f in os.listdir(p_ft.paths["sae_weights"])
            if f.endswith("_decoder_norms.csv")]
    assert len(csvs) == 1
    df = pd.read_csv(os.path.join(p_ft.paths["sae_weights"], csvs[0]))
    norms = np.asarray(crosscoder_decoder_norms(
        {k: np.asarray(v) for k, v in p_ft.ts.params.items()}
    ))
    for i, layer in enumerate(("fc1", "fc2", "fc3")):
        np.testing.assert_allclose(
            df[f"norm_{layer}"].to_numpy(), norms[i], rtol=1e-5,
            err_msg=f"diffing CSV stale for {layer} (must be post-finetune)",
        )


def test_e2e_finetune_transcoder_data_mesh(tmp_path):
    """The transcoder finetune runs under the 8-device data mesh via GSPMD and
    matches the single-device result."""
    p1 = Pipeline(_transcoder_cfg(tmp_path / "single", sae_e2e_finetune_epochs=1))
    r1 = p1.run()
    p8 = Pipeline(_transcoder_cfg(tmp_path / "mesh", sae_e2e_finetune_epochs=1,
                                  mesh_shape=(8,)))
    p8.frozen_params, p8.net_state = p1.frozen_params, p1.net_state
    r8 = p8.run()
    for k in ("kld", "sae_rec_loss"):
        np.testing.assert_allclose(float(r8[k]), float(r1[k]), rtol=1e-4,
                                   err_msg=k)


def test_e2e_finetune_crosscoder_tp_mesh(tmp_path):
    """The crosscoder finetune runs under the (2, 4) tensor-parallel mesh via
    GSPMD (the state keeps the latent sharding TP training left it in) and
    matches the single-device result."""
    p1 = Pipeline(_crosscoder_cfg(tmp_path / "single", sae_e2e_finetune_epochs=1))
    r1 = p1.run()
    ptp = Pipeline(_crosscoder_cfg(tmp_path / "tp", sae_e2e_finetune_epochs=1,
                                   mesh_shape=(2, 4)))
    ptp.frozen_params, ptp.net_state = p1.frozen_params, p1.net_state
    rtp = ptp.run()
    for k in ("kld", "sae_rec_loss"):
        np.testing.assert_allclose(float(rtp[k]), float(r1[k]), rtol=1e-4,
                                   err_msg=k)


def test_e2e_finetune_tensor_parallel_mesh(tmp_path):
    """The finetune runs under the (2, 4) tensor-parallel mesh via GSPMD (the
    SAE state stays latent-sharded over 'model' from training) and matches the
    single-device result."""
    p1 = Pipeline(_cfg(tmp_path / "single", sae_epochs=1,
                       sae_e2e_finetune_epochs=1,
                       use_activation_cache=True, cache_tokens_per_step=64))
    r1 = p1.run()
    ptp = Pipeline(_cfg(tmp_path / "tp", sae_epochs=1,
                        sae_e2e_finetune_epochs=1, mesh_shape=(2, 4),
                        use_activation_cache=True, cache_tokens_per_step=64))
    ptp.frozen_params, ptp.net_state = p1.frozen_params, p1.net_state
    rtp = ptp.run()
    for k in ("kld", "sae_rec_loss"):
        np.testing.assert_allclose(float(rtp[k]), float(r1[k]), rtol=1e-4, err_msg=k)
    # the finetuned SAE is still genuinely latent-sharded over 'model'
    shard_rows = {s.data.shape[0] for s in ptp.ts.params["W_dec"].addressable_shards}
    assert shard_rows == {ptp.num_units // 4}, shard_rows
