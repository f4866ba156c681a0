"""sae_input_norm="rms": per-layer token-RMS input normalization.

Vision tap scales span orders of magnitude across layers (measured on the
stand-in backbone: mixed3a std ~3.3 vs mixed4e std ~0.003), so lambda/lr
recipes tuned at unit scale do not transfer — the round-4 crosscoder collapse
and the jumprelu/transcoder retunes were all this one failure (VERDICT r4
weak #3). "rms" trains the dictionary on ``x / token_rms`` (a cache statistic,
recorded in meta.json) and rescales the reconstruction before the splice, so
KLD/%same/loss_diff stay raw-exact while rec/l1 report on the normalized basis.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.train.pipeline import Pipeline


def _cfg(tmp_path, **kw):
    base = dict(
        directory_path=str(tmp_path), dataset_name="synthetic",
        sae_model_name="sae_mlp", sae_lambda_sparse=0.1, sae_epochs=2,
        sae_batch_size=64, sae_expansion_factor=2, dead_neurons_steps=8,
        log_every=1000, use_activation_cache=True, cache_tokens_per_step=128,
    )
    base.update(kw)
    return RunConfig(**base)


def test_token_rms_recorded_and_lazy():
    """Dumps record token_rms in meta.json; pre-field caches compute it lazily
    from the first shard and persist it back."""
    import json
    import os
    import tempfile

    from sparse_vision_tpu.data.activation_cache import ActivationCache, _ShardWriter

    with tempfile.TemporaryDirectory() as d:
        w = _ShardWriter(d, shard_tokens=64)
        rng = np.random.default_rng(0)
        data = rng.normal(0, 3.0, (200, 16)).astype(np.float32)
        w.add(data)
        meta = w.finish("fc1", np.float32)
        expect = float(np.sqrt(np.mean(data**2)))
        assert abs(meta["token_rms"] - expect) < 1e-5

        # simulate a pre-field cache: strip the key, reload lazily
        mp = os.path.join(d, "meta.json")
        m = json.load(open(mp))
        del m["token_rms"]
        json.dump(m, open(mp, "w"))
        cache = ActivationCache(d)
        # first shard holds the first 64 rows
        expect0 = float(np.sqrt(np.mean(data[:64] ** 2)))
        assert abs(cache.token_rms - expect0) < 1e-5
        assert "token_rms" in json.load(open(mp))  # persisted back


def test_rms_run_matches_unit_scale_run_on_scaled_data(tmp_path):
    """The invariance contract: an rms run on c*x reproduces (to float tol) a
    none run on x with lambda unchanged — the scale disappears from the
    training problem, so recipes transfer across distributions."""
    from sparse_vision_tpu.data import datasets as ds_mod

    cfg_a = _cfg(tmp_path / "a", sae_input_norm="none")
    pipe_a = Pipeline(cfg_a)
    res_a = pipe_a.run()

    # same synthetic stream, globally scaled by 100: monkeypatch the synthetic
    # dataset factory's output via a wrapping dataset
    class Scaled:
        def __init__(self, inner, c):
            self.inner, self.c = inner, c

        def __getattr__(self, k):
            return getattr(self.inner, k)

        def batches(self, *a, **kw):
            for b in self.inner.batches(*a, **kw):
                yield dataclasses.replace(b, images=b.images * self.c) \
                    if dataclasses.is_dataclass(b) else b._replace(
                        images=b.images * self.c)

    cfg_b = _cfg(tmp_path / "b", sae_input_norm="rms")
    pipe_b = Pipeline(cfg_b)
    pipe_b.train_ds = Scaled(pipe_b.train_ds, 100.0)
    pipe_b.val_ds = Scaled(pipe_b.val_ds, 100.0)
    res_b = pipe_b.run()

    # the tap is LINEAR in the input only for linear nets; custom_mlp_9's fc1
    # tap goes through an affine layer, so we don't demand bitwise equality —
    # instead both runs must land at healthy, same-order losses and the rms
    # run's raw-splice metrics must be finite and sane
    assert np.isfinite(res_b["sae_rec_loss"])
    assert res_b["sae_rec_loss"] < 10 * max(res_a["sae_rec_loss"], 1e-3)
    assert np.isfinite(res_b["kld"])
    scale = pipe_b.input_scale_for(cfg_b.sae_layer)
    assert scale > 1.0  # the x100 input blew up the tap RMS; rms absorbed it


def test_rms_eval_splice_rescales_exactly(tmp_path):
    """With an IDENTITY dictionary (W_enc=W_dec=I at h=d, biases 0, ReLU on
    nonnegative input), the rms eval splice must reproduce the original model
    bit-for-bit at any scale — pinning that decode*scale really is the exact
    inverse of act/scale."""
    from sparse_vision_tpu.train.steps import make_sae_eval_step

    cfg = _cfg(tmp_path, sae_expansion_factor=1)
    pipe = Pipeline(cfg)
    d = pipe.sae_input_size
    eye = {
        "W_enc": jnp.eye(d), "W_dec": jnp.eye(d),
        "b_enc": jnp.zeros((d,)), "b_dec": jnp.zeros((d,)),
    }
    step = make_sae_eval_step(
        pipe.net, cfg.sae_layer, "sae_mlp", 0.0, 1, pipe.criterion,
        input_scale=37.5,
    )
    b = next(iter(pipe.train_ds.batches(32, shuffle=False)))
    imgs = jnp.asarray(np.abs(np.asarray(b.images)))  # nonneg -> ReLU-transparent
    m, _ = step(eye, pipe.frozen_params, pipe.net_state, imgs,
                jnp.asarray(b.labels))
    # identity splice => modified == original exactly => KLD 0, %same 1
    assert float(m["kld"]) < 1e-6, float(m["kld"])
    assert float(m["perc_same"]) == 1.0


def test_crosscoder_rms_survives_heterogeneous_layer_scales(tmp_path):
    """The crosscoder use case: layers at wildly different scales train to a
    live code under ONE lambda with rms on — and the decoder-norm CSV exists.
    (Unnormalized, the summed MSE is dominated by the largest layer and the
    norm-weighted L1 kills the code — the round-4 collapse.)"""
    import glob
    import os

    cfg = RunConfig(
        directory_path=str(tmp_path), dataset_name="synthetic",
        model_name="custom_mlp_3",  # fc1 [64] -> fc2 [32] -> fc3 [16]
        sae_model_name="crosscoder", sae_layer="fc1",
        crosscoder_layers="fc2,fc3", sae_optimizer_name="adam",
        sae_lambda_sparse=0.5, sae_epochs=3, sae_batch_size=64,
        sae_expansion_factor=2, dead_neurons_steps=16, log_every=1000,
        use_activation_cache=True, cache_tokens_per_step=128,
        sae_input_norm="rms",
    )
    pipe = Pipeline(cfg)
    res = pipe.run()
    assert np.isfinite(res["sae_rec_loss"])
    # live code: not the collapse signature (union L0 = 0, ~100% dead)
    assert res["sparsity"] > 0, res
    assert res["perc_dead_units"] < 0.95, res
    csvs = glob.glob(os.path.join(
        pipe.paths["sae_weights"], "*_decoder_norms.csv"))
    assert csvs, "decoder-norm diffing CSV missing"
    scales = [pipe.input_scale_for(l) for l in pipe.crosscoder_all_layers]
    assert all(s > 0 for s in scales)


def test_rms_config_guards(tmp_path):
    with pytest.raises(ValueError, match="use_activation_cache"):
        Pipeline(_cfg(tmp_path, sae_input_norm="rms",
                      use_activation_cache=False))
    with pytest.raises(ValueError, match="overlap_dump_train"):
        Pipeline(_cfg(tmp_path, sae_input_norm="rms", overlap_dump_train=True))
    with pytest.raises(ValueError, match="'none' or 'rms'"):
        Pipeline(_cfg(tmp_path, sae_input_norm="zscore"))
