"""Serving tier: jax.export AOT artifacts + the batched engine (serve/).

The reference has no deployment path (SURVEY.md §0 — evaluation always
re-imports model code in-process); these tests pin the TPU-native serving
contract: export -> serialized StableHLO on disk -> reload in a fresh
Python object graph -> numeric parity with the live model, under bucket
padding, request chunking, static-batch artifacts, and the micro-batching
worker.
"""

import json
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.models.backbone import (
    get_sae_input_size,
    init_backbone,
    make_backbone,
)
from sparse_vision_tpu.models.sae import init_sae, sae_encode
from sparse_vision_tpu.serve.artifact import (
    ARTIFACT_VERSION,
    META_FILE,
    load_artifact,
)
from sparse_vision_tpu.serve.engine import ServingEngine, _bucket_ladder
from sparse_vision_tpu.serve.exporter import (
    export_feature_service,
    export_from_pipeline,
    make_feature_service_fn,
)

IMG = (28, 28, 1)


def _small_setup(sae_model_name="sae_mlp"):
    net = make_backbone("custom_mlp_9", "synthetic")
    params, state = init_backbone(net, jax.random.key(0), "synthetic")
    d = get_sae_input_size(net, "synthetic", "fc1")
    sae_params = init_sae(sae_model_name, jax.random.key(1), d, 2)
    return net, params, state, sae_params


def _export(tmp_path, sae_model_name="sae_mlp", **kw):
    net, params, state, sae_params = _small_setup(sae_model_name)
    out = export_feature_service(
        net, params, state, sae_model_name, sae_params, "fc1",
        str(tmp_path / "artifact"), img_shape=IMG, top_k=4, topk=4, **kw,
    )
    fn = make_feature_service_fn(
        net, params, state, sae_model_name, sae_params, "fc1", top_k=4, topk=4,
    )
    return out, fn


@pytest.mark.parametrize("sae_model_name",
                         ["sae_mlp", "gated_sae", "topk_sae"])
def test_export_roundtrip_parity(tmp_path, sae_model_name):
    out_dir, fn = _export(tmp_path, sae_model_name)
    eng = ServingEngine(out_dir, max_batch=8)
    imgs = np.asarray(
        jax.random.normal(jax.random.key(2), (5, *IMG)), np.float32
    )
    served = eng.predict(imgs)
    live = jax.tree.map(np.asarray, fn(jnp.asarray(imgs)))
    assert set(served) == {"logits", "logits_original", "latents_mean",
                           "top_values", "top_indices"}
    for k in served:
        assert served[k].shape[0] == 5
        np.testing.assert_allclose(served[k], live[k], rtol=1e-5, atol=1e-5)
    assert eng.meta["kind"] == "feature_service"
    assert eng.meta["sae_model_name"] == sae_model_name
    assert eng.meta["batch"] == "poly"


def test_bucket_padding_and_chunking(tmp_path):
    out_dir, fn = _export(tmp_path)
    eng = ServingEngine(out_dir, buckets=(2, 4))
    assert eng.buckets == (2, 4)
    imgs = np.asarray(
        jax.random.normal(jax.random.key(3), (9, *IMG)), np.float32
    )
    # n=3 pads to bucket 4; n=9 > max bucket chunks into 4+4+1->2
    live = jax.tree.map(np.asarray, fn(jnp.asarray(imgs)))
    for n in (1, 2, 3, 9):
        served = eng.predict(imgs[:n])
        for k in served:
            assert served[k].shape[0] == n
            np.testing.assert_allclose(served[k], live[k][:n],
                                       rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError):
        eng.predict(np.zeros((2, 7, 7, 1), np.float32))


def test_static_batch_artifact(tmp_path):
    out_dir, fn = _export(tmp_path, poly_batch=False, example_batch=4)
    eng = ServingEngine(out_dir)
    assert eng.buckets == (4,)  # static artifact pins the ladder
    imgs = np.asarray(
        jax.random.normal(jax.random.key(4), (3, *IMG)), np.float32
    )
    served = eng.predict(imgs)
    live = jax.tree.map(np.asarray, fn(jnp.asarray(imgs)))
    np.testing.assert_allclose(served["logits"], live["logits"],
                               rtol=1e-5, atol=1e-5)


def test_artifact_version_guard(tmp_path):
    out_dir, _ = _export(tmp_path)
    meta_path = os.path.join(out_dir, META_FILE)
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["artifact_version"] == ARTIFACT_VERSION
    assert meta["jax_version"] == jax.__version__
    meta["artifact_version"] = ARTIFACT_VERSION + 1
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="artifact version"):
        load_artifact(out_dir)
    with pytest.raises(ValueError, match="not a serving artifact"):
        load_artifact(str(tmp_path))


def test_bucket_ladder():
    assert _bucket_ladder(64) == (1, 2, 4, 8, 16, 32, 64)
    assert _bucket_ladder(48) == (1, 2, 4, 8, 16, 32, 48)
    assert _bucket_ladder(1) == (1,)


def test_microbatching_worker(tmp_path):
    out_dir, _ = _export(tmp_path)
    eng = ServingEngine(out_dir, max_batch=8, linger_ms=20.0)
    eng.start()
    try:
        imgs = np.asarray(
            jax.random.normal(jax.random.key(5), (6, *IMG)), np.float32
        )
        futs = [None] * 6

        def submit(i):
            futs[i] = eng.submit(imgs[i])

        threads = [threading.Thread(target=submit, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        direct = eng.predict(imgs)
        for i, fut in enumerate(futs):
            res = fut.result(timeout=30)
            np.testing.assert_allclose(res["logits"], direct["logits"][i],
                                       rtol=1e-5, atol=1e-5)
            assert res["top_indices"].shape == (4,)
    finally:
        eng.stop()


def _cfg(tmp_path, **kw):
    defaults = dict(
        model_name="custom_mlp_9", sae_layer="fc1", dataset_name="synthetic",
        directory_path=str(tmp_path / "runs"), sae_epochs=1, sae_batch_size=64,
        batch_size=64, sae_expansion_factor=2, dead_neurons_steps=100,
        wandb_status=False, log_every=1000, sae_topk=4,
    )
    defaults.update(kw)
    return RunConfig(**defaults)


def test_export_from_pipeline_kinds(tmp_path):
    from sparse_vision_tpu.train.pipeline import Pipeline

    pipe = Pipeline(_cfg(tmp_path))
    enc_dir = export_from_pipeline(pipe, str(tmp_path / "enc"),
                                   kind="sae_encoder")
    bb_dir = export_from_pipeline(pipe, str(tmp_path / "bb"), kind="backbone")

    exported, meta = load_artifact(enc_dir)
    assert meta["kind"] == "sae_encoder" and meta["run_id"] == pipe.run_id
    tok = np.asarray(
        jax.random.normal(jax.random.key(6), (7, pipe.sae_input_size)),
        np.float32,
    )
    got = exported.call(tok)["encoded"]
    want = sae_encode("sae_mlp", pipe.ts.params, jnp.asarray(tok))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    eng = ServingEngine(bb_dir, max_batch=4)
    out = eng.predict(np.zeros((2, *IMG), np.float32))
    assert out["logits"].shape == (2, 10)

    with pytest.raises(ValueError, match="unknown artifact kind"):
        export_from_pipeline(pipe, str(tmp_path / "x"), kind="nope")


def test_cli_train_then_export(tmp_path):
    from sparse_vision_tpu.cli import main as cli_main

    cfg = _cfg(tmp_path)
    art_dir = str(tmp_path / "served")
    rc = cli_main(["--run_pipeline", "--config", cfg.to_json(),
                   "--export_serving", art_dir])
    assert rc == 0
    eng = ServingEngine(art_dir, max_batch=4)
    out = eng.predict(np.ones((3, *IMG), np.float32))
    assert np.all(np.isfinite(out["logits"]))
    # the exported weights are the TRAINED epoch's, not the init
    assert eng.meta["sae_layer"] == "fc1"
    assert eng.meta["outputs"] == ["logits", "logits_original",
                                   "latents_mean", "top_values", "top_indices"]
