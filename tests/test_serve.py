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
    export_steering_service,
    make_feature_service_fn,
    make_steering_service_fn,
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


# ---- steering service ------------------------------------------------------


def _export_steering(tmp_path, sae_model_name="sae_mlp", **kw):
    net, params, state, sae_params = _small_setup(sae_model_name)
    out = export_steering_service(
        net, params, state, sae_model_name, sae_params, "fc1",
        str(tmp_path / "steer"), img_shape=IMG, topk=4, **kw,
    )
    return out, (net, params, state, sae_params)


@pytest.mark.parametrize("sae_model_name",
                         ["sae_mlp", "gated_sae", "topk_sae"])
def test_steering_identity_reproduces_original(tmp_path, sae_model_name):
    """Delta-mode identity steering (scale=1, bias=0 — the engine's default
    extras from the artifact's declared fills) is a no-op: the steered logits
    equal the ORIGINAL model's, SAE error preserved."""
    out_dir, _ = _export_steering(tmp_path, sae_model_name)
    eng = ServingEngine(out_dir, max_batch=8)
    assert eng.meta["steering_mode"] == "delta"
    assert [e["name"] for e in eng.meta["extra_inputs"]] == [
        "steer_scale", "steer_bias"]
    imgs = np.asarray(
        jax.random.normal(jax.random.key(7), (5, *IMG)), np.float32
    )
    out = eng.predict(imgs)
    np.testing.assert_allclose(out["logits_steered"], out["logits_original"],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sae_model_name",
                         ["sae_mlp", "gated_sae", "topk_sae"])
def test_steering_export_parity_random_vectors(tmp_path, sae_model_name):
    """Exported steering artifact == the live steering fn under an arbitrary
    per-latent affine edit, through bucket padding."""
    out_dir, (net, params, state, sae_params) = _export_steering(
        tmp_path, sae_model_name)
    h = sae_params["W_dec"].shape[0]
    scale = np.asarray(jax.random.uniform(jax.random.key(8), (h,)), np.float32)
    bias = np.asarray(
        0.1 * jax.random.normal(jax.random.key(9), (h,)), np.float32
    )
    eng = ServingEngine(out_dir, buckets=(4, 8))
    eng.set_extras(scale, bias)
    imgs = np.asarray(
        jax.random.normal(jax.random.key(10), (3, *IMG)), np.float32
    )
    served = eng.predict(imgs)  # pads 3 -> bucket 4
    live_fn = make_steering_service_fn(
        net, params, state, sae_model_name, sae_params, "fc1", topk=4)
    live = jax.tree.map(
        np.asarray,
        live_fn(jnp.asarray(imgs), jnp.asarray(scale), jnp.asarray(bias)),
    )
    for k in served:
        assert served[k].shape[0] == 3
        np.testing.assert_allclose(served[k], live[k], rtol=1e-5, atol=1e-5)
    # steering with a non-identity edit must actually move the logits
    assert not np.allclose(served["logits_steered"], served["logits_original"],
                           atol=1e-4)


def test_steering_splice_identity_matches_feature_service(tmp_path):
    """Splice-mode identity steering reproduces the SPLICED model — the same
    logits the feature_service artifact serves (eval-modified semantics)."""
    net, params, state, sae_params = _small_setup()
    out_dir = export_steering_service(
        net, params, state, "sae_mlp", sae_params, "fc1",
        str(tmp_path / "steer"), img_shape=IMG, mode="splice",
    )
    eng = ServingEngine(out_dir, max_batch=8)
    imgs = np.asarray(
        jax.random.normal(jax.random.key(11), (4, *IMG)), np.float32
    )
    out = eng.predict(imgs)
    feat_fn = make_feature_service_fn(
        net, params, state, "sae_mlp", sae_params, "fc1", top_k=4)
    want = np.asarray(feat_fn(jnp.asarray(imgs))["logits"])
    np.testing.assert_allclose(out["logits_steered"], want,
                               rtol=1e-5, atol=1e-5)


def test_steering_clamp_semantics(tmp_path):
    """Clamping one latent (scale_j=0, bias_j=v) pins its decoded contribution
    to exactly v * W_dec[j] in delta mode, independent of the image — pinned
    against a hand-built expectation through the decoder."""
    from sparse_vision_tpu.models.sae import (
        sae_inference_and_loss as live_splice,
    )

    net, params, state, sae_params = _small_setup()
    fn = make_steering_service_fn(
        net, params, state, "sae_mlp", sae_params, "fc1", topk=4)
    h = sae_params["W_dec"].shape[0]
    j, v = 3, 2.5
    scale = jnp.ones((h,)).at[j].set(0.0)
    bias = jnp.zeros((h,)).at[j].set(v)
    imgs = jax.random.normal(jax.random.key(12), (2, *IMG))
    out = fn(imgs, scale, bias)
    # expected: original stream + (v - z_j) * W_dec[j] delta at the tap,
    # propagated through the tail segment
    logits_orig, taps, _ = net.apply(params, imgs, state=state)
    act = taps["fc1"]
    res = live_splice("sae_mlp", sae_params, act, 0.0)
    z = res["encoded"]
    delta = (v - z[..., j])[..., None] * sae_params["W_dec"][j]
    spliced = act + delta
    want = net.apply_segment(params, spliced, after="fc1",
                             upto=net.stage_names[-1], state=state)
    np.testing.assert_allclose(np.asarray(out["logits_steered"]),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_steering_engine_extras_validation(tmp_path):
    out_dir, (_, _, _, sae_params) = _export_steering(tmp_path)
    h = sae_params["W_dec"].shape[0]
    eng = ServingEngine(out_dir, max_batch=4)
    with pytest.raises(ValueError, match="extra input"):
        eng.set_extras(np.ones((h + 1,), np.float32), np.zeros((h,), np.float32))
    with pytest.raises(ValueError, match="declares 2 extra"):
        eng.set_extras(np.ones((h,), np.float32))
    # plain artifacts declare no extras: set_extras(()) is the only legal call
    feat_dir, _ = _export(tmp_path)
    feat_eng = ServingEngine(feat_dir, max_batch=4)
    with pytest.raises(ValueError, match="declares 0 extra"):
        feat_eng.set_extras(np.ones((h,), np.float32))


def test_steering_rejects_conv_and_bad_mode(tmp_path):
    net, params, state, _ = _small_setup()
    conv_params = {"W_dec": np.zeros((4, 2, 3, 3), np.float32)}
    with pytest.raises(ValueError, match="token-decoder"):
        make_steering_service_fn(net, params, state, "sae_conv", conv_params,
                                 "fc1")
    with pytest.raises(ValueError, match="steering mode"):
        make_steering_service_fn(net, params, state, "sae_mlp", conv_params,
                                 "fc1", mode="nope")


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

    steer_dir = export_from_pipeline(pipe, str(tmp_path / "steer"),
                                     kind="steering_service")
    steer_eng = ServingEngine(steer_dir, max_batch=4)
    s_out = steer_eng.predict(np.zeros((2, *IMG), np.float32))
    np.testing.assert_allclose(s_out["logits_steered"],
                               s_out["logits_original"],
                               rtol=1e-5, atol=1e-5)

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


def test_bf16_weight_quantized_artifact(tmp_path):
    """weights_dtype=bfloat16 bakes every floating weight constant in bf16:
    the serialized module shrinks to ~half, outputs stay f32 (type promotion
    keeps the compute f32), and logits match the f32 artifact within
    weight-rounding error."""
    from sparse_vision_tpu.serve.artifact import MODULE_FILE

    out32, fn = _export(tmp_path, "sae_mlp")
    net, params, state, sae_params = _small_setup("sae_mlp")
    out16 = export_feature_service(
        net, params, state, "sae_mlp", sae_params, "fc1",
        str(tmp_path / "artifact16"), img_shape=IMG, top_k=4, topk=4,
        weights_dtype=jnp.bfloat16,
    )
    b32 = os.path.getsize(os.path.join(out32, MODULE_FILE))
    b16 = os.path.getsize(os.path.join(out16, MODULE_FILE))
    assert b16 < 0.65 * b32, (b16, b32)
    eng = ServingEngine(out16, max_batch=8)
    assert eng.meta["weights_dtype"] == "bfloat16"
    imgs = np.asarray(jax.random.normal(jax.random.key(2), (5, *IMG)),
                      np.float32)
    served = eng.predict(imgs)
    live = jax.tree.map(np.asarray, fn(jnp.asarray(imgs)))
    assert served["logits"].dtype == np.float32
    np.testing.assert_allclose(served["logits"], live["logits"],
                               rtol=0.05, atol=0.05)
    # ranking of the top features survives quantization on this small net
    agree = (served["top_indices"][:, 0] == live["top_indices"][:, 0]).mean()
    assert agree >= 0.8, agree


def test_bf16_artifact_conv_backbone(tmp_path):
    """CONV backbones through the bf16 export path: lax.conv requires equal
    operand dtypes (unlike jnp.dot's implicit promotion), so f32 images into
    bf16-quantized conv weights crashed the GoogLeNet serve export on the chip
    (chip_queue round 4, bench_serve rc=1). promote_conv_operands must upcast
    the weights at use — f32 compute, bf16 storage."""
    net = make_backbone("custom_cnn_1", "synthetic")
    params, state = init_backbone(net, jax.random.key(0), "synthetic")
    d = get_sae_input_size(net, "synthetic", "conv2")
    sae_params = init_sae("sae_mlp", jax.random.key(1), d, 2)
    out16 = export_feature_service(
        net, params, state, "sae_mlp", sae_params, "conv2",
        str(tmp_path / "artifact_conv16"), img_shape=IMG, top_k=4, topk=4,
        weights_dtype=jnp.bfloat16,
    )
    eng = ServingEngine(out16, max_batch=4)
    fn = make_feature_service_fn(
        net, params, state, "sae_mlp", sae_params, "conv2", top_k=4, topk=4,
    )
    imgs = np.asarray(jax.random.normal(jax.random.key(2), (3, *IMG)),
                      np.float32)
    served = eng.predict(imgs)
    live = jax.tree.map(np.asarray, fn(jnp.asarray(imgs)))
    assert served["logits"].dtype == np.float32
    np.testing.assert_allclose(served["logits"], live["logits"],
                               rtol=0.05, atol=0.05)


def test_cli_export_weights_dtype(tmp_path):
    """--export_weights_dtype bfloat16 reaches the artifact meta through the
    CLI train-then-export composition."""
    from sparse_vision_tpu.cli import main as cli_main

    cfg = json.dumps({
        "model_name": "custom_mlp_9", "sae_layer": "fc1",
        "dataset_name": "synthetic", "sae_epochs": 1, "sae_batch_size": 64,
        "directory_path": str(tmp_path), "log_every": 1000,
    })
    out = str(tmp_path / "artifact")
    rc = cli_main(["--run_pipeline", "--config", cfg, "--export_serving", out,
                   "--export_weights_dtype", "bfloat16"])
    assert rc == 0
    meta = json.load(open(os.path.join(out, META_FILE)))
    assert meta["weights_dtype"] == "bfloat16"


def test_export_clip_tower_feature_and_steering(tmp_path):
    """The serving tier works on the ViT/CLIP family: a CLIP tower run exports
    a feature-service artifact whose spliced/original logits match the
    in-process model on the rank-3 [B, N, D] tap, and the steering artifact's
    identity edit reproduces the original logits exactly (delta mode preserves
    the SAE error)."""
    from sparse_vision_tpu.models.sae import sae_inference_and_loss
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfg = _cfg(tmp_path, model_name="clip_vit_test", sae_layer="block0",
               dataset_name="synthetic", batch_size=32, sae_batch_size=32)
    pipe = Pipeline(cfg)
    img_shape = tuple(pipe.img_size)

    feat_dir = export_from_pipeline(pipe, str(tmp_path / "clip_feat"))
    eng = ServingEngine(feat_dir, max_batch=4)
    x = np.asarray(jax.random.normal(jax.random.key(3), (2, *img_shape)),
                   np.float32)
    out = eng.predict(x)

    logits_orig, taps, _ = pipe.net.apply(
        pipe.frozen_params, jnp.asarray(x), state=pipe.net_state
    )
    sae_out = sae_inference_and_loss(
        "sae_mlp", pipe.ts.params, taps["block0"], 0.0, training=False
    )
    logits_mod = pipe.net.apply_segment(
        pipe.frozen_params, sae_out["decoded"], after="block0",
        upto=pipe.net.stage_names[-1], state=pipe.net_state,
    )
    np.testing.assert_allclose(out["logits_original"], np.asarray(logits_orig),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out["logits"], np.asarray(logits_mod),
                               rtol=1e-4, atol=1e-4)
    # latents pooled over the TOKEN axis: [B, h]
    assert out["latents_mean"].shape == (2, pipe.sae_input_size * 2)

    steer_dir = export_from_pipeline(pipe, str(tmp_path / "clip_steer"),
                                     kind="steering_service")
    s_eng = ServingEngine(steer_dir, max_batch=4)
    s_out = s_eng.predict(x)
    np.testing.assert_allclose(s_out["logits_steered"],
                               s_out["logits_original"], rtol=1e-5, atol=1e-5)
