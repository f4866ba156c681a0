"""Per-model input preprocessing: ViT/CLIP towers take their HF processors'
EXACT numerics (pinned against transformers' CLIPImageProcessor /
ViTImageProcessor here), the CNN family keeps the lucent-InceptionV1 229px
convention (reference utils.py:318-329), and a wrong-convention tensor cannot
silently enter a tower (the patch conv would crop the remainder)."""

import io
import os

import numpy as np
import pytest

from sparse_vision_tpu.config import get_img_size, is_vit_family
from sparse_vision_tpu.data.datasets import (
    clip_decode_bytes,
    decode_fns_for_model,
    imagenet_decode,
    imagenet_decode_bytes,
    vit_decode_bytes,
    write_tar_shards,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _random_jpeg_bytes(w=300, h=240, seed=0, quality=95):
    arr = np.random.default_rng(seed).integers(0, 255, size=(h, w, 3),
                                               dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


@pytest.mark.parametrize("wh", [(300, 240), (240, 300), (224, 224), (500, 175)])
def test_clip_preprocessing_matches_hf(wh):
    """clip_decode_bytes == transformers.CLIPImageProcessor (default config:
    shortest-edge-224 BICUBIC, center crop 224, rescale, OpenAI CLIP stats)."""
    transformers = pytest.importorskip("transformers")

    data = _random_jpeg_bytes(*wh, seed=hash(wh) % 2**31)
    proc = transformers.CLIPImageProcessor()
    want = proc(Image.open(io.BytesIO(data)), return_tensors="np")[
        "pixel_values"][0].transpose(1, 2, 0)  # CHW -> HWC
    got = clip_decode_bytes(data)
    assert got.shape == (224, 224, 3)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("wh", [(300, 240), (224, 224), (100, 80)])
def test_vit_preprocessing_matches_hf(wh):
    """vit_decode_bytes == transformers.ViTImageProcessor (default config:
    direct 224x224 BILINEAR resize, rescale, mean/std 0.5)."""
    transformers = pytest.importorskip("transformers")

    data = _random_jpeg_bytes(*wh, seed=hash(wh) % 2**31)
    proc = transformers.ViTImageProcessor()
    want = proc(Image.open(io.BytesIO(data)), return_tensors="np")[
        "pixel_values"][0].transpose(1, 2, 0)
    got = vit_decode_bytes(data)
    assert got.shape == (224, 224, 3)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_decode_routing_per_model_family():
    assert decode_fns_for_model("clip_vit_b16") == (
        decode_fns_for_model("clip_vit_b16_split"))
    assert decode_fns_for_model("clip_vit_b16")[1] is clip_decode_bytes
    assert decode_fns_for_model("vit_base")[1] is vit_decode_bytes
    assert decode_fns_for_model("vit_base_split")[1] is vit_decode_bytes
    assert decode_fns_for_model("inceptionv1") == (
        imagenet_decode, imagenet_decode_bytes)
    assert decode_fns_for_model("resnet50")[1] is imagenet_decode_bytes


def test_img_size_is_model_aware():
    assert get_img_size("imagenet") == (229, 229, 3)
    assert get_img_size("imagenet", "inceptionv1") == (229, 229, 3)
    assert get_img_size("imagenet", "clip_vit_b16") == (224, 224, 3)
    assert get_img_size("imagenet", "vit_base_split") == (224, 224, 3)
    # non-ImageNet datasets keep their native sizes for the ViT family
    assert get_img_size("cifar_10", "vit_test") == (32, 32, 3)
    assert is_vit_family("clip_vit_l14_split") and is_vit_family("vit_tiny")
    assert not is_vit_family("resnet18") and not is_vit_family("custom_mlp_9")


def test_tower_rejects_wrong_convention_inputs():
    """A 229px InceptionV1-convention tensor must NOT silently enter a ViT or
    CLIP tower (a VALID stride-16 conv would crop the remainder)."""
    import jax

    from sparse_vision_tpu.models.backbone import init_backbone, make_backbone

    for name in ("vit_test", "clip_vit_test"):
        net = make_backbone(name, "imagenet")
        assert net.input_size == (224, 224, 3)
        params, state = init_backbone(net, jax.random.key(0), "imagenet")
        bad = np.zeros((1, 229, 229, 3), np.float32)
        with pytest.raises(ValueError, match="not divisible by patch"):
            net.apply(params, bad, state=state)
        ok = np.zeros((1, 224, 224, 3), np.float32)
        logits, _, _ = net.apply(params, ok, state=state)
        assert logits.shape == (1, 1000)


@pytest.mark.slow
def test_real_jpeg_to_clip_sae_e2e(tmp_path):
    """The probe_clip_sae flow on REAL data: JPEG files -> webdataset tar
    shards -> CLIPImageProcessor-convention decode -> CLIP tower tap -> SAE
    trains (rec loss drops). Closes the round-3 gap where every ViT/CLIP test
    ran on synthetic tensors."""
    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.pipeline import Pipeline

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "jpegs"
    img_dir.mkdir()
    paths, labels = [], []
    for i in range(48):
        # class-dependent mean so activations carry real signal
        base = np.full((240, 300, 3), 40 + 40 * (i % 4), np.uint8)
        noise = rng.integers(0, 80, size=(240, 300, 3), dtype=np.uint8)
        p = str(img_dir / f"img_{i:03d}.jpg")
        Image.fromarray(base + noise).save(p, quality=92)
        paths.append(p)
        labels.append(i % 4)

    data_dir = tmp_path / "data"
    base = data_dir / "imagenet"
    write_tar_shards(paths[:32], labels[:32], str(base), shard_size=16,
                     prefix="train")
    write_tar_shards(paths[32:], labels[32:], str(base), shard_size=16,
                     prefix="val")

    cfg = RunConfig(
        model_name="clip_vit_test", sae_model_name="sae_mlp",
        sae_layer="block0", sae_optimizer_name="constrained_adam",
        dataset_name="imagenet", data_dir=str(data_dir),
        directory_path=str(tmp_path / "runs"), sae_epochs=1,
        sae_batch_size=8, batch_size=8, eval_batch_size=8,
        sae_expansion_factor=2, sae_learning_rate=3e-3,
        dead_neurons_steps=100, log_every=1000,
    )
    pipe = Pipeline(cfg)
    assert pipe.img_size == (224, 224, 3)
    # the decoded batches really are CLIP-normalized 224px tensors
    b = next(pipe.train_ds.batches(8, shuffle=False))
    assert b.images.shape == (8, 224, 224, 3)
    assert -3.0 < b.images.min() and b.images.max() < 3.0  # not raw pixels
    before = pipe.eval_modified(epoch=0, store=False)
    res = pipe.run()
    assert res["sae_rec_loss"] < before["sae_rec_loss"], (before, res)
    assert np.isfinite(res["kld"])
