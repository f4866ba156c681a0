"""ViT backbone (beyond-reference model family): HF-transformers golden parity,
tap/splice contract on the residual stream, and SAE training on a block tap."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparse_vision_tpu.models.backbone import init_backbone, make_backbone


def test_vit_forward_and_taps():
    net = make_backbone("vit_test", "cifar_10")
    params, _ = init_backbone(net, jax.random.key(0), "cifar_10")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    logits, taps, _ = net.apply(params, x)
    assert logits.shape == (2, 10)
    # 32px / patch 4 -> 64 patches + CLS
    assert taps["patch_embed"].shape == (2, 65, 64)
    assert taps["block0"].shape == taps["block1"].shape == (2, 65, 64)
    assert np.isfinite(np.asarray(logits)).all()


def test_vit_matches_hf_transformers_golden():
    """Same weights => same logits as HuggingFace ViTForImageClassification
    (random-init checkpoint converted via convert_hf_vit; no downloads)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from sparse_vision_tpu.models.vit import convert_hf_vit, make_vit

    cfg = transformers.ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=32, patch_size=4, num_channels=3,
        num_labels=10, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.ViTForImageClassification(cfg).eval()

    net = make_vit("vit_test", 10, 32)
    net.init(jax.random.key(0), (32, 32, 3))
    params = convert_hf_vit(hf.state_dict(), depth=2)

    x = np.random.default_rng(1).normal(size=(3, 32, 32, 3)).astype(np.float32)
    logits, taps, _ = net.apply(params, jnp.asarray(x))
    with torch.no_grad():
        out = hf(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(logits), out.logits.numpy(), atol=2e-4,
    )
    # hidden states parity at every block (the SAE tap surface)
    with torch.no_grad():
        hs = hf.vit(torch.tensor(x.transpose(0, 3, 1, 2)),
                    output_hidden_states=True).hidden_states
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(taps[f"block{i}"]), hs[i + 1].numpy(), atol=2e-4,
        )


def test_vit_splice_residual_stream():
    """A splice on a block output must change downstream logits only through the
    residual stream — same tap/splice contract conv backbones obey."""
    net = make_backbone("vit_test", "cifar_10")
    params, _ = init_backbone(net, jax.random.key(0), "cifar_10")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    logits, taps, _ = net.apply(params, x)
    logits2, taps2, _ = net.apply(params, x, splice=("block0", lambda a: a * 0.5))
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))
    np.testing.assert_allclose(np.asarray(taps["patch_embed"]),
                               np.asarray(taps2["patch_embed"]))
    np.testing.assert_allclose(np.asarray(taps2["block0"]),
                               0.5 * np.asarray(taps["block0"]), rtol=1e-6)


def test_sae_trains_on_vit_block_tokens():
    """sae_inference_and_loss accepts the 3-D [B, N, D] residual-stream tap
    (tokens_from_act flattens the token axis) and a few train steps reduce loss."""
    from sparse_vision_tpu.models.sae import init_sae, sae_inference_and_loss
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_step_from_acts,
    )

    net = make_backbone("vit_test", "cifar_10")
    params, _ = init_backbone(net, jax.random.key(0), "cifar_10")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 32, 32, 3)),
                    jnp.float32)
    _, taps, _ = net.apply(params, x, stop_at="block0")
    act = taps["block0"]  # [8, 65, 64]
    assert act.ndim == 3

    out = sae_inference_and_loss("sae_mlp", init_sae("sae_mlp", jax.random.key(1), 64, 2),
                                 act, 0.1)
    assert out["encoded"].shape == (8, 65, 128)  # reshaped back to [B, N, H]
    assert out["decoded"].shape == act.shape

    tx = optim.get_optimizer("constrained_adam", 1e-3)
    ts = init_sae_train_state(init_sae("sae_mlp", jax.random.key(1), 64, 2), tx, 128)
    step = make_sae_train_step_from_acts("sae_mlp", 0.1, tx, 1000, 2)
    tok = act.reshape(-1, 64)
    m0 = None
    for _ in range(30):
        ts, m = step(ts, tok)
        if m0 is None:
            m0 = {k: float(v) for k, v in m.items()}
    assert float(m["sae_rec_loss"]) < m0["sae_rec_loss"]


def test_vit_pipeline_e2e(tmp_path):
    """Full Pipeline run with an SAE spliced into the ViT residual stream:
    train from the activation cache, eval-modified metrics, weights exported."""
    import os

    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfg = RunConfig(
        model_name="vit_test", sae_layer="block0", dataset_name="synthetic",
        directory_path=str(tmp_path), sae_epochs=1, sae_batch_size=32,
        batch_size=32, sae_expansion_factor=2, dead_neurons_steps=100,
        use_activation_cache=True, cache_tokens_per_step=512, log_every=1000,
    )
    res = Pipeline(cfg).run()
    assert res and np.isfinite(res["sae_rec_loss"]) and res["sae_rec_loss"] > 0
    assert np.isfinite(res["kld"])
    weights = os.path.join(str(tmp_path), "vit_test", "synthetic",
                           "sae_weights_sae_mlp")
    assert any(f.endswith(".npz") for f in os.listdir(weights))


def test_vit_circuit_passes():
    """The circuit tier runs unchanged on the ViT residual stream: averages ->
    node IE -> edge IE on the consecutive block pair -> faithfulness sanity
    anchors (1 when every node is kept, 0 for the empty circuit at huge
    threshold)."""
    from sparse_vision_tpu.interp.circuit import CircuitEngine, FrozenSAE
    from sparse_vision_tpu.models.sae import init_sae
    from sparse_vision_tpu.ops.losses import get_criterion

    net = make_backbone("vit_test", "cifar_10")
    params, _ = init_backbone(net, jax.random.key(0), "cifar_10")
    layers = ["block0", "block1"]
    saes = {
        n: FrozenSAE("sae_mlp", init_sae("sae_mlp", jax.random.key(i), 64, 2), 2)
        for i, n in enumerate(layers)
    }
    eng = CircuitEngine(net, params, saes, get_criterion("cross_entropy"))
    key = jax.random.key(1)
    batches = []
    for _ in range(2):
        k1, k2, key = jax.random.split(key, 3)
        batches.append((jax.random.normal(k1, (4, 32, 32, 3)),
                        jax.random.randint(k2, (4,), 0, 10)))
    avgs = eng.compute_averages(batches)
    # per-position means, like the reference's [C·K, H, W] spatial averages:
    # token axis 65 (64 patches + CLS) x 128 latents
    assert avgs.enc["block0"].shape == (65, 128)
    node = eng.compute_node_ie(batches, avgs)
    assert node.features["block0"].shape == (128,)
    assert np.isfinite(np.asarray(node.features["block1"])).all()
    edges = eng.compute_edge_ie(batches, avgs,
                                {"block0": (0, 1, 2), "block1": (3, 4)})
    assert edges["block0"].shape == (4, 3)  # +1 error node each side
    assert np.isfinite(np.asarray(edges["block1"])).all()  # loss-node column
    r1 = eng.compute_faithfulness(batches, node, -1.0, averages=avgs)
    assert abs(r1["faithfulness"] - 1.0) < 1e-3
    r0 = eng.compute_faithfulness(batches, node, 1e9, averages=avgs)
    assert abs(r0["faithfulness"]) < 1e-3


# ---------------------------------------------------------------------------
# CLIP vision tower
# ---------------------------------------------------------------------------

def _tiny_clip_cfg(transformers, with_projection=False):
    kw = dict(hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
              intermediate_size=128, image_size=32, patch_size=4,
              num_channels=3, hidden_act="quick_gelu",
              attention_dropout=0.0)
    if with_projection:
        kw["projection_dim"] = 10
    return transformers.CLIPVisionConfig(**kw)


def test_clip_vision_matches_hf_transformers_golden():
    """Same weights => same pooled output and per-block hidden states as HF
    CLIPVisionModel (bias-free patch conv, pre-LN, quick-GELU, LN eps 1e-5)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from sparse_vision_tpu.models.vit import convert_hf_clip_vision, make_clip_vision

    torch.manual_seed(0)
    hf = transformers.CLIPVisionModel(_tiny_clip_cfg(transformers)).eval()

    net = make_clip_vision("clip_vit_test", 10, 32)
    params0, _ = net.init(jax.random.key(0), (32, 32, 3))
    params = {**params0, **convert_hf_clip_vision(hf.state_dict(), depth=2)}

    x = np.random.default_rng(1).normal(size=(3, 32, 32, 3)).astype(np.float32)
    _, taps, _ = net.apply(params, jnp.asarray(x))
    with torch.no_grad():
        out = hf(torch.tensor(x.transpose(0, 3, 1, 2)),
                 output_hidden_states=True)
    np.testing.assert_allclose(
        np.asarray(taps["post_ln"]), out.pooler_output.numpy(), atol=2e-4,
    )
    # hidden_states[0] is the encoder input (after CLIP's pre-layernorm);
    # hidden_states[i+1] follows encoder layer i — the SAE tap surface
    np.testing.assert_allclose(
        np.asarray(taps["pre_ln"]), out.hidden_states[0].numpy(), atol=2e-4,
    )
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(taps[f"block{i}"]), out.hidden_states[i + 1].numpy(),
            atol=2e-4,
        )


def test_clip_visual_projection_maps_to_head():
    """CLIPVisionModelWithProjection's bias-free visual_projection lands on the
    head stage: our logits == HF image_embeds."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from sparse_vision_tpu.models.vit import convert_hf_clip_vision, make_clip_vision

    torch.manual_seed(1)
    hf = transformers.CLIPVisionModelWithProjection(
        _tiny_clip_cfg(transformers, with_projection=True)).eval()

    net = make_clip_vision("clip_vit_test", 10, 32)
    net.init(jax.random.key(0), (32, 32, 3))
    params = convert_hf_clip_vision(hf.state_dict(), depth=2)
    assert "head" in params  # projection present -> mapped

    x = np.random.default_rng(2).normal(size=(2, 32, 32, 3)).astype(np.float32)
    emb, _, _ = net.apply(params, jnp.asarray(x))
    with torch.no_grad():
        out = hf(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(emb), out.image_embeds.numpy(), atol=2e-4,
    )


def test_clip_pipeline_e2e(tmp_path):
    """Full Pipeline run with an SAE on the CLIP tower's residual stream."""
    import os

    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfg = RunConfig(
        model_name="clip_vit_test", sae_layer="block0", dataset_name="synthetic",
        directory_path=str(tmp_path), sae_epochs=1, sae_batch_size=32,
        batch_size=32, sae_expansion_factor=2, dead_neurons_steps=100,
        use_activation_cache=True, cache_tokens_per_step=512, log_every=1000,
    )
    res = Pipeline(cfg).run()
    assert res and np.isfinite(res["sae_rec_loss"]) and res["sae_rec_loss"] > 0
    assert np.isfinite(res["kld"])


# ---------------------------------------------------------------------------
# split blocks: attention-out / MLP-out tap surface
# ---------------------------------------------------------------------------

def test_split_blocks_compose_to_fused_block():
    """block{i}_attn + block{i}_mlp with re-keyed params compute EXACTLY the
    fused block{i}: logits identical, the mlp-stage output equals the fused
    block tap, and the attn tap is a genuinely new surface (differs from both
    the block input and output)."""
    from sparse_vision_tpu.models.vit import make_vit, split_converted_blocks

    fused = make_vit("vit_test", 10, 32)
    params, _ = fused.init(jax.random.key(0), (32, 32, 3))
    split = make_vit("vit_test", 10, 32, split_blocks=True)
    split.init(jax.random.key(1), (32, 32, 3))
    sparams = split_converted_blocks(params, depth=2)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    logits_f, taps_f, _ = fused.apply(params, x)
    logits_s, taps_s, _ = split.apply(sparams, x)
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_s),
                               atol=1e-5)
    for i in range(2):
        np.testing.assert_allclose(np.asarray(taps_f[f"block{i}"]),
                                   np.asarray(taps_s[f"block{i}_mlp"]),
                                   atol=1e-5)
    attn0 = np.asarray(taps_s["block0_attn"])
    assert not np.allclose(attn0, np.asarray(taps_f["patch_embed"]))
    assert not np.allclose(attn0, np.asarray(taps_f["block0"]))


def test_split_clip_tower_composes_and_wires_through_factory():
    """'_split' spec names build through the backbone factory; CLIP split
    params reproduce the fused tower; the attn tap has the SAE input size."""
    from sparse_vision_tpu.models.backbone import get_sae_input_size
    from sparse_vision_tpu.models.vit import (
        make_clip_vision,
        split_converted_blocks,
    )

    fused = make_clip_vision("clip_vit_test", 10, 32)
    params, _ = fused.init(jax.random.key(0), (32, 32, 3))
    split = make_backbone("clip_vit_test_split", "cifar_10")
    split.init(jax.random.key(1), (32, 32, 3))
    sparams = split_converted_blocks(params, depth=2)

    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    logits_f, _, _ = fused.apply(params, x)
    logits_s, taps_s, _ = split.apply(sparams, x)
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_s),
                               atol=1e-5)
    assert taps_s["block1_attn"].shape == (2, 65, 64)
    assert get_sae_input_size(split, "cifar_10", "block1_attn") == 64


def test_sae_trains_on_attention_tap(tmp_path):
    """Full Pipeline run with the SAE on an ATTENTION-OUT tap (the Kissane et
    al. 2024 surface) — the splice rides the residual stream unchanged."""
    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfg = RunConfig(
        model_name="vit_test_split", sae_layer="block0_attn",
        dataset_name="synthetic", directory_path=str(tmp_path), sae_epochs=1,
        sae_batch_size=32, batch_size=32, sae_expansion_factor=2,
        dead_neurons_steps=100, log_every=1000,
    )
    res = Pipeline(cfg).run()
    assert res and np.isfinite(res["sae_rec_loss"]) and res["sae_rec_loss"] > 0
    assert np.isfinite(res["kld"])


def test_mlp_transcoder_on_split_vit(tmp_path):
    """With split blocks, the transcoder tier composes into the Anthropic-style
    MLP transcoder out of the box: sae_layer=block0_attn (the MLP sublayer's
    input) -> transcoder_target_layer=block0_mlp (its output, incl. the
    residual); eval splices the whole sublayer out."""
    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfg = RunConfig(
        model_name="vit_test_split", sae_model_name="transcoder",
        sae_layer="block0_attn", transcoder_target_layer="block0_mlp",
        dataset_name="synthetic", directory_path=str(tmp_path), sae_epochs=1,
        sae_batch_size=32, batch_size=32, sae_expansion_factor=2,
        dead_neurons_steps=100, use_activation_cache=True,
        cache_tokens_per_step=512, log_every=1000,
    )
    pipe = Pipeline(cfg)
    before = pipe.eval_modified(epoch=0, store=False)
    res = pipe.run()
    assert res["sae_rec_loss"] < before["sae_rec_loss"], (before, res)
    assert np.isfinite(res["kld"])


def test_crosscoder_across_vit_blocks(tmp_path):
    """Crosscoders are stage-name generic: one shared code over two ViT block
    taps trains e2e and writes the decoder-norm diffing CSV."""
    import glob as _glob
    import os

    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfg = RunConfig(
        model_name="vit_test", sae_model_name="crosscoder",
        sae_layer="block0", crosscoder_layers="block1",
        sae_optimizer_name="adam", dataset_name="synthetic",
        directory_path=str(tmp_path), sae_epochs=1, sae_batch_size=32,
        batch_size=32, sae_expansion_factor=2, dead_neurons_steps=100,
        use_activation_cache=True, cache_tokens_per_step=512, log_every=1000,
    )
    pipe = Pipeline(cfg)
    before = pipe.eval_modified(epoch=0, store=False)
    res = pipe.run()
    assert res["sae_rec_loss"] < before["sae_rec_loss"], (before, res)
    norms_csv = _glob.glob(os.path.join(
        pipe.paths["sae_weights"], "**", "*decoder_norms*"),
        recursive=True)
    assert norms_csv, "diffing CSV not written"
