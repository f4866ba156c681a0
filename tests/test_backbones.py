"""Backbone engine: tap/splice semantics, CNN parity vs torch, probe correctness
(reference: model_pipeline.py:363-487 hooks, get_sae_input_size.py, custom_mlp.py,
custom_cnn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sparse_vision_tpu.models import sae
from sparse_vision_tpu.models.backbone import (
    get_sae_input_size,
    init_backbone,
    layer_dimensions,
    make_backbone,
)


def test_all_mlp_variants_forward():
    x = jnp.zeros((2, 28, 28, 1))
    for name in [f"custom_mlp_{i}" for i in range(1, 11)]:
        net = make_backbone(name, "mnist")
        params, state = init_backbone(net, jax.random.key(0), "mnist")
        logits, taps, _ = net.apply(params, x)
        assert logits.shape == (2, 10), name
        assert "fc1" in taps, name


def test_mlp_matches_torch_forward(rng):
    """custom_mlp_9 on MNIST: same weights => same logits as the torch math.
    (MNIST is single-channel so NHWC/NCHW flattening agree.)"""
    net = make_backbone("custom_mlp_9", "mnist")
    params, _ = init_backbone(net, jax.random.key(1), "mnist")
    x = rng.normal(size=(4, 28, 28, 1)).astype(np.float32)

    logits, taps, _ = net.apply(params, jnp.asarray(x))

    tx = torch.tensor(x.reshape(4, -1))
    w1 = torch.tensor(np.asarray(params["fc1"]["w"]))
    b1 = torch.tensor(np.asarray(params["fc1"]["b"]))
    w2 = torch.tensor(np.asarray(params["fc2"]["w"]))
    b2 = torch.tensor(np.asarray(params["fc2"]["b"]))
    h = F.relu(tx @ w1 + b1)
    t_logits = h @ w2 + b2

    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(), atol=1e-5)
    # tap on fc1 is the PRE-activation output (hook on the fc1 module)
    np.testing.assert_allclose(np.asarray(taps["fc1"]), (tx @ w1 + b1).numpy(), atol=1e-5)


def test_cnn_matches_torch_forward(rng):
    net = make_backbone("custom_cnn_1", "cifar_10")
    params, _ = init_backbone(net, jax.random.key(2), "cifar_10")
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    logits, taps, _ = net.apply(params, jnp.asarray(x))

    tx = torch.tensor(np.transpose(x, (0, 3, 1, 2)))

    def tconv(name, xin):
        w = torch.tensor(np.transpose(np.asarray(params[name]["w"]), (3, 2, 0, 1)))
        b = torch.tensor(np.asarray(params[name]["b"]))
        return F.conv2d(xin, w, b, padding=1)

    h = F.max_pool2d(F.relu(tconv("conv1", tx)), 2)
    h = F.max_pool2d(F.relu(tconv("conv2", h)), 2)
    h = F.max_pool2d(F.relu(tconv("conv3", h)), 2)
    # torch flattens CHW; ours flattens HWC — permute our fc1 weight to compare
    hwc = h.permute(0, 2, 3, 1).reshape(2, -1)
    w_fc1 = torch.tensor(np.asarray(params["fc1"]["w"]))
    b_fc1 = torch.tensor(np.asarray(params["fc1"]["b"]))
    h2 = F.relu(hwc @ w_fc1 + b_fc1)
    w_fc2 = torch.tensor(np.asarray(params["fc2"]["w"]))
    b_fc2 = torch.tensor(np.asarray(params["fc2"]["b"]))
    t_logits = h2 @ w_fc2 + b_fc2

    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(), atol=1e-4)
    assert taps["conv1"].shape == (2, 32, 32, 32)
    assert taps["pool3"].shape == (2, 4, 4, 128)


def test_splice_changes_downstream_only(rng):
    net = make_backbone("custom_mlp_9", "mnist")
    params, _ = init_backbone(net, jax.random.key(3), "mnist")
    x = jnp.asarray(rng.normal(size=(4, 28, 28, 1)).astype(np.float32))

    logits0, taps0, _ = net.apply(params, x)
    logits1, taps1, _ = net.apply(params, x, splice=("fc1", lambda a: a * 0.0))

    np.testing.assert_array_equal(np.asarray(taps1["flatten"]), np.asarray(taps0["flatten"]))
    assert np.all(np.asarray(taps1["fc1"]) == 0)  # tap carries the spliced value
    assert not np.allclose(np.asarray(logits1), np.asarray(logits0))


def test_hook_vs_physical_splice_equivalence(rng):
    """Functional splice of an SAE into custom_mlp_9 == custom_mlp_9_sae_fc1 with the
    same weights baked in (the reference asserts this with torch.allclose at
    model_pipeline.py:1228)."""
    net = make_backbone("custom_mlp_9", "mnist")
    params, _ = init_backbone(net, jax.random.key(4), "mnist")
    sae_params = sae.init_sae_mlp(jax.random.key(5), 16, 2)
    x = jnp.asarray(rng.normal(size=(4, 28, 28, 1)).astype(np.float32))

    def splice_fn(act):
        _, recon, _ = sae.sae_mlp_apply(sae_params, act)
        return recon

    logits_hooked, _, _ = net.apply(params, x, splice=("fc1", splice_fn))

    spliced_net = make_backbone("custom_mlp_9_sae_fc1", "mnist")
    sp_params, _ = init_backbone(spliced_net, jax.random.key(6), "mnist")
    sp_params["fc1"] = params["fc1"]
    sp_params["fc2"] = params["fc2"]
    sp_params["sae_fc1"] = dict(sae_params)
    logits_physical, taps, _ = spliced_net.apply(sp_params, x)

    np.testing.assert_allclose(
        np.asarray(logits_hooked), np.asarray(logits_physical), atol=1e-5
    )
    assert "sae_fc1.encoded" in taps


def test_apply_segment_composes(rng):
    net = make_backbone("custom_mlp_3", "mnist")
    params, _ = init_backbone(net, jax.random.key(7), "mnist")
    x = jnp.asarray(rng.normal(size=(2, 28, 28, 1)).astype(np.float32))

    _, taps, _ = net.apply(params, x)
    seg_out = net.apply_segment(params, taps["fc1"], after="fc1", upto="fc2")
    np.testing.assert_allclose(np.asarray(seg_out), np.asarray(taps["fc2"]), atol=1e-6)

    full = net.apply_segment(params, x, after=None, upto="fc4")
    logits, _, _ = net.apply(params, x)
    np.testing.assert_allclose(np.asarray(full), np.asarray(logits), atol=1e-6)


def test_probe_layer_dimensions():
    net = make_backbone("custom_cnn_1", "tiny_imagenet")
    dims = layer_dimensions(net, "tiny_imagenet")
    assert dims["conv1"] == (64, 64, 32)
    assert dims["pool3"] == (8, 8, 128)
    assert dims["fc1"] == (512,)
    assert get_sae_input_size(net, "tiny_imagenet", "conv2") == 64
    assert get_sae_input_size(net, "tiny_imagenet", "fc1") == 512


def test_backbone_jit_and_dce(rng):
    """apply is jittable and tapping everything costs nothing when unused."""
    net = make_backbone("custom_mlp_1", "mnist")
    params, _ = init_backbone(net, jax.random.key(8), "mnist")

    @jax.jit
    def fwd(p, x):
        logits, _, _ = net.apply(p, x)
        return logits

    x = jnp.asarray(rng.normal(size=(2, 28, 28, 1)).astype(np.float32))
    out = fwd(params, x)
    assert out.shape == (2, 10)


def test_maxpool_ceil_mode_last_window_rule():
    """torch drops the last ceil-mode window when it starts entirely in the RIGHT
    padding (MaxPool2d docs); verified shape + values against torch."""
    import torch

    from sparse_vision_tpu.models.layers import SeqNet, maxpool

    x = np.arange(5 * 5, dtype=np.float32).reshape(1, 5, 5, 1)
    net = SeqNet([maxpool("p", 2, stride=2, padding=1, ceil_mode=True)])
    net.init(jax.random.key(0), (5, 5, 1))
    y, _, _ = net.apply({}, jnp.asarray(x))

    golden = torch.nn.MaxPool2d(2, stride=2, padding=1, ceil_mode=True)(
        torch.tensor(x.transpose(0, 3, 1, 2))
    ).numpy().transpose(0, 2, 3, 1)
    assert y.shape == golden.shape == (1, 3, 3, 1)
    np.testing.assert_allclose(np.asarray(y), golden)


def test_maxpool_floor_mode_odd_input_gradient_matches_torch():
    """Floor-mode pooling of an ODD spatial size crops the trailing row/col. The
    old implementation expressed the crop as NEGATIVE reduce_window padding, whose
    VJP miscomputes shapes (node IE on 28px backbones crashed: 7x7 -> 3x3 pool3).
    Forward AND gradient must match torch MaxPool2d."""
    import torch

    from sparse_vision_tpu.models.layers import SeqNet, maxpool

    x = np.random.default_rng(0).normal(size=(2, 7, 7, 3)).astype(np.float32)
    net = SeqNet([maxpool("p", 2, stride=2)])
    net.init(jax.random.key(0), (7, 7, 3))

    def f(a):
        y, _, _ = net.apply({}, a)
        return jnp.sum(y * y)

    y, _, _ = net.apply({}, jnp.asarray(x))
    g = jax.grad(f)(jnp.asarray(x))

    xt = torch.tensor(x.transpose(0, 3, 1, 2), requires_grad=True)
    yt = torch.nn.MaxPool2d(2, stride=2)(xt)
    assert y.shape == (2, 3, 3, 3) and tuple(yt.shape) == (2, 3, 3, 3)
    np.testing.assert_allclose(
        np.asarray(y), yt.detach().numpy().transpose(0, 2, 3, 1), rtol=1e-6)
    (yt * yt).sum().backward()
    np.testing.assert_allclose(
        np.asarray(g), xt.grad.numpy().transpose(0, 2, 3, 1), rtol=1e-6, atol=1e-7)
