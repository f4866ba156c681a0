"""ResNet-18 as a SeqNet, with the reference's Tiny-ImageNet surgery and a torchvision
weight converter.

The reference fine-tunes torchvision resnet18 for Tiny-ImageNet in two rounds
(utils.py:230-275): round 1 ('resnet18_1') keeps the ImageNet stem and swaps the head
to 200 classes; rounds 2+ ('resnet18_2'/'resnet18') additionally replace conv1 with a
3x3 stride-1 pad-1 conv (WITH bias — torch Conv2d default) and delete the maxpool, so
64px inputs keep spatial detail.

Stage names follow torchvision (conv1, bn1, relu, maxpool, layer1.0 .. layer4.1,
avgpool, fc); each BasicBlock is one stage whose output (post-residual ReLU) is what a
forward hook on the torch block would see.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from sparse_vision_tpu.models.layers import (
    SeqNet,
    Stage,
    batchnorm,
    conv,
    global_avgpool,
    linear,
    maxpool,
    promote_conv_operands,
    relu,
)

_BN_EPS = 1e-5


def _conv_init(key, cin, cout, k):
    fan_in = cin * k * k
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, (k, k, cin, cout), jnp.float32, -bound, bound)


def _conv2d(x, w, stride, pad):
    x, w = promote_conv_operands(x, w)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn_init(c):
    return ({"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
            {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))})


def _bn_apply(p, s, x, train, momentum=0.1):
    if train:
        mean = jnp.mean(x, axis=tuple(range(x.ndim - 1)))
        var = jnp.var(x, axis=tuple(range(x.ndim - 1)))
        n = x.size // x.shape[-1]
        unbiased = var * n / max(n - 1, 1)
        new_s = {"mean": (1 - momentum) * s["mean"] + momentum * mean,
                 "var": (1 - momentum) * s["var"] + momentum * unbiased}
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    return (x - mean) * jax.lax.rsqrt(var + _BN_EPS) * p["scale"] + p["bias"], new_s


def basic_block(name: str, cout: int, stride: int = 1) -> Stage:
    """torchvision BasicBlock: conv3x3(stride)-bn-relu-conv3x3-bn + skip, final ReLU;
    1x1-conv+bn downsample on the skip when stride != 1 or channels change."""

    def init(key, in_shape):
        h, w, cin = in_shape
        keys = jax.random.split(key, 3)
        params = {"conv1": {"w": _conv_init(keys[0], cin, cout, 3)},
                  "conv2": {"w": _conv_init(keys[1], cout, cout, 3)}}
        state = {}
        params["bn1"], state["bn1"] = _bn_init(cout)
        params["bn2"], state["bn2"] = _bn_init(cout)
        if stride != 1 or cin != cout:
            params["down_conv"] = {"w": _conv_init(keys[2], cin, cout, 1)}
            params["down_bn"], state["down_bn"] = _bn_init(cout)
        oh = (h + 2 - 3) // stride + 1
        ow = (w + 2 - 3) // stride + 1
        return params, state, (oh, ow, cout)

    def apply(params, state, x, train):
        new_s = {}
        y = _conv2d(x, params["conv1"]["w"], stride, 1)
        y, new_s["bn1"] = _bn_apply(params["bn1"], state["bn1"], y, train)
        y = jax.nn.relu(y)
        y = _conv2d(y, params["conv2"]["w"], 1, 1)
        y, new_s["bn2"] = _bn_apply(params["bn2"], state["bn2"], y, train)
        if "down_conv" in params:
            sk = _conv2d(x, params["down_conv"]["w"], stride, 0)
            sk, new_s["down_bn"] = _bn_apply(params["down_bn"], state["down_bn"], sk, train)
        else:
            sk = x
        return jax.nn.relu(y + sk), new_s, None

    return Stage(name, init, apply)


def bottleneck_block(name: str, width: int, stride: int = 1) -> Stage:
    """torchvision Bottleneck: 1x1(width)-bn-relu, 3x3(width, stride)-bn-relu,
    1x1(width*4)-bn + skip, final ReLU; 1x1+bn downsample when shape changes."""
    cout = width * 4

    def init(key, in_shape):
        h, w, cin = in_shape
        keys = jax.random.split(key, 4)
        params = {
            "conv1": {"w": _conv_init(keys[0], cin, width, 1)},
            "conv2": {"w": _conv_init(keys[1], width, width, 3)},
            "conv3": {"w": _conv_init(keys[2], width, cout, 1)},
        }
        state = {}
        params["bn1"], state["bn1"] = _bn_init(width)
        params["bn2"], state["bn2"] = _bn_init(width)
        params["bn3"], state["bn3"] = _bn_init(cout)
        if stride != 1 or cin != cout:
            params["down_conv"] = {"w": _conv_init(keys[3], cin, cout, 1)}
            params["down_bn"], state["down_bn"] = _bn_init(cout)
        oh = (h + 2 - 3) // stride + 1
        ow = (w + 2 - 3) // stride + 1
        return params, state, (oh, ow, cout)

    def apply(params, state, x, train):
        new_s = {}
        y = _conv2d(x, params["conv1"]["w"], 1, 0)
        y, new_s["bn1"] = _bn_apply(params["bn1"], state["bn1"], y, train)
        y = jax.nn.relu(y)
        y = _conv2d(y, params["conv2"]["w"], stride, 1)
        y, new_s["bn2"] = _bn_apply(params["bn2"], state["bn2"], y, train)
        y = jax.nn.relu(y)
        y = _conv2d(y, params["conv3"]["w"], 1, 0)
        y, new_s["bn3"] = _bn_apply(params["bn3"], state["bn3"], y, train)
        if "down_conv" in params:
            sk = _conv2d(x, params["down_conv"]["w"], stride, 0)
            sk, new_s["down_bn"] = _bn_apply(params["down_bn"], state["down_bn"], sk, train)
        else:
            sk = x
        return jax.nn.relu(y + sk), new_s, None

    return Stage(name, init, apply)


def make_resnet50(num_classes: int = 1000) -> SeqNet:
    """torchvision resnet50 (the reference offers it pretrained, utils.py:228-229);
    layers [3, 4, 6, 3] of Bottleneck blocks, ImageNet stem."""
    stages = [
        conv("conv1", 64, kernel=7, stride=2, padding=3, use_bias=False),
        batchnorm("bn1"), relu("relu"),
        maxpool("maxpool", 3, 2, padding=1),
    ]
    plan = [("layer1", 64, 3, 1), ("layer2", 128, 4, 2),
            ("layer3", 256, 6, 2), ("layer4", 512, 3, 2)]
    for lname, width, blocks, stride in plan:
        for b in range(blocks):
            stages.append(
                bottleneck_block(f"{lname}.{b}", width, stride=stride if b == 0 else 1)
            )
    stages += [global_avgpool("avgpool"), linear("fc", num_classes)]
    return SeqNet(stages)


def convert_torchvision_resnet50(state_dict: dict) -> tuple[dict, dict]:
    """Map a torchvision resnet50 state_dict to SeqNet (params, state)."""
    sd = state_dict
    params: dict = {"conv1": {"w": _conv_w(sd, "conv1.weight")}}
    state: dict = {}
    params["bn1"], state["bn1"] = _bn_from_torch(sd, "bn1")
    for li, blocks in zip(range(1, 5), (3, 4, 6, 3)):
        for bi in range(blocks):
            tv = f"layer{li}.{bi}"
            p = {f"conv{c}": {"w": _conv_w(sd, f"{tv}.conv{c}.weight")} for c in (1, 2, 3)}
            s = {}
            for c in (1, 2, 3):
                p[f"bn{c}"], s[f"bn{c}"] = _bn_from_torch(sd, f"{tv}.bn{c}")
            if f"{tv}.downsample.0.weight" in sd:
                p["down_conv"] = {"w": _conv_w(sd, f"{tv}.downsample.0.weight")}
                p["down_bn"], s["down_bn"] = _bn_from_torch(sd, f"{tv}.downsample.1")
            params[tv], state[tv] = p, s
    params["fc"] = {"w": jnp.asarray(np.transpose(np.asarray(sd["fc.weight"]))),
                    "b": _w(sd, "fc.bias")}
    return params, state


def make_resnet18(num_classes: int = 200, tiny_imagenet_stem: bool = True) -> SeqNet:
    stages = []
    if tiny_imagenet_stem:
        # surgery stem (utils.py:253-256): 3x3 stride-1 conv WITH bias, no maxpool
        stages += [conv("conv1", 64, kernel=3, stride=1, padding=1),
                   batchnorm("bn1"), relu("relu")]
    else:
        stages += [conv("conv1", 64, kernel=7, stride=2, padding=3, use_bias=False),
                   batchnorm("bn1"), relu("relu"),
                   maxpool("maxpool", 3, 2, padding=1)]
    plan = [("layer1", 64, 1), ("layer2", 128, 2), ("layer3", 256, 2), ("layer4", 512, 2)]
    for lname, c, s in plan:
        stages.append(basic_block(f"{lname}.0", c, stride=s))
        stages.append(basic_block(f"{lname}.1", c, stride=1))
    stages += [global_avgpool("avgpool"), linear("fc", num_classes)]
    return SeqNet(stages)


# ---------------------------------------------------------------------------
# torchvision weight converter
# ---------------------------------------------------------------------------

def _w(sd, k):
    return jnp.asarray(np.asarray(sd[k]))


def _conv_w(sd, k):
    return jnp.asarray(np.transpose(np.asarray(sd[k]), (2, 3, 1, 0)))


def _bn_from_torch(sd, prefix):
    return ({"scale": _w(sd, f"{prefix}.weight"), "bias": _w(sd, f"{prefix}.bias")},
            {"mean": _w(sd, f"{prefix}.running_mean"), "var": _w(sd, f"{prefix}.running_var")})


def convert_torchvision_resnet18(state_dict: dict, tiny_imagenet_stem: bool = True
                                 ) -> tuple[dict, dict]:
    """Map a (possibly surgically-modified) torchvision resnet18 state_dict to SeqNet
    (params, state). Handles both the bias-free 7x7 ImageNet stem and the reference's
    biased 3x3 surgery stem."""
    sd = state_dict
    params: dict = {}
    state: dict = {}
    params["conv1"] = {"w": _conv_w(sd, "conv1.weight")}
    if "conv1.bias" in sd:
        params["conv1"]["b"] = _w(sd, "conv1.bias")
    elif tiny_imagenet_stem:
        params["conv1"]["b"] = jnp.zeros((params["conv1"]["w"].shape[-1],))
    params["bn1"], state["bn1"] = _bn_from_torch(sd, "bn1")
    for li in range(1, 5):
        for bi in range(2):
            tv = f"layer{li}.{bi}"
            p = {"conv1": {"w": _conv_w(sd, f"{tv}.conv1.weight")},
                 "conv2": {"w": _conv_w(sd, f"{tv}.conv2.weight")}}
            s = {}
            p["bn1"], s["bn1"] = _bn_from_torch(sd, f"{tv}.bn1")
            p["bn2"], s["bn2"] = _bn_from_torch(sd, f"{tv}.bn2")
            if f"{tv}.downsample.0.weight" in sd:
                p["down_conv"] = {"w": _conv_w(sd, f"{tv}.downsample.0.weight")}
                p["down_bn"], s["down_bn"] = _bn_from_torch(sd, f"{tv}.downsample.1")
            params[tv], state[tv] = p, s
    params["fc"] = {"w": jnp.asarray(np.transpose(np.asarray(sd["fc.weight"]))),
                    "b": _w(sd, "fc.bias")}
    return params, state
