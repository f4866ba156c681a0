"""GoogLeNet / InceptionV1 as a SeqNet, with a torchvision weight converter.

The reference's ImageNet backbone is ``torchvision.models.googlenet(pretrained=True,
aux_logits=True)`` evaluated frozen (utils.py:277-281; transform_input commented out,
so no input recoloring). Circuit layers are the inception blocks, which the reference
addresses as ``mixed3a..mixed5b`` and maps to torchvision's ``inception3a..``
(compute_ie.py:52, 139). Stage names here use the ``mixed*`` convention directly.

Architecture matches torchvision's GoogLeNet exactly (BasicConv2d = bias-free conv +
BatchNorm(eps=1e-3) + ReLU; inception branch3 uses a 3x3 kernel — torchvision's
documented deviation from the paper's 5x5; all maxpools are ceil_mode). The aux
classifiers (heads off mixed4a/mixed4d, used only by torch's original training; dead
in eval, the only mode the reference runs) are available as an OPT-IN side module:
``init_googlenet_aux`` / ``apply_googlenet_aux`` consume the taps dict that
``SeqNet.apply`` already returns, and ``convert_torchvision_googlenet_aux`` maps the
``aux1.*``/``aux2.*`` weights the main converter skips.

Inputs are NHWC, 229x229 (the reference's lucent-convention crop, utils.py:318-329);
any spatial size works since pooling is global.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from sparse_vision_tpu.models.layers import (
    SeqNet,
    Stage,
    fn_stage,
    global_avgpool,
    linear,
    maxpool,
    promote_conv_operands,
)

_BN_EPS = 1e-3  # torchvision BasicConv2d BatchNorm2d(eps=0.001)
_BN_MOMENTUM = 0.1


# ---------------------------------------------------------------------------
# BasicConv2d: bias-free conv + BN + ReLU (shared by stem and inception branches)
# ---------------------------------------------------------------------------

def _bc_init(key, cin: int, cout: int, k: int) -> tuple[dict, dict]:
    fan_in = cin * k * k
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(key, (k, k, cin, cout), jnp.float32, -bound, bound)
    params = {"w": w, "scale": jnp.ones((cout,)), "bias": jnp.zeros((cout,))}
    state = {"mean": jnp.zeros((cout,)), "var": jnp.ones((cout,))}
    return params, state


def _bc_apply(p: dict, s: dict, x: jax.Array, train: bool, stride: int, pad: int):
    xp, wp = promote_conv_operands(x, p["w"])
    y = jax.lax.conv_general_dilated(
        xp, wp, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if train:
        mean = jnp.mean(y, axis=(0, 1, 2))
        var = jnp.var(y, axis=(0, 1, 2))
        n = y.size // y.shape[-1]
        unbiased = var * n / max(n - 1, 1)
        new_s = {
            "mean": (1 - _BN_MOMENTUM) * s["mean"] + _BN_MOMENTUM * mean,
            "var": (1 - _BN_MOMENTUM) * s["var"] + _BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    y = (y - mean) * jax.lax.rsqrt(var + _BN_EPS) * p["scale"] + p["bias"]
    return jax.nn.relu(y), new_s


def basic_conv_stage(name: str, cout: int, k: int, stride: int = 1, pad: int = 0) -> Stage:
    def init(key, in_shape):
        h, w, c = in_shape
        params, state = _bc_init(key, c, cout, k)
        oh = (h + 2 * pad - k) // stride + 1
        ow = (w + 2 * pad - k) // stride + 1
        return params, state, (oh, ow, cout)

    def apply(params, state, x, train):
        y, new_s = _bc_apply(params, state, x, train, stride, pad)
        return y, new_s, None

    return Stage(name, init, apply)


# ---------------------------------------------------------------------------
# Inception block
# ---------------------------------------------------------------------------

# (ch1x1, ch3x3red, ch3x3, ch5x5red, ch5x5, pool_proj) per block — torchvision's
# constructor arguments; output channels = ch1x1 + ch3x3 + ch5x5 + pool_proj.
INCEPTION_SPECS: dict[str, tuple[int, int, int, int, int, int]] = {
    "mixed3a": (64, 96, 128, 16, 32, 32),
    "mixed3b": (128, 128, 192, 32, 96, 64),
    "mixed4a": (192, 96, 208, 16, 48, 64),
    "mixed4b": (160, 112, 224, 24, 64, 64),
    "mixed4c": (128, 128, 256, 24, 64, 64),
    "mixed4d": (112, 144, 288, 32, 64, 64),
    "mixed4e": (256, 160, 320, 32, 128, 128),
    "mixed5a": (256, 160, 320, 32, 128, 128),
    "mixed5b": (384, 192, 384, 48, 128, 128),
}


def inception_stage(name: str) -> Stage:
    ch1, ch3r, ch3, ch5r, ch5, proj = INCEPTION_SPECS[name]

    def init(key, in_shape):
        h, w, cin = in_shape
        keys = jax.random.split(key, 6)
        parts = {
            "b1": _bc_init(keys[0], cin, ch1, 1),
            "b2_red": _bc_init(keys[1], cin, ch3r, 1),
            "b2": _bc_init(keys[2], ch3r, ch3, 3),
            "b3_red": _bc_init(keys[3], cin, ch5r, 1),
            "b3": _bc_init(keys[4], ch5r, ch5, 3),
            "b4": _bc_init(keys[5], cin, proj, 1),
        }
        params = {k: v[0] for k, v in parts.items()}
        state = {k: v[1] for k, v in parts.items()}
        cout = ch1 + ch3 + ch5 + proj
        return params, state, (h, w, cout)

    def apply(params, state, x, train):
        new_s = {}
        b1, new_s["b1"] = _bc_apply(params["b1"], state["b1"], x, train, 1, 0)
        t, new_s["b2_red"] = _bc_apply(params["b2_red"], state["b2_red"], x, train, 1, 0)
        b2, new_s["b2"] = _bc_apply(params["b2"], state["b2"], t, train, 1, 1)
        t, new_s["b3_red"] = _bc_apply(params["b3_red"], state["b3_red"], x, train, 1, 0)
        # torchvision uses a 3x3 kernel in the "5x5" branch (its documented deviation)
        b3, new_s["b3"] = _bc_apply(params["b3"], state["b3"], t, train, 1, 1)
        pooled = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 3, 3, 1), window_strides=(1, 1, 1, 1),
            padding=((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        b4, new_s["b4"] = _bc_apply(params["b4"], state["b4"], pooled, train, 1, 0)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1), new_s, None

    return Stage(name, init, apply)


def make_googlenet(num_classes: int = 1000) -> SeqNet:
    return SeqNet([
        basic_conv_stage("conv1", 64, 7, stride=2, pad=3),
        maxpool("maxpool1", 3, 2, ceil_mode=True),
        basic_conv_stage("conv2", 64, 1),
        basic_conv_stage("conv3", 192, 3, pad=1),
        maxpool("maxpool2", 3, 2, ceil_mode=True),
        inception_stage("mixed3a"),
        inception_stage("mixed3b"),
        maxpool("maxpool3", 3, 2, ceil_mode=True),
        inception_stage("mixed4a"),
        inception_stage("mixed4b"),
        inception_stage("mixed4c"),
        inception_stage("mixed4d"),
        inception_stage("mixed4e"),
        maxpool("maxpool4", 2, 2, ceil_mode=True),
        inception_stage("mixed5a"),
        inception_stage("mixed5b"),
        global_avgpool("avgpool"),
        fn_stage("dropout", lambda x: x),  # eval-mode identity (torch p=0.2 in train)
        linear("fc", num_classes),
    ])


# ---------------------------------------------------------------------------
# aux classifiers (torchvision InceptionAux; opt-in, see module docstring)
# ---------------------------------------------------------------------------

# tap layer -> input channels (torchvision: aux1 off inception4a, aux2 off inception4d)
AUX_TAPS = {"aux1": ("mixed4a", 512), "aux2": ("mixed4d", 528)}


def _adaptive_avgpool_nhwc(x: jax.Array, out: int) -> jax.Array:
    """torch F.adaptive_avg_pool2d window semantics: window i spans
    [floor(i*H/out), ceil((i+1)*H/out)) — windows may overlap/vary in size."""
    _, h, w, _ = x.shape
    rows = []
    for i in range(out):
        r0, r1 = (i * h) // out, -(-((i + 1) * h) // out)
        cols = []
        for j in range(out):
            c0, c1 = (j * w) // out, -(-((j + 1) * w) // out)
            cols.append(jnp.mean(x[:, r0:r1, c0:c1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # [B, out, out, C]


def init_googlenet_aux(key: jax.Array, num_classes: int = 1000) -> tuple[dict, dict]:
    """Parameters/state for both aux heads (InceptionAux: adaptive-avgpool 4x4 ->
    BasicConv2d(in, 128, 1) -> fc1 2048->1024 + ReLU (+dropout 0.7 in torch train) ->
    fc2 1024->num_classes)."""
    params: dict = {}
    state: dict = {}
    keys = jax.random.split(key, len(AUX_TAPS))
    for k_head, (name, (_, cin)) in zip(keys, AUX_TAPS.items()):
        kc, k1, k2, kb1, kb2 = jax.random.split(k_head, 5)
        conv_p, conv_s = _bc_init(kc, cin, 128, 1)
        b1 = 1.0 / math.sqrt(2048)
        b2 = 1.0 / math.sqrt(1024)
        params[name] = {
            "conv": conv_p,
            "fc1": {
                "w": jax.random.uniform(k1, (2048, 1024), jnp.float32, -b1, b1),
                "b": jax.random.uniform(kb1, (1024,), jnp.float32, -b1, b1),
            },
            "fc2": {
                "w": jax.random.uniform(k2, (1024, num_classes), jnp.float32, -b2, b2),
                "b": jax.random.uniform(kb2, (num_classes,), jnp.float32, -b2, b2),
            },
        }
        state[name] = {"conv": conv_s}
    return params, state


def apply_googlenet_aux(params: dict, state: dict, taps: dict) -> dict:
    """Aux logits from the taps dict SeqNet.apply returns. Eval semantics (dropout
    identity): matches torch eval-mode InceptionAux exactly; torch TRAIN mode adds
    stochastic dropout(0.7), which has no deterministic counterpart."""
    out = {}
    for name, (tap, _) in AUX_TAPS.items():
        p = params[name]
        x = _adaptive_avgpool_nhwc(taps[tap], 4)
        x, _ = _bc_apply(p["conv"], state[name]["conv"], x, train=False, stride=1, pad=0)
        # torch flattens NCHW -> (C, H, W) order; our conv output is NHWC
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = jax.nn.relu(x @ p["fc1"]["w"] + p["fc1"]["b"])
        out[name] = x @ p["fc2"]["w"] + p["fc2"]["b"]
    return out


def convert_torchvision_googlenet_aux(state_dict: dict) -> tuple[dict, dict]:
    """Map torchvision's ``aux1.*``/``aux2.*`` weights (the keys the main converter
    skips) to the (params, state) trees of apply_googlenet_aux."""
    sd = state_dict
    params: dict = {}
    state: dict = {}
    for name in AUX_TAPS:
        conv_p, conv_s = _bc_from_torch(sd, f"{name}.conv")
        params[name] = {
            "conv": conv_p,
            "fc1": {
                "w": jnp.asarray(np.transpose(np.asarray(sd[f"{name}.fc1.weight"]))),
                "b": jnp.asarray(np.asarray(sd[f"{name}.fc1.bias"])),
            },
            "fc2": {
                "w": jnp.asarray(np.transpose(np.asarray(sd[f"{name}.fc2.weight"]))),
                "b": jnp.asarray(np.asarray(sd[f"{name}.fc2.bias"])),
            },
        }
        state[name] = {"conv": conv_s}
    return params, state


# ---------------------------------------------------------------------------
# torchvision weight converter
# ---------------------------------------------------------------------------

def _bc_from_torch(sd: dict, prefix: str) -> tuple[dict, dict]:
    params = {
        "w": jnp.asarray(np.transpose(np.asarray(sd[f"{prefix}.conv.weight"]), (2, 3, 1, 0))),
        "scale": jnp.asarray(np.asarray(sd[f"{prefix}.bn.weight"])),
        "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bn.bias"])),
    }
    state = {
        "mean": jnp.asarray(np.asarray(sd[f"{prefix}.bn.running_mean"])),
        "var": jnp.asarray(np.asarray(sd[f"{prefix}.bn.running_var"])),
    }
    return params, state


_TV_BRANCHES = {
    "b1": "branch1",
    "b2_red": "branch2.0",
    "b2": "branch2.1",
    "b3_red": "branch3.0",
    "b3": "branch3.1",
    "b4": "branch4.1",
}


def convert_torchvision_googlenet(state_dict: dict) -> tuple[dict, dict]:
    """Map a torchvision GoogLeNet state_dict (numpy-convertible values) to SeqNet
    (params, state). Aux-classifier weights (``aux1.*``/``aux2.*``) are skipped here —
    dead in eval mode, the only mode the reference uses the model in; convert them
    separately with :func:`convert_torchvision_googlenet_aux` when needed."""
    sd = state_dict
    params: dict = {}
    state: dict = {}
    for ours, theirs in [("conv1", "conv1"), ("conv2", "conv2"), ("conv3", "conv3")]:
        params[ours], state[ours] = _bc_from_torch(sd, theirs)
    for name in INCEPTION_SPECS:
        tv = name.replace("mixed", "inception")
        p, s = {}, {}
        for ours, theirs in _TV_BRANCHES.items():
            p[ours], s[ours] = _bc_from_torch(sd, f"{tv}.{theirs}")
        params[name], state[name] = p, s
    params["fc"] = {
        "w": jnp.asarray(np.transpose(np.asarray(sd["fc.weight"]))),
        "b": jnp.asarray(np.asarray(sd["fc.bias"])),
    }
    return params, state
