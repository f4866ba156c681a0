"""Stage-based sequential backbone engine with explicit taps and splicing.

This replaces the reference's forward-hook machinery (model_pipeline.py:363-487):
backbones are sequences of named stages; ``apply`` is a pure function returning
``(logits, taps)`` where taps holds every named stage output. Under jit, unused taps
are dead-code-eliminated by XLA, so "tap everything" costs nothing.

A splice ``(layer_name, fn)`` replaces a stage's output with ``fn(output)`` before the
next stage runs — the functional equivalent of the reference's output-mutating hook
(model_pipeline.py:425-432). ``apply_segment`` runs the sub-network between two stages,
which the edge-IE pass needs (compute_ie.py:476-711 walks consecutive layer pairs).

Design rule inherited from the reference (custom_mlp.py:5-11): every stage name is used
exactly once, so taps are unambiguous.

Stages follow torch's default initializations so that behavior (loss scales, training
dynamics) is comparable: Linear/Conv use kaiming_uniform(a=sqrt(5)) = U(±1/sqrt(fan_in))
for weights and U(±1/sqrt(fan_in)) for biases.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class Stage(NamedTuple):
    name: str
    init: Callable  # (key, in_shape) -> (params | None, state | None, out_shape)
    apply: Callable  # (params, state, x, train) -> (y, new_state, subtaps | None)


def promote_conv_operands(x: jax.Array, w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """lax.conv_general_dilated requires equal operand dtypes (unlike jnp matmuls,
    which promote). Promote both to the jnp result type so weight-only-quantized
    artifacts work: f32 images @ bf16 weights compute in f32, matching the dense
    layers' implicit behavior (serve/exporter.py weights_dtype contract)."""
    if x.dtype == w.dtype:
        return x, w
    dt = jnp.promote_types(x.dtype, w.dtype)
    return x.astype(dt), w.astype(dt)


def _torch_linear_init(key, fan_in, w_shape, b_shape, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, w_shape, dtype, -bound, bound)
    b = jax.random.uniform(kb, b_shape, dtype, -bound, bound)
    return w, b


def linear(name: str, out_features: int) -> Stage:
    def init(key, in_shape):
        (d,) = in_shape
        w, b = _torch_linear_init(key, d, (d, out_features), (out_features,))
        return {"w": w, "b": b}, None, (out_features,)

    def apply(params, state, x, train):
        return x @ params["w"] + params["b"], state, None

    return Stage(name, init, apply)


def relu(name: str) -> Stage:
    def init(key, in_shape):
        return None, None, in_shape

    def apply(params, state, x, train):
        return jax.nn.relu(x), state, None

    return Stage(name, init, apply)


def flatten(name: str) -> Stage:
    def init(key, in_shape):
        size = 1
        for s in in_shape:
            size *= s
        return None, None, (size,)

    def apply(params, state, x, train):
        return x.reshape(x.shape[0], -1), state, None

    return Stage(name, init, apply)


def conv(name: str, out_ch: int, kernel: int, stride: int = 1, padding: int = 0,
         use_bias: bool = True) -> Stage:
    def init(key, in_shape):
        h, w, c = in_shape
        fan_in = c * kernel * kernel
        if use_bias:
            wgt, b = _torch_linear_init(key, fan_in, (kernel, kernel, c, out_ch), (out_ch,))
            params = {"w": wgt, "b": b}
        else:
            bound = 1.0 / math.sqrt(fan_in)
            wgt = jax.random.uniform(key, (kernel, kernel, c, out_ch), jnp.float32, -bound, bound)
            params = {"w": wgt}
        oh = (h + 2 * padding - kernel) // stride + 1
        ow = (w + 2 * padding - kernel) // stride + 1
        return params, None, (oh, ow, out_ch)

    def apply(params, state, x, train):
        xp, wp = promote_conv_operands(x, params["w"])
        y = jax.lax.conv_general_dilated(
            xp, wp, window_strides=(stride, stride),
            padding=[(padding, padding), (padding, padding)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if use_bias:
            y = y + params["b"]
        return y, state, None

    return Stage(name, init, apply)


def maxpool(name: str, window: int, stride: Optional[int] = None,
            padding: int = 0, ceil_mode: bool = False) -> Stage:
    stride = stride or window

    def out_dim(n):
        eff = n + 2 * padding - window
        out = (math.ceil(eff / stride) if ceil_mode else eff // stride) + 1
        # torch ceil_mode rule: the last window must START within the input or the
        # LEFT padding — otherwise it is dropped (MaxPool2d docs; verified vs torch)
        if ceil_mode and (out - 1) * stride >= n + padding:
            out -= 1
        return out

    def init(key, in_shape):
        h, w, c = in_shape
        return None, None, (out_dim(h), out_dim(w), c)

    def apply(params, state, x, train):
        h, w = x.shape[1], x.shape[2]
        pad_h = (out_dim(h) - 1) * stride + window - h - padding
        pad_w = (out_dim(w) - 1) * stride + window - w - padding
        # floor mode on odd sizes wants a NEGATIVE trailing pad (crop). The forward
        # accepts it, but reduce_window's VJP miscomputes the gradient pad shapes —
        # crop explicitly instead (equivalent for max: cropped elements never join
        # a window). Hit by node IE on 28px backbones (7x7 -> 3x3 pool).
        if pad_h < 0:
            x, pad_h = x[:, : h + pad_h], 0
        if pad_w < 0:
            x, pad_w = x[:, :, : w + pad_w], 0
        y = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, window, window, 1),
            window_strides=(1, stride, stride, 1),
            padding=((0, 0), (padding, pad_h), (padding, pad_w), (0, 0)),
        )
        return y, state, None

    return Stage(name, init, apply)


def global_avgpool(name: str) -> Stage:
    def init(key, in_shape):
        return None, None, (in_shape[-1],)

    def apply(params, state, x, train):
        return jnp.mean(x, axis=(1, 2)), state, None

    return Stage(name, init, apply)


def batchnorm(name: str, eps: float = 1e-5, momentum: float = 0.1) -> Stage:
    """BatchNorm over the channel (last) axis with torch semantics: batch statistics in
    train mode (and running stats updated with ``momentum`` toward the batch stats,
    using the unbiased batch variance for the running value), running stats in eval."""

    def init(key, in_shape):
        c = in_shape[-1]
        params = {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}
        state = {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
        return params, state, in_shape

    def apply(params, state, x, train):
        axes = tuple(range(x.ndim - 1))
        if train:
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            n = x.size // x.shape[-1]
            unbiased = var * n / max(n - 1, 1)
            new_state = {
                "mean": (1 - momentum) * state["mean"] + momentum * mean,
                "var": (1 - momentum) * state["var"] + momentum * unbiased,
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = state
        y = (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]
        return y, new_state, None

    return Stage(name, init, apply)


def fn_stage(name: str, f: Callable[[jax.Array], jax.Array],
             out_shape_fn: Callable[[tuple], tuple] = lambda s: s) -> Stage:
    def init(key, in_shape):
        return None, None, out_shape_fn(in_shape)

    def apply(params, state, x, train):
        return f(x), state, None

    return Stage(name, init, apply)


# ---------------------------------------------------------------------------
# Sequential network
# ---------------------------------------------------------------------------

class SeqNet:
    """A sequence of named stages operating on a single activation tensor."""

    def __init__(self, stages: list[Stage]):
        names = [s.name for s in stages]
        if len(set(names)) != len(names):
            raise ValueError(f"Duplicate stage names: {names}")
        self.stages = tuple(stages)
        self.stage_names = tuple(names)

    def index_of(self, name: str) -> int:
        return self.stage_names.index(name)

    def init(self, key: jax.Array, input_shape: tuple) -> tuple[dict, dict]:
        """Returns (params, state); entries only for stages that have them."""
        params, state = {}, {}
        shape = tuple(input_shape)
        keys = jax.random.split(key, len(self.stages))
        for st, k in zip(self.stages, keys):
            p, s, shape = st.init(k, shape)
            if p is not None:
                params[st.name] = p
            if s is not None:
                state[st.name] = s
        self.output_shape = shape
        return params, state

    def apply(
        self,
        params: dict,
        x: jax.Array,
        state: Optional[dict] = None,
        train: bool = False,
        splice: Optional[tuple[str, Callable] | dict[str, Callable]] = None,
        stop_at: Optional[str] = None,
    ) -> tuple[jax.Array, dict, dict]:
        """Run the network. Returns (output, taps, new_state).

        taps[name] is the (possibly spliced) output of each stage — the same value the
        next stage consumes, matching the reference hook contract where downstream sees
        the modified output (model_pipeline.py:425-432).

        ``splice`` is either a single ``(layer_name, fn)`` pair or a dict
        ``{layer_name: fn}`` for simultaneous multi-layer interventions (the
        faithfulness pass splices every SAE layer in one forward, compute_ie.py:797-862).
        """
        state = state or {}
        splices = dict([splice]) if isinstance(splice, tuple) else (splice or {})
        taps: dict[str, Any] = {}
        new_state = dict(state)
        for st in self.stages:
            p = params.get(st.name)
            s = state.get(st.name)
            x, ns, subtaps = st.apply(p, s, x, train)
            if ns is not None and st.name in state:
                new_state[st.name] = ns
            if st.name in splices:
                x = splices[st.name](x)
            taps[st.name] = x
            if subtaps:
                for sub, v in subtaps.items():
                    taps[f"{st.name}.{sub}"] = v
            if stop_at is not None and st.name == stop_at:
                break
        return x, taps, new_state

    def apply_segment(
        self,
        params: dict,
        x: jax.Array,
        after: Optional[str],
        upto: str,
        state: Optional[dict] = None,
        splice: Optional[tuple[str, Callable] | dict[str, Callable]] = None,
    ) -> jax.Array:
        """Run stages strictly after ``after`` (or from the start if None) through
        ``upto`` inclusive — the sub-network between two tap points (edge IE)."""
        state = state or {}
        splices = dict([splice]) if isinstance(splice, tuple) else (splice or {})
        start = 0 if after is None else self.index_of(after) + 1
        end = self.index_of(upto)
        for st in self.stages[start : end + 1]:
            x, _, _ = st.apply(params.get(st.name), state.get(st.name), x, False)
            if st.name in splices:
                x = splices[st.name](x)
        return x
