"""Vision Transformer backbone (beyond-reference model family).

The reference is CNN/MLP-only; modern vision-SAE work trains SAEs on ViT
residual-stream activations, so the framework ships a ViT on the same SeqNet
tap/splice engine: every encoder block is a named stage whose [B, N+1, D] output
can be tapped, spliced with an SAE, or circuit-analyzed exactly like a conv
feature map (tokens_from_act flattens [B, N, D] -> [B*N, D]; the token axis plays
the role the reference's (b h w) axis plays for convs, utils.py:2770-2774).

Math matches HuggingFace ``transformers`` ViTModel exactly (pre-LN blocks,
separate q/k/v projections, exact GELU, LN eps 1e-12) so torchvision-free golden
parity tests can convert an HF checkpoint via ``convert_hf_vit`` — same pattern
as the GoogLeNet/ResNet converters (tests/test_pretrained_backbones.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from sparse_vision_tpu.models.layers import (
    SeqNet,
    Stage,
    _torch_linear_init,
    promote_conv_operands,
)

_LN_EPS = 1e-12  # HF ViTConfig.layer_norm_eps default


# depth, dim, heads, mlp hidden (standard ViT family shapes; _test is CI-sized)
VIT_SPECS: dict[str, tuple[int, int, int, int]] = {
    "vit_test": (2, 64, 2, 128),
    "vit_tiny": (12, 192, 3, 768),
    "vit_small": (12, 384, 6, 1536),
    "vit_base": (12, 768, 12, 3072),
}

# image side -> patch size (must divide the side)
_PATCH_FOR_SIDE = {28: 7, 32: 4, 64: 8, 224: 16}


def _layernorm(x, scale, bias, eps: float = _LN_EPS):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _quick_gelu(x):
    # OpenAI CLIP's activation (HF activations.py QuickGELUActivation)
    return x * jax.nn.sigmoid(1.702 * x)


def patch_embed_stage(name: str, dim: int, patch: int) -> Stage:
    def init(key, in_shape):
        h, w, c = in_shape
        if h % patch or w % patch:
            raise ValueError(f"Image side {(h, w)} not divisible by patch {patch}.")
        n = (h // patch) * (w // patch)
        kw, kc, kp = jax.random.split(key, 3)
        w_proj, b_proj = _torch_linear_init(
            kw, c * patch * patch, (patch, patch, c, dim), (dim,)
        )
        params = {
            "proj_w": w_proj,
            "proj_b": b_proj,
            # HF init is trunc-normal(0.02); exact init only matters untrained
            "cls": 0.02 * jax.random.normal(kc, (dim,)),
            "pos": 0.02 * jax.random.normal(kp, (n + 1, dim)),
        }
        return params, None, (n + 1, dim)

    def apply(params, state, x, train):
        if x.shape[1] % patch or x.shape[2] % patch:
            # a VALID stride-`patch` conv would silently CROP the remainder
            # (e.g. the 229px InceptionV1 ImageNet convention through patch 16)
            raise ValueError(
                f"Input side {x.shape[1:3]} not divisible by patch {patch}; "
                "ViT/CLIP towers take 224px HF-convention inputs on ImageNet "
                "(data/datasets.py vit_decode/clip_decode)."
            )
        xp, wp = promote_conv_operands(x, params["proj_w"])
        y = jax.lax.conv_general_dilated(
            xp, wp, window_strides=(patch, patch), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params["proj_b"]
        b, gh, gw, d = y.shape
        tokens = y.reshape(b, gh * gw, d)
        cls = jnp.broadcast_to(params["cls"], (b, 1, d))
        return jnp.concatenate([cls, tokens], axis=1) + params["pos"], state, None

    return Stage(name, init, apply)


def vit_block_stage(name: str, dim: int, heads: int, mlp_dim: int,
                    act: str = "gelu", ln_eps: float = _LN_EPS) -> Stage:
    if dim % heads:
        raise ValueError(f"dim {dim} not divisible by heads {heads}")
    dh = dim // heads
    act_fn = (_quick_gelu if act == "quick_gelu"
              else lambda v: jax.nn.gelu(v, approximate=False))

    def init(key, in_shape):
        keys = jax.random.split(key, 6)
        q_w, q_b = _torch_linear_init(keys[0], dim, (dim, dim), (dim,))
        k_w, k_b = _torch_linear_init(keys[1], dim, (dim, dim), (dim,))
        v_w, v_b = _torch_linear_init(keys[2], dim, (dim, dim), (dim,))
        o_w, o_b = _torch_linear_init(keys[3], dim, (dim, dim), (dim,))
        m1_w, m1_b = _torch_linear_init(keys[4], dim, (dim, mlp_dim), (mlp_dim,))
        m2_w, m2_b = _torch_linear_init(keys[5], mlp_dim, (mlp_dim, dim), (dim,))
        params = {
            "ln1_scale": jnp.ones((dim,)), "ln1_bias": jnp.zeros((dim,)),
            "q_w": q_w, "q_b": q_b, "k_w": k_w, "k_b": k_b,
            "v_w": v_w, "v_b": v_b, "o_w": o_w, "o_b": o_b,
            "ln2_scale": jnp.ones((dim,)), "ln2_bias": jnp.zeros((dim,)),
            "mlp1_w": m1_w, "mlp1_b": m1_b, "mlp2_w": m2_w, "mlp2_b": m2_b,
        }
        return params, None, in_shape

    def apply(params, state, x, train):
        b, t, d = x.shape
        h = _layernorm(x, params["ln1_scale"], params["ln1_bias"], ln_eps)
        q = (h @ params["q_w"] + params["q_b"]).reshape(b, t, heads, dh)
        k = (h @ params["k_w"] + params["k_b"]).reshape(b, t, heads, dh)
        v = (h @ params["v_w"] + params["v_b"]).reshape(b, t, heads, dh)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(dh)
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
        x = x + ctx @ params["o_w"] + params["o_b"]
        h2 = _layernorm(x, params["ln2_scale"], params["ln2_bias"], ln_eps)
        h2 = act_fn(h2 @ params["mlp1_w"] + params["mlp1_b"])
        return x + h2 @ params["mlp2_w"] + params["mlp2_b"], state, None

    return Stage(name, init, apply)


def vit_attn_stage(name: str, dim: int, heads: int,
                   ln_eps: float = _LN_EPS) -> Stage:
    """The block's attention sublayer alone: ``x + attn(ln1(x))``. Splitting a
    block into attn/mlp stages (``split_blocks=True``) exposes the attention
    output and the MLP output as SEPARATE tap/splice points — the standard
    transformer-interp surface (attention-out SAEs; e.g. Kissane et al. 2024):
    a plain per-block tap only sees their sum on the residual stream."""
    if dim % heads:
        raise ValueError(f"dim {dim} not divisible by heads {heads}")
    dh = dim // heads

    def init(key, in_shape):
        keys = jax.random.split(key, 4)
        q_w, q_b = _torch_linear_init(keys[0], dim, (dim, dim), (dim,))
        k_w, k_b = _torch_linear_init(keys[1], dim, (dim, dim), (dim,))
        v_w, v_b = _torch_linear_init(keys[2], dim, (dim, dim), (dim,))
        o_w, o_b = _torch_linear_init(keys[3], dim, (dim, dim), (dim,))
        params = {
            "ln1_scale": jnp.ones((dim,)), "ln1_bias": jnp.zeros((dim,)),
            "q_w": q_w, "q_b": q_b, "k_w": k_w, "k_b": k_b,
            "v_w": v_w, "v_b": v_b, "o_w": o_w, "o_b": o_b,
        }
        return params, None, in_shape

    def apply(params, state, x, train):
        b, t, d = x.shape
        h = _layernorm(x, params["ln1_scale"], params["ln1_bias"], ln_eps)
        q = (h @ params["q_w"] + params["q_b"]).reshape(b, t, heads, dh)
        k = (h @ params["k_w"] + params["k_b"]).reshape(b, t, heads, dh)
        v = (h @ params["v_w"] + params["v_b"]).reshape(b, t, heads, dh)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(dh)
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
        return x + ctx @ params["o_w"] + params["o_b"], state, None

    return Stage(name, init, apply)


def vit_mlp_stage(name: str, dim: int, mlp_dim: int, act: str = "gelu",
                  ln_eps: float = _LN_EPS) -> Stage:
    """The block's MLP sublayer alone: ``x + mlp(ln2(x))`` (see vit_attn_stage)."""
    act_fn = (_quick_gelu if act == "quick_gelu"
              else lambda v: jax.nn.gelu(v, approximate=False))

    def init(key, in_shape):
        k1, k2 = jax.random.split(key)
        m1_w, m1_b = _torch_linear_init(k1, dim, (dim, mlp_dim), (mlp_dim,))
        m2_w, m2_b = _torch_linear_init(k2, mlp_dim, (mlp_dim, dim), (dim,))
        params = {
            "ln2_scale": jnp.ones((dim,)), "ln2_bias": jnp.zeros((dim,)),
            "mlp1_w": m1_w, "mlp1_b": m1_b, "mlp2_w": m2_w, "mlp2_b": m2_b,
        }
        return params, None, in_shape

    def apply(params, state, x, train):
        h2 = _layernorm(x, params["ln2_scale"], params["ln2_bias"], ln_eps)
        h2 = act_fn(h2 @ params["mlp1_w"] + params["mlp1_b"])
        return x + h2 @ params["mlp2_w"] + params["mlp2_b"], state, None

    return Stage(name, init, apply)


def _block_stages(i: int, dim: int, heads: int, mlp_dim: int, act: str,
                  ln_eps: float, split: bool) -> list[Stage]:
    if split:
        return [vit_attn_stage(f"block{i}_attn", dim, heads, ln_eps),
                vit_mlp_stage(f"block{i}_mlp", dim, mlp_dim, act, ln_eps)]
    return [vit_block_stage(f"block{i}", dim, heads, mlp_dim, act, ln_eps)]


def _split_block_params(block: dict) -> dict:
    """One fused block param dict -> {'<attn keys>', '<mlp keys>'} pair."""
    attn_keys = ("ln1_scale", "ln1_bias", "q_w", "q_b", "k_w", "k_b",
                 "v_w", "v_b", "o_w", "o_b")
    return ({k: block[k] for k in attn_keys},
            {k: v for k, v in block.items() if k not in attn_keys})


def split_converted_blocks(params: dict, depth: int) -> dict:
    """Re-key a convert_hf_vit / convert_hf_clip_vision result for a
    split_blocks=True net: block{i} -> block{i}_attn + block{i}_mlp. The math
    is identical (the two sublayers compose to exactly the fused block)."""
    out = {k: v for k, v in params.items() if not k.startswith("block")}
    for i in range(depth):
        attn, mlp = _split_block_params(params[f"block{i}"])
        out[f"block{i}_attn"] = attn
        out[f"block{i}_mlp"] = mlp
    return out


def _ln_stage(name: str, dim: int, ln_eps: float = _LN_EPS) -> Stage:
    def init(key, in_shape):
        return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}, None, in_shape

    def apply(params, state, x, train):
        return _layernorm(x, params["scale"], params["bias"], ln_eps), state, None

    return Stage(name, init, apply)


def _cls_select_stage(name: str) -> Stage:
    def init(key, in_shape):
        return None, None, (in_shape[-1],)

    def apply(params, state, x, train):
        return x[:, 0], state, None

    return Stage(name, init, apply)


def _head_stage(name: str, dim: int, num_classes: int) -> Stage:
    def init(key, in_shape):
        w, b = _torch_linear_init(key, dim, (dim, num_classes), (num_classes,))
        return {"w": w, "b": b}, None, (num_classes,)

    def apply(params, state, x, train):
        return x @ params["w"] + params["b"], state, None

    return Stage(name, init, apply)


def make_vit(spec_name: str, num_classes: int, img_side: int,
             split_blocks: bool = False) -> SeqNet:
    depth, dim, heads, mlp_dim = VIT_SPECS[spec_name]
    if img_side not in _PATCH_FOR_SIDE:
        raise ValueError(
            f"No patch size for {img_side}px input (supported: "
            f"{sorted(_PATCH_FOR_SIDE)}; the 229px InceptionV1 ImageNet crop is a "
            "CNN-pipeline convention — use 224px data for ViT)."
        )
    patch = _PATCH_FOR_SIDE[img_side]
    stages = [patch_embed_stage("patch_embed", dim, patch)]
    for i in range(depth):
        stages += _block_stages(i, dim, heads, mlp_dim, "gelu", _LN_EPS,
                                split_blocks)
    stages += [_ln_stage("ln_final", dim), _cls_select_stage("cls"),
               _head_stage("head", dim, num_classes)]
    return SeqNet(stages)


# ---------------------------------------------------------------------------
# CLIP vision tower (OpenAI CLIP / HF CLIPVisionModel) — the standard modern
# vision-SAE target (e.g. Fry 2024 "Towards Multimodal Interpretability",
# Daujotas 2024 CLIP-ViT SAEs). Differences from the plain ViT above, all
# matching HF modeling_clip.py exactly: the patch conv has NO bias, a
# pre-layernorm runs before the encoder stack, the MLP activation is
# quick-GELU (x * sigmoid(1.702 x)), LN eps is 1e-5, and the pooled output is
# post_layernorm(CLS). The classification head here stands where CLIP's
# visual_projection does (convert_hf_clip_vision maps it when present).
# ---------------------------------------------------------------------------

_CLIP_LN_EPS = 1e-5

# depth, dim, heads, mlp hidden, patch (None -> per-dataset _PATCH_FOR_SIDE)
CLIP_SPECS: dict[str, tuple[int, int, int, int, int | None]] = {
    "clip_vit_test": (2, 64, 2, 128, None),
    "clip_vit_b32": (12, 768, 12, 3072, 32),
    "clip_vit_b16": (12, 768, 12, 3072, 16),
    "clip_vit_l14": (24, 1024, 16, 4096, 14),
}


def clip_patch_embed_stage(name: str, dim: int, patch: int) -> Stage:
    """CLIP embeddings (modeling_clip.py CLIPVisionEmbeddings): bias-free patch
    conv, learned class embedding, learned position embeddings."""

    def init(key, in_shape):
        h, w, c = in_shape
        if h % patch or w % patch:
            raise ValueError(f"Image side {(h, w)} not divisible by patch {patch}.")
        n = (h // patch) * (w // patch)
        kw, kc, kp = jax.random.split(key, 3)
        w_proj, _ = _torch_linear_init(
            kw, c * patch * patch, (patch, patch, c, dim), (dim,)
        )
        params = {
            "proj_w": w_proj,  # no bias, per CLIP
            "cls": 0.02 * jax.random.normal(kc, (dim,)),
            "pos": 0.02 * jax.random.normal(kp, (n + 1, dim)),
        }
        return params, None, (n + 1, dim)

    def apply(params, state, x, train):
        if x.shape[1] % patch or x.shape[2] % patch:
            raise ValueError(
                f"Input side {x.shape[1:3]} not divisible by patch {patch}; "
                "CLIP towers take 224px CLIPImageProcessor-convention inputs "
                "(data/datasets.py clip_decode)."
            )
        xp, wp = promote_conv_operands(x, params["proj_w"])
        y = jax.lax.conv_general_dilated(
            xp, wp, window_strides=(patch, patch), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b, gh, gw, d = y.shape
        tokens = y.reshape(b, gh * gw, d)
        cls = jnp.broadcast_to(params["cls"], (b, 1, d))
        return jnp.concatenate([cls, tokens], axis=1) + params["pos"], state, None

    return Stage(name, init, apply)


def make_clip_vision(spec_name: str, num_classes: int, img_side: int,
                     split_blocks: bool = False) -> SeqNet:
    depth, dim, heads, mlp_dim, patch = CLIP_SPECS[spec_name]
    if patch is None:
        if img_side not in _PATCH_FOR_SIDE:
            raise ValueError(f"No patch size for {img_side}px input "
                             f"(supported: {sorted(_PATCH_FOR_SIDE)}).")
        patch = _PATCH_FOR_SIDE[img_side]
    stages = [clip_patch_embed_stage("patch_embed", dim, patch),
              _ln_stage("pre_ln", dim, _CLIP_LN_EPS)]
    for i in range(depth):
        stages += _block_stages(i, dim, heads, mlp_dim, "quick_gelu",
                                _CLIP_LN_EPS, split_blocks)
    stages += [_cls_select_stage("cls"), _ln_stage("post_ln", dim, _CLIP_LN_EPS),
               _head_stage("head", dim, num_classes)]
    return SeqNet(stages)


def convert_hf_clip_vision(state_dict: dict, depth: int) -> dict:
    """HF ``CLIPVisionModel``/``CLIPVisionModelWithProjection`` state_dict
    (tensors or numpy) -> SeqNet params. ``visual_projection`` (bias-free) maps
    onto the head when present; otherwise the head keeps its own init (train a
    classifier on top of the frozen tower)."""
    import numpy as np

    sd = {k: np.asarray(v.detach() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    e = "vision_model.embeddings."
    params: dict = {
        "patch_embed": {
            "proj_w": sd[e + "patch_embedding.weight"].transpose(2, 3, 1, 0),
            "cls": sd[e + "class_embedding"],
            "pos": sd[e + "position_embedding.weight"],
        },
        # HF's attribute really is spelled 'pre_layrnorm' (modeling_clip.py)
        "pre_ln": {"scale": sd["vision_model.pre_layrnorm.weight"],
                   "bias": sd["vision_model.pre_layrnorm.bias"]},
        "post_ln": {"scale": sd["vision_model.post_layernorm.weight"],
                    "bias": sd["vision_model.post_layernorm.bias"]},
    }
    if "visual_projection.weight" in sd:
        w = sd["visual_projection.weight"].T
        params["head"] = {"w": w, "b": np.zeros(w.shape[1], w.dtype)}
    for i in range(depth):
        p = f"vision_model.encoder.layers.{i}."
        a = p + "self_attn."
        params[f"block{i}"] = {
            "ln1_scale": sd[p + "layer_norm1.weight"],
            "ln1_bias": sd[p + "layer_norm1.bias"],
            "q_w": sd[a + "q_proj.weight"].T, "q_b": sd[a + "q_proj.bias"],
            "k_w": sd[a + "k_proj.weight"].T, "k_b": sd[a + "k_proj.bias"],
            "v_w": sd[a + "v_proj.weight"].T, "v_b": sd[a + "v_proj.bias"],
            "o_w": sd[a + "out_proj.weight"].T, "o_b": sd[a + "out_proj.bias"],
            "ln2_scale": sd[p + "layer_norm2.weight"],
            "ln2_bias": sd[p + "layer_norm2.bias"],
            "mlp1_w": sd[p + "mlp.fc1.weight"].T, "mlp1_b": sd[p + "mlp.fc1.bias"],
            "mlp2_w": sd[p + "mlp.fc2.weight"].T, "mlp2_b": sd[p + "mlp.fc2.bias"],
        }
    return {k: jax.tree.map(jnp.asarray, v) for k, v in params.items()}


def convert_hf_vit(state_dict: dict, depth: int) -> dict:
    """HF ``ViTForImageClassification.state_dict()`` (tensors or numpy) -> SeqNet
    params. Torch linears store [out, in]; ours are [in, out]."""
    import numpy as np

    sd = {k: np.asarray(v.detach() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    e = "vit.embeddings."
    params: dict = {
        "patch_embed": {
            "proj_w": sd[e + "patch_embeddings.projection.weight"].transpose(2, 3, 1, 0),
            "proj_b": sd[e + "patch_embeddings.projection.bias"],
            "cls": sd[e + "cls_token"][0, 0],
            "pos": sd[e + "position_embeddings"][0],
        },
        "ln_final": {"scale": sd["vit.layernorm.weight"],
                     "bias": sd["vit.layernorm.bias"]},
        "head": {"w": sd["classifier.weight"].T, "b": sd["classifier.bias"]},
    }
    for i in range(depth):
        p = f"vit.encoder.layer.{i}."
        a = p + "attention.attention."
        params[f"block{i}"] = {
            "ln1_scale": sd[p + "layernorm_before.weight"],
            "ln1_bias": sd[p + "layernorm_before.bias"],
            "q_w": sd[a + "query.weight"].T, "q_b": sd[a + "query.bias"],
            "k_w": sd[a + "key.weight"].T, "k_b": sd[a + "key.bias"],
            "v_w": sd[a + "value.weight"].T, "v_b": sd[a + "value.bias"],
            "o_w": sd[p + "attention.output.dense.weight"].T,
            "o_b": sd[p + "attention.output.dense.bias"],
            "ln2_scale": sd[p + "layernorm_after.weight"],
            "ln2_bias": sd[p + "layernorm_after.bias"],
            "mlp1_w": sd[p + "intermediate.dense.weight"].T,
            "mlp1_b": sd[p + "intermediate.dense.bias"],
            "mlp2_w": sd[p + "output.dense.weight"].T,
            "mlp2_b": sd[p + "output.dense.bias"],
        }
    return {k: jax.tree.map(jnp.asarray, v) for k, v in params.items()}
