"""Backbone factory + layer-dimension probe.

Replaces the reference's load_model factory (utils.py:227-312) for backbones, and
GetSaeInpSize (get_sae_input_size.py:3-63): because every stage declares its output
shape at init time, the "one-batch forward probe with a hook" becomes a static shape
lookup — no forward pass, no pickle cache (reference caches to layer_dimensions.pkl at
model_pipeline.py:202-230).

For a conv tap the SAE input size is the channel count; for a linear tap it is the
width (get_sae_input_size.py:48-63).
"""

from __future__ import annotations

import jax

from sparse_vision_tpu.config import NUM_CLASSES, get_img_size
from sparse_vision_tpu.models.cnn import make_cnn1
from sparse_vision_tpu.models.layers import SeqNet
from sparse_vision_tpu.models.mlp import MLP_SPECS, make_mlp, make_mlp9_with_sae


def make_backbone(model_name: str, dataset_name: str) -> SeqNet:
    net = _make_backbone(model_name, dataset_name)
    # record the input convention on the net so init_backbone/layer_dimensions
    # agree with the data layer's per-model transform (ViT/CLIP towers take
    # 224px HF-convention inputs on ImageNet, not the 229px InceptionV1 crop)
    net.input_size = get_img_size(dataset_name, model_name)
    return net


def _make_backbone(model_name: str, dataset_name: str) -> SeqNet:
    num_classes = NUM_CLASSES[dataset_name]
    if model_name in MLP_SPECS:
        return make_mlp(model_name, num_classes)
    if model_name == "custom_mlp_9_sae_fc1":
        return make_mlp9_with_sae(num_classes)
    if model_name == "custom_cnn_1":
        return make_cnn1(num_classes)
    if model_name in ("inceptionv1", "googlenet"):
        from sparse_vision_tpu.models.googlenet import make_googlenet

        return make_googlenet(num_classes=NUM_CLASSES["imagenet"])
    if model_name == "resnet50":
        from sparse_vision_tpu.models.resnet import make_resnet50

        return make_resnet50(num_classes=NUM_CLASSES["imagenet"])
    # a '_split' suffix on any ViT/CLIP spec splits each encoder block into
    # separate block{i}_attn / block{i}_mlp stages (attention-out tap surface)
    split_blocks = model_name.endswith("_split")
    vit_name = model_name[:-6] if split_blocks else model_name
    if vit_name in ("vit_test", "vit_tiny", "vit_small", "vit_base"):
        from sparse_vision_tpu.models.vit import make_vit

        return make_vit(vit_name, num_classes,
                        get_img_size(dataset_name, model_name)[0],
                        split_blocks=split_blocks)
    if vit_name.startswith("clip_vit"):
        from sparse_vision_tpu.models.vit import CLIP_SPECS, make_clip_vision

        if vit_name not in CLIP_SPECS:
            raise ValueError(f"Unknown CLIP spec {vit_name} "
                             f"(available: {sorted(CLIP_SPECS)})")
        return make_clip_vision(vit_name, num_classes,
                                get_img_size(dataset_name, model_name)[0],
                                split_blocks=split_blocks)
    if model_name in ("resnet18", "resnet18_1", "resnet18_2"):
        from sparse_vision_tpu.models.resnet import make_resnet18

        # resnet18_1 keeps the 224px stem (fine-tune round 1, utils.py:230-240);
        # resnet18/resnet18_2 use the Tiny-ImageNet surgery: 3x3 stride-1 conv1 and no
        # maxpool (utils.py:242-275).
        return make_resnet18(
            num_classes=num_classes, tiny_imagenet_stem=model_name != "resnet18_1"
        )
    raise ValueError(f"Unsupported model: {model_name}")


def _input_size(net: SeqNet, dataset_name: str) -> tuple:
    # nets built by make_backbone carry their input convention (ViT/CLIP on
    # ImageNet take 224px, not the dataset-default 229px InceptionV1 crop)
    return tuple(getattr(net, "input_size", None) or get_img_size(dataset_name))


def init_backbone(net: SeqNet, key: jax.Array, dataset_name: str) -> tuple[dict, dict]:
    return net.init(key, _input_size(net, dataset_name))


def layer_dimensions(net: SeqNet, dataset_name: str) -> dict:
    """Static shape map: stage name -> output shape (without batch dim). Stage inits
    declare output shapes, so this is a pure shape walk (params are dropped per stage)."""
    shapes = {}
    s = _input_size(net, dataset_name)
    key = jax.random.key(0)
    for st in net.stages:
        _, _, s = st.init(key, s)
        s = tuple(s)
        shapes[st.name] = s
    return shapes


def get_sae_input_size(net: SeqNet, dataset_name: str, sae_layer: str) -> int:
    """Channel count for conv taps, width for linear taps (get_sae_input_size.py:48-63)."""
    dims = layer_dimensions(net, dataset_name)
    if sae_layer not in dims:
        raise ValueError(f"Layer {sae_layer!r} not in {list(dims)}")
    return int(dims[sae_layer][-1])
