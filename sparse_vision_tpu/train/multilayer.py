"""Multi-layer SAE training: ONE backbone pass feeds every layer's SAE.

The reference prepares the circuit tier's per-layer frozen SAEs with one cluster
job per (layer, hyperparameters) combination (specify_parameters.py:250-272 —
`sae_layers` is just another sweep axis), so the 8 GoogLeNet circuit layers
(compute_ie.py:52) cost 8 full ImageNet forward passes before any SAE trains.

TPU-first redesign: `SeqNet.apply` already returns every stage's output up to
``stop_at``, so the activation dump taps ALL requested layers from a single
forward (data/activation_cache.dump_activations_multi) — backbone FLOPs are paid
once regardless of layer count — and each layer's SAE then trains from its cache
at memory bandwidth. The per-layer caches, run IDs, checkpoints, and results are
byte/semantics-identical to running the layers one at a time, so everything
downstream (circuit registry, eval tier, resume) is unchanged.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.interp.registry import CIRCUIT_LAYERS, LAYER_SAE_CONFIGS


def layer_config(base_cfg: RunConfig, layer: str, use_registry: bool = True) -> RunConfig:
    """The per-layer RunConfig: ``base_cfg`` retargeted at ``layer``, with the
    registry's known-good hyperparameters (reference utils.py:2668-2741) applied
    when available. Epoch count, dataset, model, and cache knobs stay base-level
    so every layer shares one dump geometry."""
    overrides: dict = {
        "sae_layer": layer,
        "original_model": False,  # use_sae == not original_model
        "training": True,
        "use_activation_cache": True,
    }
    if use_registry and layer in LAYER_SAE_CONFIGS:
        reg = LAYER_SAE_CONFIGS[layer]
        overrides.update(
            sae_expansion_factor=reg.expansion_factor,
            sae_lambda_sparse=reg.lambda_sparse,
            dead_neurons_steps=reg.dead_neurons_steps,
            sae_learning_rate=reg.learning_rate,
            sae_optimizer_name=reg.optimizer,
            # batch_size is part of the registry recipe AND of the checkpoint
            # directory name layer_ckpt_dir reconstructs — leaving it at the
            # base value desynchronizes the trained dir from the dir the
            # circuit engine later loads (caught by the r5 flagship smoke)
            sae_batch_size=reg.batch_size,
        )
    return dataclasses.replace(base_cfg, **overrides)


def train_saes_multilayer(
    base_cfg: RunConfig,
    layers: Optional[Sequence[str]] = None,
    use_registry: bool = True,
) -> dict[str, dict]:
    """Dump all missing layer caches in one backbone pass, then train one SAE per
    layer from its cache. Returns {layer: final eval results dict}.

    ``layers`` defaults to the circuit layers present in the backbone
    (interp/registry.CIRCUIT_LAYERS ∩ stage names). With ``use_registry`` each
    layer trains at its reference known-good hyperparameters; otherwise every
    layer uses ``base_cfg``'s SAE hyperparameters unchanged.
    """
    from sparse_vision_tpu.data.activation_cache import dump_activations_multi
    from sparse_vision_tpu.train.pipeline import Pipeline

    layers = list(layers) if layers is not None else []
    first_layer = layers[0] if layers else (
        base_cfg.sae_layer if base_cfg.sae_layer in LAYER_SAE_CONFIGS
        else CIRCUIT_LAYERS[0]
    )
    p0 = Pipeline(layer_config(base_cfg, first_layer, use_registry))
    if not layers:
        layers = [l for l in CIRCUIT_LAYERS if l in p0.net.stage_names]
        if not layers:
            raise ValueError(
                f"No circuit layers found in backbone {base_cfg.model_name!r} "
                f"(stages: {p0.net.stage_names}); pass layers= explicitly."
            )
        if layers[0] != first_layer:
            p0 = Pipeline(layer_config(base_cfg, layers[0], use_registry))
    unknown = [l for l in layers if l.split(".")[0] not in p0.net.stage_names]
    if unknown:
        raise ValueError(f"Layers {unknown} not in backbone stages {p0.net.stage_names}")

    missing = [
        l for l in layers
        if not os.path.exists(os.path.join(p0._cache_dir(l), "meta.json"))
    ]
    if missing:
        print(f"Building activation caches for {missing} in one backbone pass ...")
        dump_activations_multi(
            p0.net, p0.frozen_params, p0.net_state, p0.train_ds,
            missing, {l: p0._cache_dir(l) for l in missing},
            **p0._cache_dump_kwargs(),
        )

    results: dict[str, dict] = {}
    for layer in layers:
        pipe = p0 if layer == layers[0] else Pipeline(
            layer_config(base_cfg, layer, use_registry)
        )
        print(f"Training SAE on layer {layer} from cache ...")
        results[layer] = pipe.run()
    return results


def transcoder_pairs(net, dataset_name: str,
                     layers: Optional[Sequence[str]] = None) -> list[tuple[str, str]]:
    """Consecutive layer pairs eligible for transcoder training: adjacent
    entries of ``layers`` (default: the backbone's circuit layers) whose
    SPATIAL dims match. A transcoder is a per-token map between channel
    spaces (models/sae.transcoder_inference_and_loss), so pairs crossing a
    pooling boundary (e.g. GoogLeNet mixed3b -> mixed4a, 28x28 -> 14x14) are
    excluded — their token streams cannot pair 1:1."""
    from sparse_vision_tpu.models.backbone import layer_dimensions

    if layers is None:
        layers = [l for l in CIRCUIT_LAYERS if l in net.stage_names]
    dims = layer_dimensions(net, dataset_name)
    pairs = []
    for a, b in zip(layers, layers[1:]):
        if dims[a][:-1] == dims[b][:-1]:
            pairs.append((a, b))
    return pairs


def train_transcoders_multilayer(
    base_cfg: RunConfig,
    pairs: Optional[Sequence[tuple[str, str]]] = None,
    use_registry: bool = True,
) -> dict[tuple[str, str], dict]:
    """Train a transcoder for every eligible consecutive circuit pair — all
    paired caches from ONE backbone pass (the reference has no transcoders;
    Dunefsky et al. 2024 train one per MLP block, each with its own data pass).

    ``pairs`` defaults to :func:`transcoder_pairs` over the backbone's circuit
    layers (GoogLeNet: 3a->3b, 4b->4c->4d->4e, 5a->5b — 5 pairs from the
    registry's 8-layer list; the pool-crossing adjacencies are not per-token
    mappable).
    With ``use_registry`` each pair trains at its INPUT layer's known-good
    hyperparameters. Returns {(in_layer, out_layer): final eval results}."""
    from sparse_vision_tpu.data.activation_cache import dump_activations_multi
    from sparse_vision_tpu.train.pipeline import Pipeline

    def pair_config(a: str, b: str) -> RunConfig:
        cfg = layer_config(base_cfg, a, use_registry)
        return dataclasses.replace(
            cfg, sae_model_name="transcoder", transcoder_target_layer=b,
        )

    if pairs is None:
        # a bare backbone (no Pipeline) is enough to enumerate eligible pairs
        from sparse_vision_tpu.models.backbone import make_backbone

        net = make_backbone(base_cfg.model_name, base_cfg.dataset_name)
        pairs = transcoder_pairs(net, base_cfg.dataset_name)
        if not pairs:
            raise ValueError(
                f"No same-geometry consecutive circuit pairs in "
                f"{base_cfg.model_name!r}; pass pairs= explicitly."
            )
    pairs = [tuple(p) for p in pairs]
    p0 = Pipeline(pair_config(*pairs[0]))

    all_layers = list(dict.fromkeys([l for pair in pairs for l in pair]))
    unknown = [l for l in all_layers if l.split(".")[0] not in p0.net.stage_names]
    if unknown:
        raise ValueError(f"Layers {unknown} not in backbone stages {p0.net.stage_names}")
    missing = [
        l for l in all_layers
        if not os.path.exists(os.path.join(p0._cache_dir(l), "meta.json"))
    ]
    if missing:
        print(f"Building activation caches for {missing} in one backbone pass ...")
        dump_activations_multi(
            p0.net, p0.frozen_params, p0.net_state, p0.train_ds,
            missing, {l: p0._cache_dir(l) for l in missing},
            **p0._cache_dump_kwargs(),
        )

    results: dict[tuple[str, str], dict] = {}
    for pair in pairs:
        pipe = p0 if pair == pairs[0] else Pipeline(pair_config(*pair))
        print(f"Training transcoder {pair[0]} -> {pair[1]} from caches ...")
        results[pair] = pipe.run()
    return results
