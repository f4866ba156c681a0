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
