"""Per-layer frozen-SAE registry for circuit discovery.

The reference hardcodes one known-good SAE hyperparameter set per GoogLeNet mixed
layer and loads the matching checkpoint epoch (utils.py:2662-2767 get_specific_sae_params
/ get_specific_sae_model). Here the same table is typed data; checkpoints load through
the Orbax wrapper and the run-ID path scheme.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from sparse_vision_tpu.interp.circuit import FrozenSAE
from sparse_vision_tpu.models.sae import init_sae

# GoogLeNet circuit layers (reference: compute_ie.py:52 — mixed4a is skipped).
CIRCUIT_LAYERS = (
    "mixed3a", "mixed3b", "mixed4b", "mixed4c", "mixed4d", "mixed4e",
    "mixed5a", "mixed5b",
)


@dataclass(frozen=True)
class LayerSAEConfig:
    """Known-good per-layer SAE hyperparameters (reference: utils.py:2668-2741).
    batch_size 256, lr 1e-3, constrained_adam everywhere; only mixed3a differs in
    expansion factor / lambda / dead-neuron schedule."""

    layer: str
    expansion_factor: int
    lambda_sparse: float
    checkpoint_epoch: int
    dead_neurons_steps: int
    learning_rate: float = 1e-3
    batch_size: int = 256
    optimizer: str = "constrained_adam"


LAYER_SAE_CONFIGS: dict[str, LayerSAEConfig] = {
    "mixed3a": LayerSAEConfig("mixed3a", 8, 5.0, 7, 626),
    "mixed3b": LayerSAEConfig("mixed3b", 4, 0.1, 6, 625),
    "mixed4a": LayerSAEConfig("mixed4a", 4, 0.1, 6, 625),
    "mixed4b": LayerSAEConfig("mixed4b", 4, 0.1, 6, 625),
    "mixed4c": LayerSAEConfig("mixed4c", 4, 0.1, 5, 625),
    "mixed4d": LayerSAEConfig("mixed4d", 4, 0.1, 7, 625),
    "mixed4e": LayerSAEConfig("mixed4e", 4, 0.1, 9, 625),
    "mixed5a": LayerSAEConfig("mixed5a", 4, 0.1, 5, 625),
    "mixed5b": LayerSAEConfig("mixed5b", 4, 0.1, 12, 625),
}


def layer_ckpt_dir(checkpoints_root: str, layer: str,
                   sae_model_name: str = "sae_mlp") -> str:
    """The directory where Pipeline saved this layer's SAE when trained with the
    registry hyperparameters: ``{layer}_{joined sae_params_no_epochs values}`` under
    the run's checkpoints folder (train/pipeline.py _sae_ckpt_dir; name excludes
    sae_epochs like the reference, execute_project.py:92-93)."""
    import os

    cfg = LAYER_SAE_CONFIGS[layer]
    values = [sae_model_name, cfg.learning_rate, cfg.batch_size, cfg.optimizer,
              cfg.expansion_factor, cfg.lambda_sparse, cfg.dead_neurons_steps]
    return os.path.join(checkpoints_root, f"{layer}_" + "_".join(str(v) for v in values))


def load_frozen_sae(
    layer: str,
    layer_width: int,
    sae_model_name: str = "sae_mlp",
    checkpoint_dir: Optional[str] = None,
    seed: int = 0,
) -> FrozenSAE:
    """Instantiate the layer's SAE from the registry; restore trained parameters when a
    checkpoint directory is given (reference get_specific_sae_model, utils.py:2745-2767
    loads epoch ``checkpoint_epoch`` and freezes the model).

    ``checkpoint_dir`` is a Pipeline SAE checkpoint directory (see layer_ckpt_dir):
    epochs hold ``{params, opt_state, step, dead_acc}``; only params are used here."""
    cfg = LAYER_SAE_CONFIGS[layer]
    params = init_sae(
        sae_model_name, jax.random.key(seed), layer_width, cfg.expansion_factor
    )
    if checkpoint_dir is not None:
        from sparse_vision_tpu.train.checkpoint import latest_epoch, load_checkpoint

        # prefer the registry's known-good epoch; fall back to the newest available
        epoch = cfg.checkpoint_epoch
        import os

        if not os.path.isdir(os.path.join(checkpoint_dir, f"epoch_{epoch}")):
            epoch = latest_epoch(checkpoint_dir)
        restored = load_checkpoint(checkpoint_dir, epoch)  # full saved tree
        params = jax.tree.map(jnp.asarray, restored["params"])
    params = jax.lax.stop_gradient(params)
    return FrozenSAE(sae_model_name, params, cfg.expansion_factor)
