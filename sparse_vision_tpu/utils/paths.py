"""Deterministic run-ID / file-path scheme.

Reproduces the semantics of the reference's parameter-string file naming
(execute_project.py:78-142, utils.py:151-185): a run is identified by the joined values
of its parameter dicts; the checkpoint name deliberately EXCLUDES ``sae_epochs`` so a
resumed run with more epochs maps onto the same files (model_pipeline.py:181-183).
"""

from __future__ import annotations

import os
from typing import Mapping, Optional

from sparse_vision_tpu.config import RunConfig


def join_params(params: Mapping) -> str:
    return "_".join("None" if v is None else str(v) for v in params.values())


def get_file_path(
    folder_path: Optional[str] = None,
    sae_layer: Optional[str] = None,
    params: Optional[Mapping | str] = None,
    file_name: Optional[str] = None,
    params2: Optional[Mapping | str] = None,
) -> str:
    """Same contract as reference utils.py:151-185."""
    if file_name is not None and file_name.startswith("."):
        ending = file_name
    else:
        ending = f"_{file_name}"

    if folder_path is not None:
        os.makedirs(folder_path, exist_ok=True)

    if params is not None:
        if isinstance(params, Mapping):
            params = join_params(params)
        if params2 is not None:
            if isinstance(params2, Mapping):
                params2 = join_params(params2)
            name = f"{sae_layer}_{params}_{params2}{ending}"
        else:
            name = f"{sae_layer}_{params}{ending}"
    else:
        name = f"{sae_layer}{ending}"

    return name if folder_path is None else os.path.join(folder_path, name)


def model_params_dict(cfg: RunConfig) -> dict:
    # reference: execute_project.py:80
    return {
        "model_name": cfg.model_name,
        "epochs": cfg.model_epochs,
        "learning_rate": cfg.model_learning_rate,
        "batch_size": cfg.batch_size,
        "optimizer": cfg.model_optimizer_name,
    }


def sae_params_dict(cfg: RunConfig) -> dict:
    # reference: execute_project.py:81-82
    d = {
        "sae_model_name": cfg.sae_model_name,
        "sae_epochs": cfg.sae_epochs,
        "learning_rate": cfg.sae_learning_rate,
        "batch_size": cfg.sae_batch_size,
        "optimizer": cfg.sae_optimizer_name,
        "expansion_factor": cfg.sae_expansion_factor,
        "lambda_sparse": cfg.sae_lambda_sparse,
        "dead_neurons_steps": cfg.dead_neurons_steps,
    }
    # transcoders: the TARGET layer is part of the run identity (two transcoders
    # reading the same layer but predicting different ones must not collide on
    # checkpoints/results/exports); non-transcoder identities are unchanged —
    # the reference parameter-string contract has no such field
    if getattr(cfg, "transcoder_target_layer", ""):
        d["sae_model_name"] = (
            f"{cfg.sae_model_name}-to-{cfg.transcoder_target_layer}"
        )
    # crosscoders: the layer SET is part of the run identity (two crosscoders
    # anchored at the same sae_layer but spanning different layers must not
    # collide on checkpoints/results/exports)
    if getattr(cfg, "crosscoder_layers", ""):
        extra = "+".join(
            s.strip() for s in cfg.crosscoder_layers.split(",") if s.strip()
        )
        d["sae_model_name"] = f"{d['sae_model_name']}-x-{extra}"
    return d


def sae_params_no_epochs(cfg: RunConfig) -> dict:
    # 'sae_params_2' in the reference (execute_project.py:92-93): excludes sae_epochs so
    # that checkpoints/run-IDs are stable when resuming with a different epoch count.
    d = sae_params_dict(cfg)
    d.pop("sae_epochs", None)
    return d


def run_id(cfg: RunConfig) -> str:
    """Deterministic run identifier (reference: execute_project.py:130-142)."""
    if cfg.use_sae:
        return get_file_path(
            sae_layer=cfg.sae_layer,
            params=model_params_dict(cfg),
            params2=sae_params_no_epochs(cfg),
            file_name=None,
        ).removesuffix("_None")
    return get_file_path(
        sae_layer=cfg.sae_layer, params=model_params_dict(cfg), file_name=None
    ).removesuffix("_None")


def folder_paths(cfg: RunConfig) -> dict:
    """Per-run output folders (reference: utils.py:1170-1175 get_folder_paths)."""
    base = os.path.join(cfg.directory_path, cfg.model_name, cfg.dataset_name)
    d = {
        "model_weights": os.path.join(base, "model_weights"),
        "sae_weights": os.path.join(base, f"sae_weights_{cfg.sae_model_name}"),
        "evaluation_results": os.path.join(base, f"evaluation_results_{cfg.sae_model_name}"),
        "checkpoints": os.path.join(base, f"checkpoints_{cfg.sae_model_name}"),
        "ie_related_quantities": os.path.join(base, f"ie_related_quantities_{cfg.sae_model_name}"),
    }
    return d
