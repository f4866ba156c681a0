"""Device mesh + sharding helpers.

The reference is strictly single-device (execute_project.py:102-107; SURVEY.md §2.2:
no DDP/TP/PP anywhere). Scaling here is TPU-native:
- 'data' axis: batch/token sharding — the main axis for SAE training (each chip holds a
  token shard; loss/metric/dead-unit reductions become XLA collectives inserted by pjit).
- 'model' axis (optional): shards the SAE latent dim (d*k can reach 16k+) for very large
  expansion factors. The decoder-norm constraint stays local because each latent's full
  direction (row of W_dec [h, d]) lives on one chip when only h is sharded.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: tuple = (), devices=None) -> Mesh:
    """mesh_shape () -> all devices on 'data'; (d,) -> d-way data; (d, m) -> data x model."""
    devices = devices if devices is not None else jax.devices()
    if mesh_shape == ():
        mesh_shape = (len(devices),)
    n = int(np.prod(mesh_shape))
    if n > len(devices):
        raise ValueError(f"mesh {mesh_shape} needs {n} devices, have {len(devices)}")
    axis_names = ("data",) if len(mesh_shape) == 1 else ("data", "model")
    dev_array = np.asarray(devices[:n]).reshape(mesh_shape)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sae_param_sharding(mesh: Mesh, params: dict) -> dict:
    """Latent-dim ('model' axis) sharding for SAE params when the mesh has a model
    axis; fully replicated otherwise. Layout: W_enc [d, h] shards h (axis 1); W_dec
    [h, d], b_enc [h], r_mag/b_mag/b_gate [h] shard h (axis 0); b_dec [d] replicated."""
    if "model" not in mesh.axis_names:
        return jax.tree.map(lambda _: replicated(mesh), params)

    spec_by_name = {
        "W_enc": P(None, "model"),
        "W_gate": P(None, "model"),
        "b_enc": P("model"),
        "b_gate": P("model"),
        "b_mag": P("model"),
        "r_mag": P("model"),
        "W_dec": P("model", None),
        "log_threshold": P("model"),  # jumprelu per-latent thresholds [h]
        "b_dec": P(),
    }

    def spec(k):
        if k in spec_by_name:
            return spec_by_name[k]
        # crosscoder flat per-layer keys (models/crosscoder.py): W_enc_i [d_i, h]
        # shards h (axis 1), W_dec_i [h, d_i] shards h (axis 0), b_dec_i replicated
        if k.startswith("W_enc_"):
            return P(None, "model")
        if k.startswith("W_dec_"):
            return P("model", None)
        return P()

    return {k: NamedSharding(mesh, spec(k)) for k in params}
