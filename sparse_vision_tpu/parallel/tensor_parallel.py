"""Tensor-parallel SAE training over a 2-D (data, model) mesh — GSPMD style.

Motivation (SURVEY.md §2.2): the latent dim h = d * expansion_factor reaches 16k+ for
the north-star workload, and beyond ~64k the params + Adam moments + per-token latent
blocks stop fitting one chip. The reference is single-device and has no equivalent.

Design: instead of hand-writing collectives in shard_map, the SINGLE-DEVICE step
function (train.steps.make_sae_train_step_from_acts — identical math, stock jnp path)
runs under jit with the train state PLACED on 'model'-axis shardings and the tokens on
the 'data' axis. XLA's SPMD partitioner then:
- partitions the encode matmul [T, d] x [d, h_shard] with no communication,
- inserts the psum for the decode matmul's contraction over h,
- turns every latent-axis reduction in the metrics, the ConstrainedAdam renorm
  (row-local on W_dec [h, d] rows), and the dead-neuron resample's global live-latent
  statistics (ops/resample.py:67-91) into the right collectives automatically.

Correctness follows from it being the SAME traced program as single-device — proved
exactly in tests/test_tensor_parallel.py on a (2, 4) CPU mesh across a resample
boundary. The fused Pallas kernels are data-parallel-only (a manual-collective TP
variant would have to split their internal recon/MSE accumulation); the stock path
used here still runs the matmuls on the MXU via XLA.

Layouts (parallel/mesh.py sae_param_sharding):
  W_enc [d, h]: P(None, 'model')    b_enc/b_gate/b_mag/r_mag [h]: P('model')
  W_dec [h, d]: P('model', None)    b_dec [d]: replicated
  Adam moments follow their params; dead_acc [h]: P('model'); step/rng replicated.
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sparse_vision_tpu.parallel.mesh import sae_param_sharding
from sparse_vision_tpu.train.steps import SAETrainState


def sae_opt_state_sharding(mesh: Mesh, opt_state, param_shardings: dict):
    """Shardings for an optimizer state: Adam moment trees mirror the param
    shardings; scalar counts and anything else replicate."""
    rep = NamedSharding(mesh, P())

    def fix_state(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=rep,
                mu={k: param_shardings[k] for k in s.mu},
                nu={k: param_shardings[k] for k in s.nu},
            )
        return jax.tree.map(lambda _: rep, s)

    return jax.tree.map(
        fix_state, opt_state, is_leaf=lambda s: isinstance(s, optax.ScaleByAdamState)
    )


def put_tp_state(mesh: Mesh, ts: SAETrainState) -> SAETrainState:
    """Place a train state for tensor-parallel training: params + Adam moments +
    dead accumulator sharded over 'model', step/rng replicated."""
    if "model" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'model' axis")
    p_shard = sae_param_sharding(mesh, ts.params)
    return SAETrainState(
        params=jax.device_put(ts.params, p_shard),
        opt_state=jax.device_put(
            ts.opt_state, sae_opt_state_sharding(mesh, ts.opt_state, p_shard)
        ),
        step=jax.device_put(ts.step, NamedSharding(mesh, P())),
        dead_acc=jax.device_put(ts.dead_acc, NamedSharding(mesh, P("model"))),
        rng=jax.device_put(ts.rng, NamedSharding(mesh, P())),
    )


def put_tokens_tp(mesh: Mesh, acts, token_axis: int = 0) -> jax.Array:
    """Tokens shard over 'data' and replicate over 'model' (every model-chip needs
    the full d-dim activation of its token shard) — the same placement as the
    data-parallel path."""
    from sparse_vision_tpu.parallel.sharded_steps import put_tokens_sharded

    return put_tokens_sharded(mesh, acts, token_axis)
