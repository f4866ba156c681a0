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
boundary.

Two TP engines ship:
- GSPMD placement of the stock jitted step (above) — any SAE variant, zero custom
  code, XLA-inserted collectives;
- ``make_tp_fused_train_step`` — the fused Pallas kernels under an explicit
  shard_map (ops/fused_sae_tp.py): per-chip partial reconstructions psum'd over
  'model' before the MSE, H-local gradients psum'd over 'data', and a TP-aware
  dead-neuron resample (ops/resample.resample_dead_neurons_tp). This is the
  production path for >=16k latents, where the fused kernel's HBM savings matter
  most. All five production variants ship TP ops: ReLU (sae_mlp, incl. the
  TP-aware resample), Gated (recon + aux via both psum'd), JumpReLU (H-local STE
  threshold grads), Matryoshka (global prefix reconstructions assembled from
  per-chip snapshot unions), and TopK (two-stage distributed selection,
  ops/fast_topk_sae.py — candidates over ICI instead of GSPMD's dense
  [T, H] all-gather).

Layouts (parallel/mesh.py sae_param_sharding):
  W_enc [d, h]: P(None, 'model')    b_enc/b_gate/b_mag/r_mag [h]: P('model')
  W_dec [h, d]: P('model', None)    b_dec [d]: replicated
  Adam moments follow their params; dead_acc [h]: P('model'); step/rng replicated.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
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


def make_tp_fused_train_step(
    mesh: Mesh,
    ts_placed: SAETrainState,
    lambda_sparse: float,
    tx: optax.GradientTransformation,
    dead_neurons_steps: int,
    expansion_factor: int,
    fused_opts: Optional[dict] = None,
    sae_model_name: str = "sae_mlp",
    matryoshka_prefixes: tuple = (0.0625, 0.25, 1.0),
    topk: int = 32,
    topk_approx: bool = False,
):
    """Tensor-parallel FUSED train step: ``step(ts, acts)`` with the latent dim
    sharded over 'model', tokens over 'data', and the fused Pallas kernels running
    per chip on their local shards (ops/fused_sae_tp.py).

    ``ts_placed`` must already be placed by put_tp_state — its leaf shardings
    define the shard_map specs. Gradients come out of the TP op GLOBAL (psums live
    inside its custom_vjp), so no further pmean is applied; the ConstrainedAdam
    update and the W_dec unit-norm constraint are row-local on the 'model' shards;
    the resample schedule uses the replicated step counter + rng with the TP-aware
    global-statistics resample (sae_mlp only; the other variants never resample,
    matching the reference). sae_model_name selects the kernel pair: "sae_mlp",
    "gated_sae", "jumprelu_sae", or "matryoshka_sae" (which also takes
    ``matryoshka_prefixes``, the GLOBAL dictionary fractions)."""
    import functools

    from sparse_vision_tpu.ops.fast_topk_sae import fast_topk_sae_tp_loss_terms
    from sparse_vision_tpu.ops.fused_sae_tp import (
        fused_gated_sae_tp_loss_terms,
        fused_jumprelu_sae_tp_loss_terms,
        fused_matryoshka_sae_tp_loss_terms,
        fused_sae_tp_loss_terms,
    )
    from sparse_vision_tpu.ops.resample import (
        resample_dead_neurons_tp,
        should_reset_measurement,
        should_resample,
    )
    from sparse_vision_tpu.parallel.sharded_steps import shard_map

    if sae_model_name not in (
        "sae_mlp", "gated_sae", "jumprelu_sae", "matryoshka_sae", "topk_sae"
    ):
        raise ValueError(
            "TP fused step supports sae_mlp, gated_sae, jumprelu_sae,"
            f" matryoshka_sae, topk_sae, not {sae_model_name!r}"
        )
    n_data = int(mesh.shape["data"])
    n_model = int(mesh.shape["model"])
    opts = dict(fused_opts or {})
    can_resample = sae_model_name == "sae_mlp"
    terms_fn = {
        "sae_mlp": fused_sae_tp_loss_terms,
        "gated_sae": fused_gated_sae_tp_loss_terms,
        "jumprelu_sae": fused_jumprelu_sae_tp_loss_terms,
        "matryoshka_sae": functools.partial(
            fused_matryoshka_sae_tp_loss_terms,
            prefixes=tuple(matryoshka_prefixes),
        ),
        "topk_sae": functools.partial(
            fast_topk_sae_tp_loss_terms, k=topk, approx=topk_approx,
        ),
    }[sae_model_name]

    def local_loss(params, act_local):
        out = terms_fn(
            params, act_local, lambda_sparse, expansion_factor, n_data, n_model,
            **opts,
        )
        return out["loss"], out

    def shard_body(ts: SAETrainState, act_local: jax.Array):
        (loss, out), grads = jax.value_and_grad(local_loss, has_aux=True)(
            ts.params, act_local
        )
        # grads are already GLOBAL (the TP op psums inside its custom_vjp)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        step = ts.step + 1

        # out["dead"] is already the global-batch statistic of the local shard
        dead_acc = jnp.logical_and(ts.dead_acc, out["dead"])
        rng, sub = jax.random.split(ts.rng)

        if can_resample:
            def do_resample(p, o, acc):
                p2, o2 = resample_dead_neurons_tp(p, o, acc, sub, n_model)
                return p2, o2, jnp.ones_like(acc)

            def no_resample(p, o, acc):
                acc = jnp.where(
                    should_reset_measurement(step, dead_neurons_steps),
                    jnp.ones_like(acc), acc,
                )
                return p, o, acc

            new_params, opt_state, dead_acc = jax.lax.cond(
                should_resample(step, dead_neurons_steps),
                do_resample, no_resample, new_params, opt_state, dead_acc,
            )

        h_g = dead_acc.shape[0] * n_model
        metrics = {
            "sae_loss": loss,
            "sae_rec_loss": out["rec_loss"],
            "sae_l1_loss": out["l1_loss"],
            "sparsity": out["sparsity"],
            "perc_dead": jax.lax.psum(jnp.sum(dead_acc), "model") / h_g,
        }
        return SAETrainState(new_params, opt_state, step, dead_acc, rng), metrics

    state_specs = jax.tree.map(lambda x: x.sharding.spec, ts_placed)
    rep = P()
    sharded = shard_map(
        shard_body, mesh=mesh,
        in_specs=(state_specs, P("data", None)),
        out_specs=(state_specs, rep),
        check_vma=False,
    )

    @jax.jit
    def step_fn(ts: SAETrainState, acts: jax.Array):
        if acts.shape[0] % n_data:
            raise ValueError(
                f"token count {acts.shape[0]} not divisible by data={n_data}"
            )
        return sharded(ts, acts)

    return step_fn
