"""Multi-chip SAE training: the fused Pallas step under shard_map over a 'data' mesh.

This is the production scaling path for the north-star workload (SURVEY.md §2.2 /
BASELINE: 16k-latent SAE over ImageNet activations on v5e-8): tokens are sharded over
chips, each chip runs the fused forward/backward kernel on its local shard, gradients
and scalar metrics are pmean'd over ICI, dead-unit masks are AND-reduced, and the
(replicated) ConstrainedAdam update is applied identically on every chip.

Correctness notes:
- equal shard sizes (enforced) make pmean of local mean losses equal the global mean
  loss, so pmean'd local gradients equal the global gradient exactly;
- the resample schedule uses the replicated step counter + rng, so all chips make the
  same resample decision and surgery (tests/test_sharded_fused.py checks exact
  equality with the single-device step).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map as _shard_map

    def shard_map(f, **kw):
        return _shard_map(f, **kw)
except ImportError:  # older jax: experimental API spells the check flag differently
    from jax.experimental.shard_map import shard_map as _shard_map_exp

    def shard_map(f, **kw):
        if "check_vma" in kw:
            kw["check_rep"] = kw.pop("check_vma")
        return _shard_map_exp(f, **kw)

from sparse_vision_tpu.ops.resample import (
    resample_dead_neurons,
    should_reset_measurement,
    should_resample,
)
from sparse_vision_tpu.train.steps import SAETrainState


def make_sharded_fused_train_step(
    mesh: Mesh,
    lambda_sparse: float,
    tx: optax.GradientTransformation,
    dead_neurons_steps: int,
    expansion_factor: int,
    fused_opts: Optional[dict] = None,
    fused: bool = True,
    sae_model_name: str = "sae_mlp",
    topk: int = 32,
    topk_approx: bool = False,
    jumprelu_bandwidth: float = 1e-3,
    matryoshka_prefixes: tuple = (0.0625, 0.25, 1.0),
    aux_k: int = 0,
    aux_alpha: float = 0.03125,
):
    """Data-parallel SAE train step: ``step(ts, acts)`` with ``acts`` [T, C] sharded
    over the 'data' axis and the train state replicated. ``fused=False`` runs the
    stock jnp path per chip (e.g. CPU meshes, where Pallas would be interpreted).
    Same loss dispatch + resample gating as the single-device
    train.steps.make_sae_train_step_from_acts, so the two paths stay interchangeable
    from the Pipeline. ``aux_k > 0``: the AuxK dead-revival loss runs per shard on
    the replicated dead accumulator; the pmean'd gradient equals the global-batch
    aux gradient (equal shards)."""
    opts = dict(fused_opts or {})
    n_data = mesh.shape["data"]
    can_resample = sae_model_name == "sae_mlp"
    aux_on = aux_k > 0 and sae_model_name in ("topk_sae", "batch_topk_sae")
    if fused and sae_model_name not in (
        "sae_mlp", "gated_sae", "jumprelu_sae", "topk_sae", "batch_topk_sae",
        "matryoshka_sae",
    ):
        raise ValueError(
            "fused path supports sae_mlp, gated_sae, jumprelu_sae, topk_sae,"
            " batch_topk_sae, matryoshka_sae only"
        )

    if sae_model_name == "batch_topk_sae":
        # EXACT global batch-level selection for free: the radix-bisection
        # cutoff's 32 count-reductions psum over 'data', so every chip masks
        # against the global (T_global*k)-th largest value with 32 scalar
        # collectives and zero candidate gathering (ops/fast_batch_topk.py;
        # stock XLA either way — the `fused` flag changes nothing here)
        from sparse_vision_tpu.ops.fast_batch_topk import (
            fast_batch_topk_sae_loss_terms,
        )

        def local_loss(params, act_local):
            out = fast_batch_topk_sae_loss_terms(
                params, act_local, lambda_sparse, expansion_factor, topk,
                axis_name="data", n_shards=n_data,
            )
            return out["loss"], out
    elif fused and sae_model_name == "topk_sae":
        # gather-based TopK fast path (ops/fast_topk_sae.py) — stock XLA per chip,
        # same pmean/psum reductions as the Pallas variants
        from sparse_vision_tpu.ops.fast_topk_sae import fast_topk_sae_loss_terms

        def local_loss(params, act_local):
            out = fast_topk_sae_loss_terms(
                params, act_local, lambda_sparse, expansion_factor, topk,
                approx=topk_approx,
            )
            return out["loss"], out
    elif fused:
        if sae_model_name == "jumprelu_sae":
            from sparse_vision_tpu.ops.fused_jumprelu_sae import (
                fused_jumprelu_sae_loss_terms as _loss_terms,
            )

            # factory bandwidth is the default; an explicit fused_opts entry wins
            opts = {"bandwidth": jumprelu_bandwidth, **opts}
        elif sae_model_name == "gated_sae":
            from sparse_vision_tpu.ops.fused_gated_sae import (
                fused_gated_sae_loss_terms as _loss_terms,
            )
        elif sae_model_name == "matryoshka_sae":
            from sparse_vision_tpu.ops.fused_matryoshka_sae import (
                fused_matryoshka_sae_loss_terms,
            )

            _loss_terms = functools.partial(
                fused_matryoshka_sae_loss_terms,
                prefixes=tuple(matryoshka_prefixes),
            )
        else:
            from sparse_vision_tpu.ops.fused_sae import (
                fused_sae_loss_terms as _loss_terms,
            )

        def local_loss(params, act_local):
            out = _loss_terms(
                params, act_local, lambda_sparse, expansion_factor, **opts
            )
            return out["loss"], out
    else:
        from sparse_vision_tpu.models.sae import sae_inference_and_loss
        from sparse_vision_tpu.ops.metrics import measure_inactive_units

        def local_loss(params, act_local):
            out = sae_inference_and_loss(
                sae_model_name, params, act_local, lambda_sparse, topk=topk,
                topk_approx=topk_approx, jumprelu_bandwidth=jumprelu_bandwidth,
                matryoshka_prefixes=matryoshka_prefixes,
            )
            dead, sparsity, _ = measure_inactive_units(
                out["encoded"], expansion_factor
            )
            out = {**out, "dead": dead, "sparsity": sparsity}
            return out["loss"], out

    base_local_loss = local_loss

    def aux_local_loss(params, act_local, dead_mask, aux_scale):
        from sparse_vision_tpu.models.sae import topk_aux_loss

        loss, out = base_local_loss(params, act_local)
        aux = topk_aux_loss(params, act_local, act_local - out["decoded"],
                            dead_mask, aux_k, approx=topk_approx)
        out["aux_loss"] = aux
        return loss + aux_scale * aux, out

    def shard_body(ts: SAETrainState, act_local: jax.Array):
        if aux_on:
            mature = (ts.step % dead_neurons_steps) >= dead_neurons_steps // 2
            (loss, out), grads = jax.value_and_grad(aux_local_loss, has_aux=True)(
                ts.params, act_local, ts.dead_acc, aux_alpha * mature
            )
        else:
            (loss, out), grads = jax.value_and_grad(local_loss, has_aux=True)(
                ts.params, act_local
            )
        # global gradient = mean over chips of local-mean gradients (equal shards)
        grads = jax.lax.pmean(grads, "data")
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        step = ts.step + 1

        # dead across the GLOBAL batch = AND over chips of local dead masks
        dead = jax.lax.psum(jnp.logical_not(out["dead"]).astype(jnp.int32), "data") == 0
        dead_acc = jnp.logical_and(ts.dead_acc, dead)
        rng, sub = jax.random.split(ts.rng)

        if can_resample:
            def do_resample(p, o, acc):
                p2, o2 = resample_dead_neurons(p, o, acc, sub)
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
        else:
            # rolling dead window for non-resampling variants (matches
            # train/steps.make_sae_train_step's AuxK dead-revival fix)
            dead_acc = jnp.where(
                step % dead_neurons_steps == 0, jnp.ones_like(dead_acc), dead_acc
            )

        if sae_model_name == "batch_topk_sae":
            # global threshold observation = min over chips of each chip's min
            # positive selected value (inf-masked empties); EMA as single-device
            from sparse_vision_tpu.models.sae import batch_topk_threshold_update

            mp = out["batch_topk_min_pos"]
            mp_g = jax.lax.pmin(jnp.where(mp > 0, mp, jnp.inf), "data")
            obs = jnp.where(jnp.isfinite(mp_g), mp_g, 0.0)
            new_params = {
                **new_params,
                "threshold": batch_topk_threshold_update(
                    ts.params["threshold"], obs
                ),
            }

        metrics = {
            "sae_loss": jax.lax.pmean(loss, "data"),
            "sae_rec_loss": jax.lax.pmean(out["rec_loss"], "data"),
            "sae_l1_loss": jax.lax.pmean(out["l1_loss"], "data"),
            "sparsity": jax.lax.pmean(out["sparsity"], "data"),
            "perc_dead": jnp.sum(dead_acc) / dead_acc.shape[0],
        }
        return SAETrainState(new_params, opt_state, step, dead_acc, rng), metrics

    rep = P()
    # check_vma=False: pallas_call outputs don't carry vma annotations yet
    sharded = shard_map(
        shard_body, mesh=mesh,
        in_specs=(rep, P("data", None)),
        out_specs=(rep, rep),
        check_vma=False,
    )

    @jax.jit
    def step_fn(ts: SAETrainState, acts: jax.Array):
        if acts.shape[0] % n_data:
            raise ValueError(f"token count {acts.shape[0]} not divisible by data={n_data}")
        return sharded(ts, acts)

    return step_fn


def put_replicated_state(mesh: Mesh, ts: SAETrainState) -> SAETrainState:
    """Replicate the train state over every mesh device."""
    rep = NamedSharding(mesh, P())
    return SAETrainState(
        params=jax.device_put(ts.params, rep),
        opt_state=jax.device_put(ts.opt_state, rep),
        step=jax.device_put(ts.step, rep),
        dead_acc=jax.device_put(ts.dead_acc, rep),
        rng=jax.device_put(ts.rng, rep),
    )


def put_tokens_sharded(mesh: Mesh, acts, token_axis: int = 0) -> jax.Array:
    """Shard a token array over 'data' along ``token_axis``. Use token_axis=1 for
    stacked [K, T, C] microbatch sequences (the lax.scan multi-step input)."""
    spec = [None] * acts.ndim
    spec[token_axis] = "data"
    return jax.device_put(acts, NamedSharding(mesh, P(*spec)))


def put_sharded(mesh: Mesh, ts: SAETrainState, acts: jax.Array):
    """Place the train state replicated and the activations data-sharded."""
    return put_replicated_state(mesh, ts), put_tokens_sharded(mesh, acts)
