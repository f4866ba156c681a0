"""Vmapped hyperparameter sweeps: N same-shape SAEs train in ONE jitted step.

The reference parallelizes sweeps as N independent cluster jobs, each re-running
the full data + backbone pipeline for one `parameters.txt` line (README.md:13-15,
specify_parameters.py:287-293, main.py:63-113) — the backbone forward, host IO,
and dispatch overhead are paid N times. On TPU the right shape for a sweep over
*scalar* hyperparameters (lambda_sparse / learning_rate / SAE-init seed) is a
single `jax.vmap` over a stacked parameter axis: one activation stream feeds all
N combos, every [T, C] x [C, H] matmul becomes a batched [N, T, C] x [N, C, H]
contraction the MXU tiles natively, and host-dispatch cost is paid once per step
regardless of N.

Update math per combo is IDENTICAL to train/steps.make_sae_train_step_from_acts
(stock path): loss -> optimizer update -> dead-unit accumulation -> scheduled
resample. The resample/reset `lax.cond` stays OUTSIDE the vmap (all combos share
one step counter and schedule), so the full-Kaiming resample draw is only paid at
actual resample steps instead of being converted to a per-step `select` by vmap's
cond batching rule. Exact-parity with N independent runs is pinned in
tests/test_sweep_vmap.py.

Scope: combos must share every shape-/schedule-/structure-determining field
(variant, expansion factor, layer, optimizer NAME, dead_neurons_steps, batch
geometry); only SWEEPABLE_FIELDS vary. Data order follows ``base_cfg.seed`` (one
shared stream) — a combo's ``seed`` override changes its SAE init and resample
draws, not the shuffle. The fused Pallas path (``fused=True``; pallas_call's
vmap batching rule adds the combo axis as an outer grid dimension, preserving
the innermost-reduction grid rule) is the production default whenever the
kernels tile the shape: measured on the v5e at 2048-latent mixed3a scale
(bench_sweep.py, round 3c), fused-vmap runs 11.1-15.9M combo-tokens/s vs
7.4-8.3M for stock-vmap (XLA's batched matmuls underfill the MXU) and
10.3-15.1M for the best-case one-combo-at-a-time baseline — the fused sweep
is the only configuration that amortizes data/dispatch AND keeps per-token
compute at parity or better.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sparse_vision_tpu.config import RunConfig
from sparse_vision_tpu.models.sae import sae_inference_and_loss
from sparse_vision_tpu.ops import metrics, optim
from sparse_vision_tpu.ops.resample import (
    resample_dead_neurons,
    should_reset_measurement,
    should_resample,
)
from sparse_vision_tpu.train.steps import SAETrainState

# the only RunConfig fields a sweep combo may override (everything else must be
# shared so the stacked states are homogeneous)
SWEEPABLE_FIELDS = ("sae_lambda_sparse", "sae_learning_rate", "seed")


class SweepState(NamedTuple):
    """N stacked SAE train states sharing one step counter/schedule."""

    params: dict  # leaves stacked [N, ...]
    opt_state: Any  # leaves stacked [N, ...]
    step: jax.Array  # int32 scalar — shared train_batch_idx
    dead_acc: jax.Array  # bool [N, h]
    rngs: jax.Array  # [N] PRNG keys, one stream per combo


def stack_sae_states(states: Sequence[SAETrainState]) -> SweepState:
    """Stack per-combo states (same structure/shapes) along a new leading axis.

    All states must carry the same ``step`` (freshly initialized or restored from
    the same epoch) — the sweep advances one shared counter."""
    steps = {int(s.step) for s in states}
    if len(steps) != 1:
        raise ValueError(f"Sweep states disagree on train step: {sorted(steps)}")
    return SweepState(
        params=jax.tree.map(lambda *xs: jnp.stack(xs), *[s.params for s in states]),
        opt_state=jax.tree.map(
            lambda *xs: jnp.stack(xs), *[s.opt_state for s in states]
        ),
        step=states[0].step,
        dead_acc=jnp.stack([s.dead_acc for s in states]),
        rngs=jnp.stack([s.rng for s in states]),
    )


def unstack_sae_state(ss: SweepState, i: int) -> SAETrainState:
    """Combo ``i``'s state as a plain SAETrainState (checkpoint/eval compatible)."""
    return SAETrainState(
        params=jax.tree.map(lambda x: x[i], ss.params),
        opt_state=jax.tree.map(lambda x: x[i], ss.opt_state),
        step=ss.step,
        dead_acc=ss.dead_acc[i],
        rng=ss.rngs[i],
    )


def make_sae_sweep_step(
    sae_model_name: str,
    lambdas: Sequence[float],
    learning_rates: Sequence[float],
    optimizer_name: str,
    dead_neurons_steps: int,
    expansion_factor: int,
    topk: int = 32,
    topk_approx: bool = False,
    jumprelu_bandwidth: float = 1e-3,
    matryoshka_prefixes: tuple = (0.0625, 0.25, 1.0),
    fused: bool = False,
    fused_opts: Optional[dict] = None,
):
    """Build the jitted N-combo step: ``(SweepState, act [T, C]) -> (SweepState,
    metrics dict of [N] arrays)``.

    Per-combo math matches make_sae_train_step_from_acts' stock path exactly; the
    learning rate enters as a traced scalar (optax transforms are linear in their
    scale argument, and constrained_adam's renormalization closes over it), so one
    compiled program serves every combo.

    ``fused=True`` routes the per-combo loss through the Pallas fused kernels
    (large-SAE sweeps keep the fused path's HBM savings; pallas_call's vmap
    batching rule adds the combo axis as an OUTER grid dimension, so the kernels'
    innermost-reduction grid rule is preserved). Same variant support and tile
    constraints as make_sae_train_step_from_acts."""
    lambdas = jnp.asarray(list(lambdas), jnp.float32)
    lrs = jnp.asarray(list(learning_rates), jnp.float32)
    if lambdas.shape != lrs.shape:
        raise ValueError("lambdas and learning_rates must have equal length")
    can_resample = sae_model_name == "sae_mlp"

    if fused:
        # same dispatch as make_sae_train_step_from_acts' fused branches, with
        # lambda as a traced per-combo scalar
        if sae_model_name == "topk_sae":
            from sparse_vision_tpu.ops.fast_topk_sae import fast_topk_sae_loss_terms

            def fused_loss(p, act, lam):
                return fast_topk_sae_loss_terms(
                    p, act, lam, expansion_factor, topk, approx=topk_approx)
        elif sae_model_name == "gated_sae":
            from sparse_vision_tpu.ops.fused_gated_sae import fused_gated_sae_loss_terms

            def fused_loss(p, act, lam):
                return fused_gated_sae_loss_terms(
                    p, act, lam, expansion_factor, **(fused_opts or {}))
        elif sae_model_name == "jumprelu_sae":
            from sparse_vision_tpu.ops.fused_jumprelu_sae import (
                fused_jumprelu_sae_loss_terms,
            )

            def fused_loss(p, act, lam):
                return fused_jumprelu_sae_loss_terms(
                    p, act, lam, expansion_factor, **(fused_opts or {}))
        elif sae_model_name == "matryoshka_sae":
            from sparse_vision_tpu.ops.fused_matryoshka_sae import (
                fused_matryoshka_sae_loss_terms,
            )

            def fused_loss(p, act, lam):
                return fused_matryoshka_sae_loss_terms(
                    p, act, lam, expansion_factor, tuple(matryoshka_prefixes),
                    **(fused_opts or {}))
        elif sae_model_name == "sae_mlp":
            from sparse_vision_tpu.ops.fused_sae import fused_sae_loss_terms

            def fused_loss(p, act, lam):
                return fused_sae_loss_terms(
                    p, act, lam, expansion_factor, **(fused_opts or {}))
        else:
            raise ValueError(f"fused sweep path does not support {sae_model_name}")

    def combo_update(params, opt_state, dead_acc, rng, lam, lr, act):
        tx = optim.get_optimizer(optimizer_name, lr)

        def loss_fn(p):
            if fused:
                out = fused_loss(p, act, lam)
            else:
                out = sae_inference_and_loss(
                    sae_model_name, p, act, lam, topk=topk, topk_approx=topk_approx,
                    jumprelu_bandwidth=jumprelu_bandwidth,
                    matryoshka_prefixes=matryoshka_prefixes,
                )
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if fused:
            dead, sparsity = out["dead"], out["sparsity"]
        else:
            dead, sparsity, _ = metrics.measure_inactive_units(
                out["encoded"], expansion_factor
            )
        dead_acc = jnp.logical_and(dead_acc, dead)
        rng, sub = jax.random.split(rng)
        m = {
            "sae_loss": loss,
            "sae_rec_loss": out["rec_loss"],
            "sae_l1_loss": out["l1_loss"],
            "sparsity": sparsity,
            "perc_dead": jnp.sum(dead_acc) / dead_acc.shape[0],
        }
        return params, opt_state, dead_acc, rng, sub, m

    @jax.jit
    def step_fn(ss: SweepState, act: jax.Array):
        step = ss.step + 1
        params, opt_state, dead_acc, rngs, subs, m = jax.vmap(
            combo_update, in_axes=(0, 0, 0, 0, 0, 0, None)
        )(ss.params, ss.opt_state, ss.dead_acc, ss.rngs, lambdas, lrs, act)
        if can_resample:
            def do_resample(p, o, acc):
                p2, o2 = jax.vmap(resample_dead_neurons)(p, o, acc, subs)
                return p2, o2, jnp.ones_like(acc)

            def no_resample(p, o, acc):
                acc = jnp.where(
                    should_reset_measurement(step, dead_neurons_steps),
                    jnp.ones_like(acc), acc,
                )
                return p, o, acc

            params, opt_state, dead_acc = jax.lax.cond(
                should_resample(step, dead_neurons_steps),
                do_resample, no_resample, params, opt_state, dead_acc,
            )
        else:
            # rolling dead window for non-resampling variants (matches
            # train/steps.make_sae_train_step's AuxK dead-revival fix)
            dead_acc = jnp.where(
                step % dead_neurons_steps == 0, jnp.ones_like(dead_acc), dead_acc
            )
        return SweepState(params, opt_state, step, dead_acc, rngs), m

    return step_fn


def make_transcoder_sweep_step(
    lambdas: Sequence[float],
    learning_rates: Sequence[float],
    optimizer_name: str,
    dead_neurons_steps: int,
    expansion_factor: int,
):
    """Transcoder twin of make_sae_sweep_step: ``(SweepState, x [T, d_in],
    y [T, d_out]) -> (SweepState, metrics)`` — N combos share one PAIRED
    activation stream (train/transcoder.py). Transcoders resample like sae_mlp
    (d_out-aware surgery, ops/resample.py)."""
    from sparse_vision_tpu.models.sae import transcoder_inference_and_loss

    lambdas = jnp.asarray(list(lambdas), jnp.float32)
    lrs = jnp.asarray(list(learning_rates), jnp.float32)
    if lambdas.shape != lrs.shape:
        raise ValueError("lambdas and learning_rates must have equal length")

    def combo_update(params, opt_state, dead_acc, rng, lam, lr, x, y):
        tx = optim.get_optimizer(optimizer_name, lr)

        def loss_fn(p):
            out = transcoder_inference_and_loss(p, x, y, lam)
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        dead, sparsity, _ = metrics.measure_inactive_units(
            out["encoded"], expansion_factor
        )
        dead_acc = jnp.logical_and(dead_acc, dead)
        rng, sub = jax.random.split(rng)
        m = {
            "sae_loss": loss,
            "sae_rec_loss": out["rec_loss"],
            "sae_l1_loss": out["l1_loss"],
            "sparsity": sparsity,
            "perc_dead": jnp.sum(dead_acc) / dead_acc.shape[0],
        }
        return params, opt_state, dead_acc, rng, sub, m

    @jax.jit
    def step_fn(ss: SweepState, x: jax.Array, y: jax.Array):
        step = ss.step + 1
        params, opt_state, dead_acc, rngs, subs, m = jax.vmap(
            combo_update, in_axes=(0, 0, 0, 0, 0, 0, None, None)
        )(ss.params, ss.opt_state, ss.dead_acc, ss.rngs, lambdas, lrs, x, y)

        def do_resample(p, o, acc):
            p2, o2 = jax.vmap(resample_dead_neurons)(p, o, acc, subs)
            return p2, o2, jnp.ones_like(acc)

        def no_resample(p, o, acc):
            acc = jnp.where(
                should_reset_measurement(step, dead_neurons_steps),
                jnp.ones_like(acc), acc,
            )
            return p, o, acc

        params, opt_state, dead_acc = jax.lax.cond(
            should_resample(step, dead_neurons_steps),
            do_resample, no_resample, params, opt_state, dead_acc,
        )
        return SweepState(params, opt_state, step, dead_acc, rngs), m

    return step_fn


def group_sweepable(
    cfgs: Sequence[RunConfig],
) -> tuple[list[tuple[RunConfig, list[dict]]], list[RunConfig]]:
    """Partition sweep-file entries into vmappable groups and leftovers.

    Entries that differ ONLY in SWEEPABLE_FIELDS and are cached SAE-training runs
    (use_sae, training, use_activation_cache, no dump/train overlap) group into
    one ``(base_cfg, overrides)`` sweep; everything else — eval/MIS/IE modes,
    live-training runs, or singleton groups — is returned for individual
    execution. File order is preserved within and across groups."""
    import json as _json

    buckets: dict[str, list[RunConfig]] = {}
    order: list[str] = []
    for cfg in cfgs:
        d = _json.loads(cfg.to_json())
        for f in SWEEPABLE_FIELDS:
            d.pop(f, None)
        key = _json.dumps(d, sort_keys=True)
        if key not in buckets:
            buckets[key] = []
            order.append(key)
        buckets[key].append(cfg)

    from sparse_vision_tpu.utils.paths import sae_params_no_epochs

    groups: list[tuple[RunConfig, list[dict]]] = []
    singles: list[RunConfig] = []
    for key in order:
        members = buckets[key]
        base = members[0]
        # run identities exclude the seed (reference parameter-string parity,
        # utils/paths.py), so a multi-seed sweep has colliding checkpoint/results
        # identities — run those individually (they overwrite each other's
        # artifacts exactly as the reference would) instead of tripping
        # train_sae_sweep_cached's duplicate guard
        identities = [
            (c.sae_layer, tuple(sae_params_no_epochs(c).values())) for c in members
        ]
        eligible = (
            len(members) >= 2
            and len(set(identities)) == len(identities)
            and base.use_sae
            and base.training
            and base.use_activation_cache
            and not base.overlap_dump_train
            and base.mis == "0"
            and base.compute_ie == "0"
            # transcoder/crosscoder sweeps are single-device (their
            # train_*_sweep_cached versions); mesh entries run individually on
            # their TP/GSPMD paths
            and not (base.sae_model_name in ("transcoder", "crosscoder")
                     and base.mesh_shape)
            # batch_topk's inference-threshold EMA is per-run train-state the
            # vmapped sweep step doesn't thread; run those individually
            and base.sae_model_name != "batch_topk_sae"
        )
        if eligible:
            groups.append(
                (base, [{f: getattr(c, f) for f in SWEEPABLE_FIELDS} for c in members])
            )
        else:
            singles.extend(members)
    return groups, singles


def _validate_overrides(base_cfg: RunConfig, overrides: Sequence[dict]) -> None:
    if not overrides:
        raise ValueError("Need at least one sweep combo")
    for i, ov in enumerate(overrides):
        bad = set(ov) - set(SWEEPABLE_FIELDS)
        if bad:
            raise ValueError(
                f"Combo {i} overrides non-sweepable fields {sorted(bad)}; a vmapped "
                f"sweep can only vary {SWEEPABLE_FIELDS} (run differing combos as "
                f"separate pipelines / parallel.sweep_runner)"
            )
    if not (base_cfg.use_sae and base_cfg.training):
        raise ValueError("Vmapped sweeps train SAEs: need use_sae=True, training=True")
    if base_cfg.overlap_dump_train:
        raise ValueError(
            "overlap_dump_train is not supported in vmapped sweeps (the shared cache "
            "is dumped once, sequentially, before training)"
        )


def train_sae_sweep_cached(
    base_cfg: RunConfig,
    overrides: Sequence[dict],
    datasets=None,
) -> list[dict]:
    """Train one SAE per combo — ALL in one vmapped step off one activation cache.

    Each combo's run artifacts (per-epoch checkpoints, eval results rows, weight
    exports) are produced through its own Pipeline exactly as an individual
    `train_sae_cached` run would, so everything downstream (resume, ranking,
    circuit registry) is unchanged; only the train-step execution is batched.
    Returns the per-combo final eval results, in override order.

    The combos share the data stream (shuffled by ``base_cfg.seed``), the frozen
    backbone (the FIRST combo's — a ``seed`` override affects only SAE init and
    resample draws), and the activation cache.
    """
    from sparse_vision_tpu.data.activation_cache import ActivationCache, dump_activations
    from sparse_vision_tpu.train.pipeline import Pipeline
    from sparse_vision_tpu.train import checkpoint as ckpt

    if base_cfg.sae_model_name == "transcoder":
        return train_transcoder_sweep_cached(base_cfg, overrides, datasets=datasets)
    if base_cfg.sae_model_name == "crosscoder":
        return train_crosscoder_sweep_cached(base_cfg, overrides, datasets=datasets)
    if base_cfg.sae_model_name == "batch_topk_sae":
        raise ValueError(
            "batch_topk_sae is not vmap-sweepable (the inference-threshold EMA "
            "is per-run state); run combos individually"
        )
    _validate_overrides(base_cfg, overrides)
    cfgs = [
        dataclasses.replace(
            base_cfg, **{**ov, "use_activation_cache": True, "training": True}
        )
        for ov in overrides
    ]

    pipes: list[Pipeline] = []
    for cfg in cfgs:
        p = Pipeline(cfg, datasets=datasets)
        if datasets is None:
            datasets = (p.train_ds, p.val_ds, p.category_names, p.img_size)
        if pipes:
            # one backbone for the whole sweep: the cache is dumped from the first
            # combo's frozen model, so every combo must eval against that model too
            p.frozen_params = pipes[0].frozen_params
            p.net_state = pipes[0].net_state
            p._model_ckpt_epoch = pipes[0]._model_ckpt_epoch
        pipes.append(p)

    ckpt_dirs = [p._sae_ckpt_dir() for p in pipes]
    if len(set(ckpt_dirs)) != len(ckpt_dirs):
        raise ValueError("Duplicate sweep combos (identical run identities)")
    starts = {p.cfg.sae_checkpoint_epoch for p in pipes}
    if len(starts) != 1:
        raise ValueError(f"Combos disagree on sae_checkpoint_epoch: {sorted(starts)}")
    start = starts.pop()

    p0 = pipes[0]
    cache_dir = p0._cache_dir(base_cfg.sae_layer)
    if not os.path.exists(os.path.join(cache_dir, "meta.json")):
        print(f"Building activation cache at {cache_dir} ...")
        dump_activations(
            p0.net, p0.frozen_params, p0.net_state, p0.train_ds,
            base_cfg.sae_layer, cache_dir, **p0._cache_dump_kwargs(),
        )
    cache = ActivationCache(cache_dir)

    # fused Pallas path for large-SAE sweeps (single-device only: GSPMD cannot
    # partition a vmapped pallas_call over a mesh) — same gate as train_sae_cached
    tps = base_cfg.cache_tokens_per_step
    tile_t = 1024 if base_cfg.sae_model_name == "gated_sae" else 2048
    single_device = p0.mesh is None or int(
        np.prod(list(p0.mesh.shape.values()))) == 1
    from sparse_vision_tpu.models.sae import matryoshka_prefix_counts
    from sparse_vision_tpu.ops.fused_matryoshka_sae import can_fuse_matryoshka
    from sparse_vision_tpu.ops.fused_sae import can_fuse

    fused = (
        base_cfg.use_pallas
        and jax.default_backend() != "cpu"
        and single_device
        and (
            base_cfg.sae_model_name == "topk_sae"
            or (
                base_cfg.sae_model_name in ("sae_mlp", "gated_sae", "jumprelu_sae")
                and can_fuse(tps, p0.num_units, tile_t=tile_t)
            )
            or (
                base_cfg.sae_model_name == "matryoshka_sae"
                and can_fuse_matryoshka(
                    tps, p0.num_units,
                    matryoshka_prefix_counts(
                        p0.num_units, base_cfg.matryoshka_prefix_fractions),
                    tile_t=tile_t,
                )
            )
        )
    )
    fused_opts = {
        "compute_dtype": jnp.bfloat16 if base_cfg.compute_dtype == "bfloat16"
        else jnp.float32
    }
    if base_cfg.sae_model_name == "jumprelu_sae":
        fused_opts["bandwidth"] = base_cfg.jumprelu_bandwidth

    step_fn = make_sae_sweep_step(
        base_cfg.sae_model_name,
        [p.cfg.sae_lambda_sparse for p in pipes],
        [p.cfg.sae_learning_rate for p in pipes],
        base_cfg.sae_optimizer_name,
        base_cfg.dead_neurons_steps,
        base_cfg.sae_expansion_factor,
        topk=base_cfg.sae_topk,
        topk_approx=base_cfg.sae_topk_approx,
        jumprelu_bandwidth=base_cfg.jumprelu_bandwidth,
        matryoshka_prefixes=base_cfg.matryoshka_prefix_fractions,
        fused=fused,
        fused_opts=fused_opts,
    )
    if base_cfg.sae_input_norm != "none":
        # sae_input_norm="rms": one shared scale (all combos read one cache)
        _base_step = step_fn
        _inv = float(1.0 / p0.input_scale_for(base_cfg.sae_layer))

        @jax.jit
        def step_fn(ss, act):
            return _base_step(ss, act.astype(jnp.float32) * _inv)

    # one jitted multi-step dispatch per scan block; the wrapper is carry-type
    # agnostic, so the SweepState rides the same scan/donate machinery as a
    # single run (train/steps.make_sae_train_multi_step)
    from sparse_vision_tpu.train.steps import make_sae_train_multi_step

    multi_fn = make_sae_train_multi_step(step_fn)
    ss = stack_sae_states([p.ts for p in pipes])

    # multi-chip: tokens shard over the mesh 'data' axis via GSPMD (the stacked
    # states replicate — each combo's update needs the full token block anyway);
    # a 'model' axis cannot compose with the vmapped latent layout
    mesh = p0.mesh
    if mesh is not None and int(dict(mesh.shape).get("model", 1)) > 1:
        raise ValueError(
            "Vmapped sweeps do not compose with tensor parallelism "
            f"(mesh_shape={base_cfg.mesh_shape}); run TP combos individually"
        )
    if mesh is not None and int(dict(mesh.shape).get("data", 1)) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ss = jax.device_put(ss, NamedSharding(mesh, P()))
        _stack_sh = NamedSharding(mesh, P(None, "data", None))
        _tok_sh = NamedSharding(mesh, P("data", None))

        def _put_stack(arr):
            return jax.device_put(np.ascontiguousarray(arr), _stack_sh)

        def _put_tok(arr):
            return jax.device_put(np.ascontiguousarray(arr), _tok_sh)
    else:
        def _put_stack(arr):
            return jnp.asarray(np.asarray(arr))

        def _put_tok(arr):
            return jnp.asarray(arr)

    def scatter_states():
        for i, p in enumerate(pipes):
            p.ts = unstack_sae_state(ss, i)

    def log_all(step: int, metrics, last: bool):
        # one host transfer per metric per DISPATCH (not per combo): every
        # combo's logger/W&B run then receives its own row, matching what the
        # individual runs would log
        host = {k: np.asarray(v[-1] if last else v) for k, v in metrics.items()}
        for i, p in enumerate(pipes):
            p.logger.log_train(step, {k: float(host[k][i]) for k in host})

    scan_k = p0.CACHE_SCAN_K
    if mesh is not None and tps % int(dict(mesh.shape).get("data", 1)):
        raise ValueError(
            f"cache_tokens_per_step={tps} not divisible by data mesh axis "
            f"{dict(mesh.shape).get('data', 1)}"
        )
    last_evals: list[Optional[dict]] = [None] * len(pipes)
    scatter_states()
    for p in pipes:  # pre-training eval (deploy_model:1315-1320)
        p.eval_modified(epoch=start, store=False)
    for epoch in range(start, base_cfg.sae_epochs):
        for stack_arr in cache.stacks(
            tps, scan_k, shuffle=True, seed=base_cfg.seed + epoch
        ):
            if stack_arr.shape[0] == scan_k:
                ss, ms = multi_fn(ss, _put_stack(stack_arr))
                log_all(int(ss.step), ms, last=True)
            else:  # tail (< scan_k steps) runs single-step
                for tok in stack_arr:
                    ss, m = step_fn(ss, _put_tok(tok))
                    log_all(int(ss.step), m, last=False)
        scatter_states()
        for i, p in enumerate(pipes):
            ckpt.save_checkpoint(
                ckpt_dirs[i], epoch + 1,
                {
                    "params": p.ts.params,
                    "opt_state": p.ts.opt_state,
                    "step": p.ts.step,
                    "dead_acc": p.ts.dead_acc,
                },
                blocking=False,
            )
            last_evals[i] = p.eval_modified(
                epoch=epoch + 1, final=(epoch + 1 == base_cfg.sae_epochs)
            )
    ckpt.wait_for_saves()
    for p in pipes:
        p._export_sae_weights()
    return last_evals


def train_transcoder_sweep_cached(
    base_cfg: RunConfig,
    overrides: Sequence[dict],
    datasets=None,
) -> list[dict]:
    """Vmapped transcoder sweep: N (lambda, lr, seed) combos of one
    sae_layer -> transcoder_target_layer dictionary train in ONE step off the
    shared PAIRED caches (train/transcoder.py dumps both layers in one backbone
    pass). Artifacts per combo match individual runs; single-device in this
    version (transcoder mesh paths run individually)."""
    import os as _os

    from sparse_vision_tpu.data.activation_cache import (
        ActivationCache,
        dump_activations_multi,
    )
    from sparse_vision_tpu.train import checkpoint as ckpt
    from sparse_vision_tpu.train.pipeline import Pipeline
    from sparse_vision_tpu.train.transcoder import make_transcoder_multi_step

    _validate_overrides(base_cfg, overrides)
    if not base_cfg.transcoder_target_layer:
        raise ValueError("transcoder sweeps need transcoder_target_layer set")
    if base_cfg.mesh_shape:
        raise ValueError(
            "transcoder sweeps are single-device; drop mesh_shape (mesh "
            "transcoder runs execute individually)"
        )
    cfgs = [
        dataclasses.replace(
            base_cfg, **{**ov, "use_activation_cache": True, "training": True}
        )
        for ov in overrides
    ]

    pipes: list = []
    for cfg in cfgs:
        p = Pipeline(cfg, datasets=datasets)
        if datasets is None:
            datasets = (p.train_ds, p.val_ds, p.category_names, p.img_size)
        if pipes:
            p.frozen_params = pipes[0].frozen_params
            p.net_state = pipes[0].net_state
            p._model_ckpt_epoch = pipes[0]._model_ckpt_epoch
        pipes.append(p)

    ckpt_dirs = [p._sae_ckpt_dir() for p in pipes]
    if len(set(ckpt_dirs)) != len(ckpt_dirs):
        raise ValueError("Duplicate sweep combos (identical run identities)")
    starts = {p.cfg.sae_checkpoint_epoch for p in pipes}
    if len(starts) != 1:
        raise ValueError(f"Combos disagree on sae_checkpoint_epoch: {sorted(starts)}")
    start = starts.pop()

    p0 = pipes[0]
    tgt = base_cfg.transcoder_target_layer
    dirs = {layer: p0._cache_dir(layer) for layer in (base_cfg.sae_layer, tgt)}
    missing = [l for l, d in dirs.items()
               if not _os.path.exists(_os.path.join(d, "meta.json"))]
    if missing:
        print(f"Building paired activation caches for {missing} in one pass ...")
        dump_activations_multi(
            p0.net, p0.frozen_params, p0.net_state, p0.train_ds,
            missing, dirs, **p0._cache_dump_kwargs(),
        )
    cache_in = ActivationCache(dirs[base_cfg.sae_layer])
    cache_tgt = ActivationCache(dirs[tgt])
    for field in ("total_tokens", "shard_tokens", "num_shards"):
        if cache_in.meta[field] != cache_tgt.meta[field]:
            raise ValueError(
                f"Cache {field} differs between {base_cfg.sae_layer} and {tgt} — "
                "both caches must come from the same dump geometry"
            )

    step_fn = make_transcoder_sweep_step(
        [p.cfg.sae_lambda_sparse for p in pipes],
        [p.cfg.sae_learning_rate for p in pipes],
        base_cfg.sae_optimizer_name,
        base_cfg.dead_neurons_steps,
        base_cfg.sae_expansion_factor,
    )
    if base_cfg.sae_input_norm != "none":
        _base_step = step_fn
        _inv_in = float(1.0 / p0.input_scale_for(base_cfg.sae_layer))
        _inv_tgt = float(1.0 / p0.input_scale_for(tgt))

        @jax.jit
        def step_fn(ss, x, y):
            return _base_step(ss, x.astype(jnp.float32) * _inv_in,
                              y.astype(jnp.float32) * _inv_tgt)

    multi_fn = make_transcoder_multi_step(step_fn)
    ss = stack_sae_states([p.ts for p in pipes])

    def scatter_states():
        for i, p in enumerate(pipes):
            p.ts = unstack_sae_state(ss, i)

    def log_all(step: int, metrics, last: bool):
        host = {k: np.asarray(v[-1] if last else v) for k, v in metrics.items()}
        for i, p in enumerate(pipes):
            p.logger.log_train(step, {k: float(host[k][i]) for k in host})

    scan_k = p0.CACHE_SCAN_K
    tps = base_cfg.cache_tokens_per_step
    last_evals: list = [None] * len(pipes)
    scatter_states()
    for p in pipes:
        p.eval_modified(epoch=start, store=False)
    for epoch in range(start, base_cfg.sae_epochs):
        it_in = cache_in.stacks(tps, scan_k, shuffle=True, seed=base_cfg.seed + epoch)
        it_tgt = cache_tgt.stacks(tps, scan_k, shuffle=True, seed=base_cfg.seed + epoch)
        for x_stack, y_stack in zip(it_in, it_tgt):
            if x_stack.shape[0] == scan_k:
                ss, ms = multi_fn(
                    ss, jnp.asarray(np.asarray(x_stack)),
                    jnp.asarray(np.asarray(y_stack)),
                )
                log_all(int(ss.step), ms, last=True)
            else:
                for x_tok, y_tok in zip(x_stack, y_stack):
                    ss, m = step_fn(ss, jnp.asarray(x_tok), jnp.asarray(y_tok))
                    log_all(int(ss.step), m, last=False)
        scatter_states()
        for i, p in enumerate(pipes):
            ckpt.save_checkpoint(
                ckpt_dirs[i], epoch + 1,
                {
                    "params": p.ts.params,
                    "opt_state": p.ts.opt_state,
                    "step": p.ts.step,
                    "dead_acc": p.ts.dead_acc,
                },
                blocking=False,
            )
            last_evals[i] = p.eval_modified(
                epoch=epoch + 1, final=(epoch + 1 == base_cfg.sae_epochs)
            )
    ckpt.wait_for_saves()
    for p in pipes:
        p._export_sae_weights()
    return last_evals


def make_crosscoder_sweep_step(
    lambdas: Sequence[float],
    learning_rates: Sequence[float],
    optimizer_name: str,
    dead_neurons_steps: int,
    expansion_factor: int,
):
    """Crosscoder twin of make_sae_sweep_step: ``(SweepState, xs: tuple of
    [T, d_l]) -> (SweepState, metrics)`` — N combos share ONE tuple of aligned
    activation streams (train/crosscoder.py). Resampling is the multi-layer
    surgery (resample_dead_neurons_crosscoder), vmapped per combo outside the
    per-step cond like every sweep step here."""
    from sparse_vision_tpu.models.crosscoder import crosscoder_inference_and_loss
    from sparse_vision_tpu.ops.resample import resample_dead_neurons_crosscoder

    lambdas = jnp.asarray(list(lambdas), jnp.float32)
    lrs = jnp.asarray(list(learning_rates), jnp.float32)
    if lambdas.shape != lrs.shape:
        raise ValueError("lambdas and learning_rates must have equal length")
    if optimizer_name == "constrained_adam":
        raise ValueError(
            "crosscoders need a plain optimizer (train/crosscoder.py): "
            "ConstrainedAdam would erase the decoder-norm diffing signal"
        )

    def combo_update(params, opt_state, dead_acc, rng, lam, lr, xs):
        tx = optim.get_optimizer(optimizer_name, lr)

        def loss_fn(p):
            out = crosscoder_inference_and_loss(p, xs, lam)
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        dead, sparsity, _ = metrics.measure_inactive_units(
            out["encoded"], expansion_factor
        )
        dead_acc = jnp.logical_and(dead_acc, dead)
        rng, sub = jax.random.split(rng)
        m = {
            "sae_loss": loss,
            "sae_rec_loss": out["rec_loss"],
            "sae_l1_loss": out["l1_loss"],
            "sparsity": sparsity,
            "perc_dead": jnp.sum(dead_acc) / dead_acc.shape[0],
        }
        return params, opt_state, dead_acc, rng, sub, m

    @jax.jit
    def step_fn(ss: SweepState, xs: tuple):
        step = ss.step + 1
        params, opt_state, dead_acc, rngs, subs, m = jax.vmap(
            combo_update, in_axes=(0, 0, 0, 0, 0, 0, None)
        )(ss.params, ss.opt_state, ss.dead_acc, ss.rngs, lambdas, lrs, xs)

        def do_resample(p, o, acc):
            p2, o2 = jax.vmap(resample_dead_neurons_crosscoder)(p, o, acc, subs)
            return p2, o2, jnp.ones_like(acc)

        def no_resample(p, o, acc):
            acc = jnp.where(
                should_reset_measurement(step, dead_neurons_steps),
                jnp.ones_like(acc), acc,
            )
            return p, o, acc

        params, opt_state, dead_acc = jax.lax.cond(
            should_resample(step, dead_neurons_steps),
            do_resample, no_resample, params, opt_state, dead_acc,
        )
        return SweepState(params, opt_state, step, dead_acc, rngs), m

    return step_fn


def train_crosscoder_sweep_cached(
    base_cfg: RunConfig,
    overrides: Sequence[dict],
    datasets=None,
) -> list[dict]:
    """Vmapped crosscoder sweep: N (lambda, lr, seed) combos of one L-layer
    crosscoder train in ONE step off the shared ALIGNED caches
    (train/crosscoder.py dumps all layers in one backbone pass). Artifacts per
    combo match individual runs, including the per-combo decoder-norm diffing
    CSV; single-device in this version (mesh crosscoder runs execute
    individually)."""
    from sparse_vision_tpu.train import checkpoint as ckpt
    from sparse_vision_tpu.train.crosscoder import (
        make_crosscoder_multi_step,
        save_decoder_norms,
    )
    from sparse_vision_tpu.train.paired_caches import prepare_caches
    from sparse_vision_tpu.train.pipeline import Pipeline
    from sparse_vision_tpu.utils.paths import sae_params_no_epochs

    _validate_overrides(base_cfg, overrides)
    if base_cfg.mesh_shape:
        raise ValueError(
            "crosscoder sweeps are single-device; drop mesh_shape (mesh "
            "crosscoder runs execute individually)"
        )
    cfgs = [
        dataclasses.replace(
            base_cfg, **{**ov, "use_activation_cache": True, "training": True}
        )
        for ov in overrides
    ]

    pipes: list = []
    for cfg in cfgs:
        p = Pipeline(cfg, datasets=datasets)
        if datasets is None:
            datasets = (p.train_ds, p.val_ds, p.category_names, p.img_size)
        if pipes:
            p.frozen_params = pipes[0].frozen_params
            p.net_state = pipes[0].net_state
            p._model_ckpt_epoch = pipes[0]._model_ckpt_epoch
        pipes.append(p)

    ckpt_dirs = [p._sae_ckpt_dir() for p in pipes]
    if len(set(ckpt_dirs)) != len(ckpt_dirs):
        raise ValueError("Duplicate sweep combos (identical run identities)")
    starts = {p.cfg.sae_checkpoint_epoch for p in pipes}
    if len(starts) != 1:
        raise ValueError(f"Combos disagree on sae_checkpoint_epoch: {sorted(starts)}")
    start = starts.pop()

    p0 = pipes[0]
    layers = p0.crosscoder_all_layers
    dirs = {layer: p0._cache_dir(layer) for layer in layers}
    # always the sequential branch: _validate_overrides rejects overlap_dump_train
    _, _, caches = prepare_caches(p0, layers, dirs)

    step_fn = make_crosscoder_sweep_step(
        [p.cfg.sae_lambda_sparse for p in pipes],
        [p.cfg.sae_learning_rate for p in pipes],
        base_cfg.sae_optimizer_name,
        base_cfg.dead_neurons_steps,
        base_cfg.sae_expansion_factor,
    )
    if base_cfg.sae_input_norm != "none":
        _base_step = step_fn
        _invs = tuple(float(1.0 / p0.input_scale_for(l)) for l in layers)

        @jax.jit
        def step_fn(ss, xs):
            return _base_step(ss, tuple(
                x.astype(jnp.float32) * i for x, i in zip(xs, _invs)))

    multi_fn = make_crosscoder_multi_step(step_fn)
    ss = stack_sae_states([p.ts for p in pipes])

    def scatter_states():
        for i, p in enumerate(pipes):
            p.ts = unstack_sae_state(ss, i)

    def log_all(step: int, metrics_, last: bool):
        host = {k: np.asarray(v[-1] if last else v) for k, v in metrics_.items()}
        for i, p in enumerate(pipes):
            p.logger.log_train(step, {k: float(host[k][i]) for k in host})

    scan_k = p0.CACHE_SCAN_K
    tps = base_cfg.cache_tokens_per_step
    last_evals: list = [None] * len(pipes)
    scatter_states()
    for p in pipes:
        p.eval_modified(epoch=start, store=False)
    for epoch in range(start, base_cfg.sae_epochs):
        its = [c.stacks(tps, scan_k, shuffle=True, seed=base_cfg.seed + epoch)
               for c in caches]
        for stacks in zip(*its):
            if stacks[0].shape[0] == scan_k:
                ss, ms = multi_fn(
                    ss, tuple(jnp.asarray(np.asarray(s)) for s in stacks)
                )
                log_all(int(ss.step), ms, last=True)
            else:
                for toks in zip(*stacks):
                    ss, m = step_fn(ss, tuple(jnp.asarray(t) for t in toks))
                    log_all(int(ss.step), m, last=False)
        scatter_states()
        for i, p in enumerate(pipes):
            ckpt.save_checkpoint(
                ckpt_dirs[i], epoch + 1,
                {
                    "params": p.ts.params,
                    "opt_state": p.ts.opt_state,
                    "step": p.ts.step,
                    "dead_acc": p.ts.dead_acc,
                },
                blocking=False,
            )
            last_evals[i] = p.eval_modified(
                epoch=epoch + 1, final=(epoch + 1 == base_cfg.sae_epochs)
            )
    ckpt.wait_for_saves()
    for p in pipes:
        p._export_sae_weights()
        name = f"{p.cfg.sae_layer}_" + "_".join(
            str(v) for v in sae_params_no_epochs(p.cfg).values()
        )
        save_decoder_norms(
            jax.device_get(p.ts.params), layers, p.paths["sae_weights"], name
        )
    return last_evals
