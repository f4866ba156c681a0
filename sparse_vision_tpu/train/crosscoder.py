"""Crosscoder training: one shared sparse code over L layers' activations
(beyond-reference variant; Lindsey et al. 2024 — see models/crosscoder.py for
the math and the decoder-norm diffing readout).

TPU-native fit: `dump_activations_multi` taps ALL L layers from one backbone
pass into aligned token caches (identical shard geometry and token order), so
training zips L cache iterators at memory bandwidth — the same paired-cache
machinery as train/transcoder.py, generalized from 2 to L streams. The step's
L encoder + L decoder matmuls are independent MXU contractions XLA fuses; the
data-only mesh path is GSPMD placement of the unchanged jitted step (tokens
shard over 'data', params replicated).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sparse_vision_tpu.models.crosscoder import (
    crosscoder_decoder_norms,
    crosscoder_inference_and_loss,
)
from sparse_vision_tpu.ops import metrics
from sparse_vision_tpu.ops.resample import (
    resample_dead_neurons_crosscoder,
    should_reset_measurement,
    should_resample,
)
from sparse_vision_tpu.train.steps import SAETrainState


def make_crosscoder_train_step_from_acts(
    lambda_sparse: float,
    tx: optax.GradientTransformation,
    dead_neurons_steps: int,
    expansion_factor: int,
    fused: bool = False,
    fused_opts: Optional[dict] = None,
):
    """Jitted crosscoder step over pre-extracted aligned token batches:
    ``(ts, xs: tuple of [T, d_l]) -> (ts, metrics)``. Same update skeleton as
    make_sae_train_step_from_acts; resampling uses the multi-layer surgery
    (ops/resample.resample_dead_neurons_crosscoder).

    ``fused=True`` routes forward+loss+stats through the cat-space Pallas
    kernels in ops/fused_crosscoder.py — the production path at circuit shapes
    (parity: tests/test_fused_crosscoder.py)."""
    if fused:
        from sparse_vision_tpu.ops.fused_crosscoder import (
            fused_crosscoder_loss_terms,
        )

        def loss_fn(params, xs):
            out = fused_crosscoder_loss_terms(
                params, xs, lambda_sparse, expansion_factor,
                **(fused_opts or {}),
            )
            return out["loss"], out
    else:
        def loss_fn(params, xs):
            out = crosscoder_inference_and_loss(params, xs, lambda_sparse)
            return out["loss"], out

    @jax.jit
    def step_fn(ts: SAETrainState, xs: tuple):
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params, xs
        )
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        step = ts.step + 1
        if fused:
            dead, sparsity = out["dead"], out["sparsity"]
        else:
            dead, sparsity, _ = metrics.measure_inactive_units(
                out["encoded"], expansion_factor
            )
        dead_acc = jnp.logical_and(ts.dead_acc, dead)
        rng, sub = jax.random.split(ts.rng)

        def do_resample(p, o, acc):
            p2, o2 = resample_dead_neurons_crosscoder(p, o, acc, sub)
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
        m = {
            "sae_loss": loss,
            "sae_rec_loss": out["rec_loss"],
            "sae_l1_loss": out["l1_loss"],
            "sparsity": sparsity,
            "perc_dead": jnp.sum(dead_acc) / dead_acc.shape[0],
        }
        return SAETrainState(new_params, opt_state, step, dead_acc, rng), m

    return step_fn


def make_tp_crosscoder_train_step(
    mesh,
    ts_placed: SAETrainState,
    lambda_sparse: float,
    tx: optax.GradientTransformation,
    dead_neurons_steps: int,
    expansion_factor: int,
    fused_opts: Optional[dict] = None,
):
    """Tensor-parallel fused crosscoder step: ``step(ts, xs)`` with the latent
    dim sharded over 'model', tokens over 'data', the fused cat-space kernels
    per chip (ops/fused_crosscoder.make_fused_crosscoder_tp_op), and the
    TP-aware multi-layer resample (resample_dead_neurons_crosscoder_tp).
    Mirrors train/transcoder.make_tp_transcoder_train_step."""
    from jax.sharding import PartitionSpec as P

    from sparse_vision_tpu.ops.fused_crosscoder import (
        fused_crosscoder_tp_loss_terms,
    )
    from sparse_vision_tpu.ops.resample import (
        resample_dead_neurons_crosscoder_tp,
    )
    from sparse_vision_tpu.parallel.sharded_steps import shard_map

    n_data = int(mesh.shape["data"])
    n_model = int(mesh.shape["model"])
    opts = dict(fused_opts or {})

    def local_loss(params, xs):
        out = fused_crosscoder_tp_loss_terms(
            params, xs, lambda_sparse, expansion_factor, n_data, n_model,
            **opts,
        )
        return out["loss"], out

    def shard_body(ts: SAETrainState, *xs_local):
        (loss, out), grads = jax.value_and_grad(local_loss, has_aux=True)(
            ts.params, tuple(xs_local)
        )
        # grads are already GLOBAL (psums live inside the op's custom_vjp)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        step = ts.step + 1
        dead_acc = jnp.logical_and(ts.dead_acc, out["dead"])
        rng, sub = jax.random.split(ts.rng)

        def do_resample(p, o, acc):
            p2, o2 = resample_dead_neurons_crosscoder_tp(p, o, acc, sub, n_model)
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
        m = {
            "sae_loss": loss,
            "sae_rec_loss": out["rec_loss"],
            "sae_l1_loss": out["l1_loss"],
            "sparsity": out["sparsity"],
            "perc_dead": jax.lax.psum(jnp.sum(dead_acc), "model") / h_g,
        }
        return SAETrainState(new_params, opt_state, step, dead_acc, rng), m

    state_specs = jax.tree.map(lambda x: x.sharding.spec, ts_placed)
    n_streams = sum(1 for k in ts_placed.params if k.startswith("W_enc_"))
    sharded = shard_map(
        shard_body, mesh=mesh,
        in_specs=(state_specs,) + (P("data", None),) * n_streams,
        out_specs=(state_specs, P()),
        check_vma=False,
    )

    @jax.jit
    def step_fn(ts: SAETrainState, xs: tuple):
        if xs[0].shape[0] % n_data:
            raise ValueError(
                f"token count {xs[0].shape[0]} not divisible by data={n_data}"
            )
        return sharded(ts, *xs)

    return step_fn


def make_crosscoder_multi_step(step_fn):
    """One jitted dispatch over a tuple of [K, T, d_l] stacks (lax.scan; the
    train state is DONATED, as in make_sae_train_multi_step)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(ts: SAETrainState, stacks: tuple):
        def body(ts, xs):
            return step_fn(ts, xs)

        return jax.lax.scan(body, ts, stacks)

    return multi


def make_crosscoder_eval_step(
    net,
    layers: tuple,
    lambda_sparse: float,
    expansion_factor: int,
    criterion,
    last_stage: Optional[str] = None,
    input_scales: Optional[tuple] = None,
):
    """Eval step for the crosscoder-spliced model, shaped exactly like
    make_sae_eval_step's output so Pipeline.eval_modified consumes it unchanged.

    Splice semantics (the "acausal" readout of Lindsey et al. 2024): the code is
    computed from the ORIGINAL activations of all L layers, and the DEEPEST
    layer's activation is replaced by its reconstruction — logits_mod =
    backbone -> taps(layers) -> crosscoder -> decoded[-1] ->
    apply_segment(after=layers[-1]). ``layers`` must be in network depth order
    (validated by train_crosscoder_cached). ``var_expl`` reports the deepest
    layer (the spliced quantity); rec/nrmse follow the loss convention
    (models/crosscoder.crosscoder_loss_terms).

    ``input_scales`` (sae_input_norm="rms"): per-layer ``token_rms`` values in
    ``layers`` order — required for the crosscoder at heterogeneous layer
    scales (config.py: mixed4a..4e tap RMS spans ~100x; unnormalized, the
    summed MSE is dominated by the largest-scale layer and one lambda cannot
    fit all). The splice rescales the deepest reconstruction back to raw."""
    last = last_stage or net.stage_names[-1]
    deepest = layers[-1]
    invs = (None if input_scales is None
            else tuple(float(1.0 / s) for s in input_scales))

    @jax.jit
    def step_fn(params: dict, frozen_params: dict, frozen_state: dict,
                images: jax.Array, labels: jax.Array):
        logits_orig, taps, _ = net.apply(frozen_params, images, state=frozen_state)
        acts = tuple(taps[l] for l in layers)
        if invs is not None:
            acts = tuple(a * i for a, i in zip(acts, invs))
        out = crosscoder_inference_and_loss(params, acts, lambda_sparse)
        deep_raw = (out["decoded"][-1] if invs is None
                    else out["decoded"][-1] * float(input_scales[-1]))
        logits_mod = net.apply_segment(
            frozen_params, deep_raw, after=deepest, upto=last,
            state=frozen_state,
        )
        loss_mod = criterion(logits_mod, labels)
        loss_orig = criterion(logits_orig, labels)
        dead, sparsity, freq = metrics.measure_inactive_units(
            out["encoded"], expansion_factor
        )
        batch_metrics = {
            "model_loss": loss_mod,
            "loss_diff": loss_mod - loss_orig,
            "accuracy": metrics.accuracy(logits_mod, labels),
            "kld": metrics.kld_original_vs_modified(logits_orig, logits_mod),
            "perc_same": metrics.perc_same_classification(logits_orig, logits_mod),
            "sae_loss": out["loss"],
            "sae_rec_loss": out["rec_loss"],
            "sae_l1_loss": out["l1_loss"],
            "sae_nrmse_loss": out["nrmse_loss"],
            "sae_rmse_loss": out["rmse_loss"],
            "sae_aux_loss": out["aux_loss"],
            "sparsity": sparsity,
            # variance explained of the SPLICED (deepest) layer's activation
            # (on the same basis the crosscoder reconstructs — acts are
            # normalized under sae_input_norm="rms"; var_expl is scale-free)
            "var_expl": metrics.variance_explained(
                acts[-1], out["decoded"][-1]
            ),
        }
        arrays = {
            "dead": dead,
            "freq": freq,
            "topk_acts": metrics.spatial_mean(out["encoded_pre"]),
            "probe_acts": metrics.spatial_mean(out["encoded"]),
            "correct": jnp.sum(
                (jnp.argmax(logits_mod, axis=1) == labels).astype(jnp.int32)
            ),
        }
        return batch_metrics, arrays

    return step_fn


def save_decoder_norms(params: dict, layers: tuple, folder: str,
                       name: str) -> str:
    """Persist the model-diffing readout: per-layer per-latent decoder norms
    as ``<name>_decoder_norms.csv`` (rows = latents, one column per layer plus
    a ``share_<layer>`` fraction column) — the crosscoder's headline artifact
    (Lindsey et al. 2024 §"Model Diffing": shared vs layer-specific features
    read off exactly this matrix)."""
    import pandas as pd

    norms = np.asarray(crosscoder_decoder_norms(params))  # [L, h]
    total = np.maximum(norms.sum(axis=0), 1e-12)
    data = {"unit": np.arange(norms.shape[1])}
    for i, layer in enumerate(layers):
        data[f"norm_{layer}"] = norms[i]
    for i, layer in enumerate(layers):
        data[f"share_{layer}"] = norms[i] / total
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, f"{name}_decoder_norms.csv")
    pd.DataFrame(data).to_csv(path, index=False)
    return path


def train_crosscoder_cached(pipe) -> Optional[dict]:
    """Cached crosscoder training through a Pipeline: dump ALL L layers' caches
    from one backbone pass, then train on zipped token stacks. Per-epoch
    checkpoints, evals, results rows, and weight exports ride the Pipeline's
    standard machinery; the decoder-norm diffing CSV is written next to the
    exported weights."""
    from sparse_vision_tpu.train import checkpoint as ckpt
    from sparse_vision_tpu.train.paired_caches import epoch_stacks, prepare_caches
    from sparse_vision_tpu.utils.profiling import maybe_profile

    cfg = pipe.cfg
    layers = pipe.crosscoder_all_layers
    if not cfg.use_activation_cache:
        raise ValueError("crosscoder training requires use_activation_cache=True "
                         "(aligned multi-layer caches from one backbone pass)")
    if cfg.sae_optimizer_name == "constrained_adam":
        raise ValueError(
            "crosscoders need a plain optimizer (sae_optimizer_name='adam'): "
            "ConstrainedAdam's unit-norm decoder invariant erases the per-layer "
            "decoder-norm signal the variant exists to measure "
            "(models/crosscoder.py)"
        )
    # int8 caches work through the host-dequant default of ActivationCache.stacks

    from sparse_vision_tpu.ops.fused_crosscoder import can_fuse

    # ALL pure-config validation runs BEFORE prepare_caches: in overlap mode
    # prepare_caches launches the dump on a background thread, and raising with
    # a device-active daemon thread risks the documented tunnel wedge (CLAUDE.md)
    # plus a meta-less partial cache directory
    mesh = pipe.mesh
    n_data = int(mesh.shape["data"]) if mesh is not None else 1
    tensor_parallel = (
        mesh is not None and "model" in mesh.axis_names
        and int(mesh.shape["model"]) > 1
    )
    tps = cfg.cache_tokens_per_step
    if mesh is not None and tps % n_data:
        raise ValueError(
            f"cache_tokens_per_step={tps} not divisible by data mesh axis {n_data}"
        )
    if tensor_parallel:
        n_model = int(mesh.shape["model"])
        if pipe.num_units % n_model or not can_fuse(
            tps // n_data, pipe.num_units // n_model, tile_t=2048
        ):
            raise ValueError(
                f"TP crosscoder needs latents ({pipe.num_units}) divisible by "
                f"the model axis ({n_model}) and tile-compatible local shards"
            )

    dirs = {layer: pipe._cache_dir(layer) for layer in layers}
    stream_qs, dump_thread, caches = prepare_caches(pipe, layers, dirs)

    fused_opts = {
        "compute_dtype": jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
        else jnp.float32
    }
    if tensor_parallel:
        # latent dim shards over 'model': fused TP cat-space kernels on local
        # shards (tiling validated above; stock GSPMD cannot place the
        # weighted-L1 norm graph + L-layer decode correctly)
        from sparse_vision_tpu.parallel.tensor_parallel import (
            put_tokens_tp,
            put_tp_state,
        )

        n_model = int(mesh.shape["model"])
        interp = jax.devices()[0].platform == "cpu"
        if interp:
            fused_opts.update(interpret=True, compute_dtype=jnp.float32)
        pipe.ts = put_tp_state(mesh, pipe.ts)
        step_fn = make_tp_crosscoder_train_step(
            mesh, pipe.ts, cfg.sae_lambda_sparse, pipe.tx,
            cfg.dead_neurons_steps, cfg.sae_expansion_factor,
            fused_opts=fused_opts,
        )

        def _put(xs, token_axis):
            return tuple(
                put_tokens_tp(mesh, np.ascontiguousarray(x), token_axis)
                for x in xs
            )
    else:
        if mesh is not None and n_data > 1:
            from sparse_vision_tpu.parallel.sharded_steps import (
                put_replicated_state,
                put_tokens_sharded,
            )

            pipe.ts = put_replicated_state(mesh, pipe.ts)

            def _put(xs, token_axis):
                return tuple(
                    put_tokens_sharded(mesh, np.ascontiguousarray(x), token_axis)
                    for x in xs
                )
        else:
            def _put(xs, token_axis):
                return tuple(jnp.asarray(x) for x in xs)

        fused = (
            cfg.use_pallas
            and jax.default_backend() != "cpu"
            and (mesh is None or n_data == 1)
            and can_fuse(tps, pipe.num_units, tile_t=2048)
        )
        step_fn = make_crosscoder_train_step_from_acts(
            cfg.sae_lambda_sparse, pipe.tx, cfg.dead_neurons_steps,
            cfg.sae_expansion_factor, fused=fused, fused_opts=fused_opts,
        )
    if cfg.sae_input_norm != "none":
        # sae_input_norm="rms": per-layer token-RMS normalization — REQUIRED
        # at heterogeneous layer scales (train/crosscoder.make_crosscoder_
        # eval_step docstring; Pipeline.input_scale_for)
        _base_step = step_fn
        _invs = tuple(float(1.0 / pipe.input_scale_for(l)) for l in layers)

        @jax.jit
        def step_fn(ts, xs):
            return _base_step(ts, tuple(
                x.astype(jnp.float32) * i for x, i in zip(xs, _invs)))

    multi_fn = make_crosscoder_multi_step(step_fn)
    scan_k = pipe.CACHE_SCAN_K
    start = cfg.sae_checkpoint_epoch
    last_eval = None
    pipe.eval_modified(epoch=start, store=False)
    for epoch in range(start, cfg.sae_epochs):
        # aligned L-tuple iterator: streamed from the overlapped dump on the
        # first epoch, zipped shuffled readers afterwards (train/paired_caches.py)
        stacks_it, caches = epoch_stacks(
            pipe, layers, dirs, epoch, start, stream_qs, dump_thread, caches
        )
        with maybe_profile(cfg.profile_dir or None):
            for stacks in stacks_it:
                k0 = stacks[0].shape[0]
                assert all(s.shape[0] == k0 for s in stacks)
                if k0 == scan_k:
                    xs = _put(tuple(np.asarray(s) for s in stacks), 1)
                    pipe.ts, ms = multi_fn(pipe.ts, xs)
                    pipe.logger.log_train(
                        int(pipe.ts.step), {k: v[-1] for k, v in ms.items()}
                    )
                else:  # tail (< scan_k steps) runs single-step
                    for toks in zip(*stacks):
                        xt = _put(tuple(np.asarray(t) for t in toks), 0)
                        pipe.ts, m = step_fn(pipe.ts, xt)
                        pipe.logger.log_train(int(pipe.ts.step), m)
        ckpt.save_checkpoint(
            pipe._sae_ckpt_dir(), epoch + 1,
            {
                "params": pipe.ts.params,
                "opt_state": pipe.ts.opt_state,
                "step": pipe.ts.step,
                "dead_acc": pipe.ts.dead_acc,
            },
            blocking=False,
        )
        last_eval = pipe.eval_modified(
            epoch=epoch + 1, final=(epoch + 1 == cfg.sae_epochs)
        )
    ckpt.wait_for_saves()
    pipe._export_sae_weights()
    if cfg.sae_e2e_finetune_epochs > 0:
        from sparse_vision_tpu.train.e2e_finetune import e2e_finetune

        # runs BEFORE the decoder-norm save so the diffing CSV reads the
        # finetuned params (the finetune re-exports the weights itself)
        last_eval = e2e_finetune(pipe) or last_eval
    from sparse_vision_tpu.utils.paths import sae_params_no_epochs

    name = f"{cfg.sae_layer}_" + "_".join(
        str(v) for v in sae_params_no_epochs(cfg).values()
    )
    norms_path = save_decoder_norms(
        jax.device_get(pipe.ts.params), layers, pipe.paths["sae_weights"], name
    )
    print(f"Saved crosscoder decoder-norm diffing CSV to {norms_path}")
    return last_eval
