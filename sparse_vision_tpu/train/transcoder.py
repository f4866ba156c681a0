"""Transcoder training: a sparse dictionary mapping one layer's activations to
ANOTHER layer's (beyond-reference variant; Dunefsky et al. 2024 "Transcoders
find interpretable LLM feature circuits").

Where an SAE reconstructs the layer it reads (splice = approximate identity), a
transcoder REPLACES the computation between two tap points with an
interpretable sparse bottleneck: z = ReLU(x_in W_enc + b_enc), y_hat = z W_dec
+ b_dec trained against the downstream layer's actual output. The spliced model
then runs backbone -> in_layer -> transcoder -> (skip to) after out_layer.

TPU-native fit: `dump_activations_multi` taps BOTH layers from one backbone
pass into two aligned token caches (identical shard geometry and token order),
so training zips the caches at memory bandwidth — the paired-activation data
problem that makes transcoder training awkward elsewhere is already this
framework's production path (data/activation_cache.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sparse_vision_tpu.models.sae import transcoder_inference_and_loss
from sparse_vision_tpu.ops import metrics
from sparse_vision_tpu.ops.resample import (
    resample_dead_neurons,
    should_reset_measurement,
    should_resample,
)
from sparse_vision_tpu.train.steps import SAETrainState


def make_transcoder_train_step_from_acts(
    lambda_sparse: float,
    tx: optax.GradientTransformation,
    dead_neurons_steps: int,
    expansion_factor: int,
    fused: bool = False,
    fused_opts: Optional[dict] = None,
):
    """Jitted transcoder step over pre-extracted PAIRED activations:
    ``(ts, x_in [T, d_in], y_tgt [T, d_out]) -> (ts, metrics)``. Same update
    skeleton as make_sae_train_step_from_acts (ConstrainedAdam projection/renorm
    applies to the output-space decoder rows unchanged; dead-latent resampling
    uses the d_out-aware surgery in ops/resample.py).

    ``fused=True`` routes forward+loss+stats through the Pallas kernels in
    ops/fused_transcoder.py — the production path at circuit shapes (parity:
    tests/test_fused_transcoder.py)."""
    if fused:
        from sparse_vision_tpu.ops.fused_transcoder import fused_transcoder_loss_terms

        def loss_fn(params, x_in, y_tgt):
            out = fused_transcoder_loss_terms(
                params, x_in, y_tgt, lambda_sparse, expansion_factor,
                **(fused_opts or {}),
            )
            return out["loss"], out
    else:
        def loss_fn(params, x_in, y_tgt):
            out = transcoder_inference_and_loss(params, x_in, y_tgt, lambda_sparse)
            return out["loss"], out

    @jax.jit
    def step_fn(ts: SAETrainState, x_in: jax.Array, y_tgt: jax.Array):
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params, x_in, y_tgt
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
        m = {
            "sae_loss": loss,
            "sae_rec_loss": out["rec_loss"],
            "sae_l1_loss": out["l1_loss"],
            "sparsity": sparsity,
            "perc_dead": jnp.sum(dead_acc) / dead_acc.shape[0],
        }
        return SAETrainState(new_params, opt_state, step, dead_acc, rng), m

    return step_fn


def make_transcoder_multi_step(step_fn):
    """One jitted dispatch over paired [K, T, d_in] / [K, T, d_out] stacks
    (lax.scan; the train state is DONATED, as in make_sae_train_multi_step)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(ts: SAETrainState, x_stack: jax.Array, y_stack: jax.Array):
        def body(ts, xy):
            return step_fn(ts, xy[0], xy[1])

        return jax.lax.scan(body, ts, (x_stack, y_stack))

    return multi


def make_tp_transcoder_train_step(
    mesh,
    ts_placed: SAETrainState,
    lambda_sparse: float,
    tx: optax.GradientTransformation,
    dead_neurons_steps: int,
    expansion_factor: int,
    fused_opts: Optional[dict] = None,
):
    """Tensor-parallel fused transcoder step: ``step(ts, x, y)`` with the latent
    dim sharded over 'model', tokens over 'data', the fused kernels per chip
    (ops/fused_transcoder.make_fused_transcoder_tp_op), and the TP-aware
    dead-latent resample (d_out-generalized resample_dead_neurons_tp). Mirrors
    parallel/tensor_parallel.make_tp_fused_train_step."""
    from jax.sharding import PartitionSpec as P

    from sparse_vision_tpu.ops.fused_transcoder import fused_transcoder_tp_loss_terms
    from sparse_vision_tpu.ops.resample import resample_dead_neurons_tp
    from sparse_vision_tpu.parallel.sharded_steps import shard_map

    n_data = int(mesh.shape["data"])
    n_model = int(mesh.shape["model"])
    opts = dict(fused_opts or {})

    def local_loss(params, x_local, y_local):
        out = fused_transcoder_tp_loss_terms(
            params, x_local, y_local, lambda_sparse, expansion_factor,
            n_data, n_model, **opts,
        )
        return out["loss"], out

    def shard_body(ts: SAETrainState, x_local: jax.Array, y_local: jax.Array):
        (loss, out), grads = jax.value_and_grad(local_loss, has_aux=True)(
            ts.params, x_local, y_local
        )
        # grads are already GLOBAL (psums live inside the op's custom_vjp)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        step = ts.step + 1
        dead_acc = jnp.logical_and(ts.dead_acc, out["dead"])
        rng, sub = jax.random.split(ts.rng)

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
        m = {
            "sae_loss": loss,
            "sae_rec_loss": out["rec_loss"],
            "sae_l1_loss": out["l1_loss"],
            "sparsity": out["sparsity"],
            "perc_dead": jax.lax.psum(jnp.sum(dead_acc), "model") / h_g,
        }
        return SAETrainState(new_params, opt_state, step, dead_acc, rng), m

    state_specs = jax.tree.map(lambda x: x.sharding.spec, ts_placed)
    sharded = shard_map(
        shard_body, mesh=mesh,
        in_specs=(state_specs, P("data", None), P("data", None)),
        out_specs=(state_specs, P()),
        check_vma=False,
    )

    @jax.jit
    def step_fn(ts: SAETrainState, x: jax.Array, y: jax.Array):
        if x.shape[0] % n_data:
            raise ValueError(
                f"token count {x.shape[0]} not divisible by data={n_data}"
            )
        return sharded(ts, x, y)

    return step_fn


def make_transcoder_eval_step(
    net,
    in_layer: str,
    tgt_layer: str,
    lambda_sparse: float,
    expansion_factor: int,
    criterion,
    last_stage: Optional[str] = None,
    input_scales: Optional[tuple] = None,
):
    """Eval step for the transcoder-spliced model, shaped exactly like
    make_sae_eval_step's output so Pipeline.eval_modified consumes it unchanged.

    The modified model SKIPS the segment (in_layer, tgt_layer]: logits_mod =
    backbone-to-in_layer -> transcoder -> apply_segment(after=tgt_layer).

    ``input_scales`` (sae_input_norm="rms"): ``(rms_in, rms_tgt)`` — the
    transcoder consumes ``act_in / rms_in``, predicts the target on the
    ``/ rms_tgt`` basis, and the splice rescales the prediction back, so
    KLD/%same/loss_diff stay raw-exact (train/steps.make_sae_eval_step)."""
    last = last_stage or net.stage_names[-1]
    inv_in = inv_tgt = None
    if input_scales is not None:
        inv_in = float(1.0 / input_scales[0])
        inv_tgt = float(1.0 / input_scales[1])

    @jax.jit
    def step_fn(params: dict, frozen_params: dict, frozen_state: dict,
                images: jax.Array, labels: jax.Array):
        logits_orig, taps, _ = net.apply(frozen_params, images, state=frozen_state)
        act_in = taps[in_layer]
        act_tgt = taps[tgt_layer]
        if inv_in is not None:
            act_in = act_in * inv_in
            act_tgt = act_tgt * inv_tgt
        out = transcoder_inference_and_loss(params, act_in, act_tgt, lambda_sparse)
        decoded_raw = (out["decoded"] if inv_tgt is None
                       else out["decoded"] * float(input_scales[1]))
        logits_mod = net.apply_segment(
            frozen_params, decoded_raw, after=tgt_layer, upto=last,
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
            # variance explained of the TARGET layer by the transcoder's prediction
            "var_expl": metrics.variance_explained(act_tgt, out["decoded"]),
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


def train_transcoder_cached(pipe) -> Optional[dict]:
    """Cached transcoder training through a Pipeline: dump BOTH layers' caches
    from one backbone pass, then train on zipped token stacks. Per-epoch
    checkpoints, evals, results rows, and weight exports are produced by the
    Pipeline's standard machinery."""
    from sparse_vision_tpu.train import checkpoint as ckpt
    from sparse_vision_tpu.train.paired_caches import epoch_stacks, prepare_caches
    from sparse_vision_tpu.utils.profiling import maybe_profile

    cfg = pipe.cfg
    tgt = cfg.transcoder_target_layer
    if not tgt:
        raise ValueError("transcoder runs need transcoder_target_layer set")
    if not cfg.use_activation_cache:
        raise ValueError("transcoder training requires use_activation_cache=True "
                         "(paired-layer caches from one backbone pass)")
    # int8 caches work through the host-dequant default of ActivationCache.stacks
    # (the device-dequant pair plumbing would need two scales per step; the
    # paired-stack zip below reads float32 either way)

    from sparse_vision_tpu.ops.fused_sae import can_fuse

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
                f"TP transcoder needs latents ({pipe.num_units}) divisible by the "
                f"model axis ({n_model}) and tile-compatible local shards"
            )

    layers = (cfg.sae_layer, tgt)
    dirs = {layer: pipe._cache_dir(layer) for layer in layers}
    stream_qs, dump_thread, caches = prepare_caches(pipe, layers, dirs)

    fused_opts = {
        "compute_dtype": jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
        else jnp.float32
    }
    if tensor_parallel:
        # latent dim shards over 'model': fused TP kernels on local shards
        # (tiling validated above; the stock GSPMD fallback cannot place the
        # rectangular decoder correctly through the generic sae path)
        from sparse_vision_tpu.parallel.tensor_parallel import (
            put_tokens_tp,
            put_tp_state,
        )

        n_model = int(mesh.shape["model"])
        interp = jax.devices()[0].platform == "cpu"
        if interp:
            fused_opts.update(interpret=True, compute_dtype=jnp.float32)
        pipe.ts = put_tp_state(mesh, pipe.ts)
        step_fn = make_tp_transcoder_train_step(
            mesh, pipe.ts, cfg.sae_lambda_sparse, pipe.tx,
            cfg.dead_neurons_steps, cfg.sae_expansion_factor,
            fused_opts=fused_opts,
        )

        def _put_pair(x, y, token_axis):
            return (put_tokens_tp(mesh, np.ascontiguousarray(x), token_axis),
                    put_tokens_tp(mesh, np.ascontiguousarray(y), token_axis))
    else:
        if mesh is not None and n_data > 1:
            # data-only mesh: GSPMD placement of the unchanged jitted step
            # (tokens shard over 'data', params replicated; the step's means
            # lower to collectives)
            from sparse_vision_tpu.parallel.sharded_steps import (
                put_replicated_state,
                put_tokens_sharded,
            )

            pipe.ts = put_replicated_state(mesh, pipe.ts)

            def _put_pair(x, y, token_axis):
                return (put_tokens_sharded(mesh, np.ascontiguousarray(x), token_axis),
                        put_tokens_sharded(mesh, np.ascontiguousarray(y), token_axis))
        else:
            def _put_pair(x, y, token_axis):
                return jnp.asarray(x), jnp.asarray(y)
        fused = (
            cfg.use_pallas
            and jax.default_backend() != "cpu"
            and (mesh is None or n_data == 1)
            and can_fuse(tps, pipe.num_units, tile_t=2048)
        )
        step_fn = make_transcoder_train_step_from_acts(
            cfg.sae_lambda_sparse, pipe.tx, cfg.dead_neurons_steps,
            cfg.sae_expansion_factor, fused=fused, fused_opts=fused_opts,
        )
    if cfg.sae_input_norm != "none":
        # sae_input_norm="rms": read on the /rms_in basis, predict on the
        # /rms_tgt basis (Pipeline.input_scale_for; eval rescales the splice)
        _base_step = step_fn
        _inv_in = float(1.0 / pipe.input_scale_for(cfg.sae_layer))
        _inv_tgt = float(1.0 / pipe.input_scale_for(tgt))

        @jax.jit
        def step_fn(ts, x, y):
            return _base_step(ts, x.astype(jnp.float32) * _inv_in,
                              y.astype(jnp.float32) * _inv_tgt)

    multi_fn = make_transcoder_multi_step(step_fn)
    scan_k = pipe.CACHE_SCAN_K
    start = cfg.sae_checkpoint_epoch
    last_eval = None
    pipe.eval_modified(epoch=start, store=False)
    for epoch in range(start, cfg.sae_epochs):
        # aligned pair iterator: streamed from the overlapped dump on the first
        # epoch, zipped shuffled cache readers afterwards (train/paired_caches.py)
        paired_it, caches = epoch_stacks(
            pipe, layers, dirs, epoch, start, stream_qs, dump_thread, caches
        )
        with maybe_profile(cfg.profile_dir or None):
            for x_stack, y_stack in paired_it:
                assert x_stack.shape[0] == y_stack.shape[0]
                if x_stack.shape[0] == scan_k:
                    xs, ys = _put_pair(
                        np.asarray(x_stack), np.asarray(y_stack), 1
                    )
                    pipe.ts, ms = multi_fn(pipe.ts, xs, ys)
                    pipe.logger.log_train(
                        int(pipe.ts.step), {k: v[-1] for k, v in ms.items()}
                    )
                else:  # tail (< scan_k steps) runs single-step
                    for x_tok, y_tok in zip(x_stack, y_stack):
                        xt, yt = _put_pair(np.asarray(x_tok), np.asarray(y_tok), 0)
                        pipe.ts, m = step_fn(pipe.ts, xt, yt)
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

        last_eval = e2e_finetune(pipe) or last_eval
    return last_eval
