"""Jitted train/eval step functions.

The reference trains the SAE *inside a forward hook* of a no-grad model forward
(model_pipeline.py:363-432: detach tap -> enable_grad -> SAE fwd/loss -> backward ->
optimizer.step, then splice the decoder output back). Here each mode is ONE pure jitted
step over an explicit train state — the TPU-idiomatic equivalent (SURVEY.md §7.1):

  sae_train_step:  tap (frozen backbone) -> value_and_grad over SAE params only ->
                   ConstrainedAdam update -> dead-unit accumulator -> scheduled
                   resample under lax.cond -> (optional) splice-forward for
                   KLD/%same/loss-diff parity metrics.

All functions are shape-static and shard transparently: with the batch sharded over the
'data' mesh axis, every mean/all/any reduction lowers to an XLA collective.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from sparse_vision_tpu.models.layers import SeqNet
from sparse_vision_tpu.models.sae import (
    batch_topk_threshold_update,
    sae_inference_and_loss,
    topk_aux_loss,
)
from sparse_vision_tpu.ops import metrics
from sparse_vision_tpu.ops.resample import (
    resample_dead_neurons,
    should_reset_measurement,
    should_resample,
)


class SAETrainState(NamedTuple):
    params: dict
    opt_state: Any
    step: jax.Array  # int32 — completed train batches (train_batch_idx)
    dead_acc: jax.Array  # bool [h] — running AND across batches since last reset
    rng: jax.Array


class ModelTrainState(NamedTuple):
    params: dict
    net_state: dict  # BN running stats etc.
    opt_state: Any
    step: jax.Array


def init_sae_train_state(sae_params: dict, tx, hidden: int, seed: int = 0) -> SAETrainState:
    return SAETrainState(
        params=sae_params,
        opt_state=tx.init(sae_params),
        step=jnp.zeros((), jnp.int32),
        dead_acc=jnp.ones((hidden,), bool),
        rng=jax.random.key(seed),
    )


def _num_units(sae_model_name: str, params: dict) -> int:
    if sae_model_name == "gated_sae":
        return params["b_gate"].shape[0]
    if sae_model_name == "sae_conv":
        return params["W_enc"].shape[-1]
    return params["b_enc"].shape[0]


def make_sae_train_step(
    net: SeqNet,
    sae_layer: str,
    sae_model_name: str,
    lambda_sparse: float,
    tx: optax.GradientTransformation,
    dead_neurons_steps: int,
    expansion_factor: int,
    criterion,
    full_metrics: bool = True,
    last_stage: Optional[str] = None,
    topk: int = 32,
    topk_approx: bool = False,
    jumprelu_bandwidth: float = 1e-3,
    matryoshka_prefixes: tuple = (0.0625, 0.25, 1.0),
    aux_k: int = 0,
    aux_alpha: float = 0.03125,
):
    """Build the jitted SAE train step.

    full_metrics=True reproduces the reference's per-train-batch bookkeeping
    (model_pipeline.py:602-938): modified-model logits via splice, original logits,
    KLD / %same-classification / loss-diff / accuracy. Turning it off keeps only the
    SAE update + dead-unit stats — the throughput configuration.

    ``aux_k > 0`` (TopK family only) adds the AuxK dead-revival loss
    (models/sae.topk_aux_loss), gated to the mature half of each dead-measurement
    window so a freshly-reset dead accumulator (all-True) never drives it.

    Dead-accumulator semantics: resampling variants (sae_mlp) follow the
    reference's measure/burn-in alternation (ops/resample.py). NON-resampling
    variants reset the accumulator every ``dead_neurons_steps`` — a rolling
    "has not fired in the current window" measurement (Gao et al. 2024 §A.2
    define dead as not-fired-in-N-tokens). Without the reset the accumulator
    is "never fired since step 0", which after a few hundred steps is a small
    frozen set: AuxK then revives only those, while latents that fired early
    and died later stay invisible to it — measured on the chip as the
    batch_topk 75.7%-dead plateau (docs/CONVERGENCE.md round 4; fixed round 5).
    """
    last = last_stage or net.stage_names[-1]
    # the reference only resamples SaeMLP (reset_encoder_weights is a SaeMLP method;
    # model_pipeline.py:792 calls it unconditionally when use_sae)
    can_resample = sae_model_name == "sae_mlp"
    aux_on = aux_k > 0 and sae_model_name in ("topk_sae", "batch_topk_sae")

    def loss_fn(sae_params, act, dead_mask, aux_scale):
        out = sae_inference_and_loss(
            sae_model_name, sae_params, act, lambda_sparse, topk=topk, topk_approx=topk_approx,
            jumprelu_bandwidth=jumprelu_bandwidth,
            matryoshka_prefixes=matryoshka_prefixes,
        )
        loss = out["loss"]
        if aux_on:
            aux = topk_aux_loss(sae_params, act, act - out["decoded"],
                                dead_mask, aux_k, approx=topk_approx)
            out["aux_loss"] = aux
            loss = loss + aux_scale * aux
        return loss, out

    @jax.jit
    def step_fn(ts: SAETrainState, frozen_params: dict, frozen_state: dict,
                images: jax.Array, labels: jax.Array):
        if full_metrics:
            logits_orig, taps, _ = net.apply(frozen_params, images, state=frozen_state)
        else:
            _, taps, _ = net.apply(
                frozen_params, images, state=frozen_state, stop_at=sae_layer
            )
        act = jax.lax.stop_gradient(taps[sae_layer])

        mature = (ts.step % dead_neurons_steps) >= dead_neurons_steps // 2
        aux_scale = aux_alpha * mature
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params, act, ts.dead_acc, aux_scale)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)

        step = ts.step + 1

        # dead-unit bookkeeping on the (post-activation) encoder output
        dead, sparsity, _freq = metrics.measure_inactive_units(
            out["encoded"], expansion_factor
        )
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
            # rolling dead window for non-resampling variants (see docstring)
            dead_acc = jnp.where(
                step % dead_neurons_steps == 0, jnp.ones_like(dead_acc), dead_acc
            )

        if sae_model_name == "batch_topk_sae":
            # the inference threshold is EMA-estimated, not gradient-trained
            # (models/sae.batch_topk_sae_apply): overwrite whatever the
            # optimizer left (zero-gradient params get a zero adam update)
            new_params = {
                **new_params,
                "threshold": batch_topk_threshold_update(
                    ts.params["threshold"], out["batch_topk_min_pos"]
                ),
            }

        out_metrics = {
            "sae_loss": loss,
            "sae_rec_loss": out["rec_loss"],
            "sae_l1_loss": out["l1_loss"],
            "sae_nrmse_loss": out["nrmse_loss"],
            "sae_rmse_loss": out["rmse_loss"],
            "sae_aux_loss": out["aux_loss"],
            "sparsity": sparsity,
            "perc_dead": jnp.sum(dead_acc) / dead_acc.shape[0],
        }

        if full_metrics:
            logits_mod = net.apply_segment(
                frozen_params, out["decoded"], after=sae_layer, upto=last,
                state=frozen_state,
            )
            loss_mod = criterion(logits_mod, labels)
            loss_orig = criterion(logits_orig, labels)
            out_metrics.update(
                model_loss=loss_mod,
                loss_diff=loss_mod - loss_orig,
                kld=metrics.kld_original_vs_modified(logits_orig, logits_mod),
                perc_same=metrics.perc_same_classification(logits_orig, logits_mod),
                accuracy=metrics.accuracy(logits_mod, labels),
                var_expl=metrics.variance_explained(act, out["decoded"]),
            )

        new_ts = SAETrainState(new_params, opt_state, step, dead_acc, rng)
        return new_ts, out_metrics

    return step_fn


def make_sae_train_step_from_acts(
    sae_model_name: str,
    lambda_sparse: float,
    tx: optax.GradientTransformation,
    dead_neurons_steps: int,
    expansion_factor: int,
    fused: bool = False,
    fused_opts: Optional[dict] = None,
    topk: int = 32,
    topk_approx: bool = False,
    jumprelu_bandwidth: float = 1e-3,
    matryoshka_prefixes: tuple = (0.0625, 0.25, 1.0),
    aux_k: int = 0,
    aux_alpha: float = 0.03125,
):
    """SAE train step over pre-extracted activations (the activation-cache training
    mode; the reference abandoned an HDF5 version of this, utils.py:613-657 — here it
    is a first-class path and the benchmark kernel). Identical update math to
    make_sae_train_step, without the backbone forward.

    ``fused=True`` routes forward+loss+stats through the Pallas fused kernels
    (ops/fused_sae.py for sae_mlp, ops/fused_gated_sae.py for gated_sae) — the
    production TPU path; requires tile-divisible shapes. Parity with the stock path is
    tested in tests/test_fused_sae.py / tests/test_fused_gated_sae.py.

    ``aux_k > 0`` (TopK family only) adds the AuxK dead-revival loss on top of
    whichever selection engine runs (stock, fast gather, radix cutoff) — see
    make_sae_train_step. Non-resampling variants use the rolling dead window
    (reset every dead_neurons_steps; see make_sae_train_step's docstring)."""
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

    if fused and sae_model_name == "batch_topk_sae":
        # radix-bisection cutoff instead of the [T*H] flat sort (stock XLA, not
        # Pallas — selection has no Pallas lowering): ops/fast_batch_topk.py
        from sparse_vision_tpu.ops.fast_batch_topk import (
            fast_batch_topk_sae_loss_terms,
        )

        def loss_fn(sae_params, act):
            out = fast_batch_topk_sae_loss_terms(
                sae_params, act, lambda_sparse, expansion_factor, topk
            )
            return out["loss"], out
    elif fused and sae_model_name == "topk_sae":
        # TopK "fused" path is gather-based stock XLA, not Pallas (lax.top_k has no
        # Pallas TPU lowering): ops/fast_topk_sae.py — no [T, H] materialization
        from sparse_vision_tpu.ops.fast_topk_sae import fast_topk_sae_loss_terms

        def loss_fn(sae_params, act):
            out = fast_topk_sae_loss_terms(
                sae_params, act, lambda_sparse, expansion_factor, topk,
                approx=topk_approx,
            )
            return out["loss"], out
    elif fused and sae_model_name == "jumprelu_sae":
        from sparse_vision_tpu.ops.fused_jumprelu_sae import (
            fused_jumprelu_sae_loss_terms,
        )

        def loss_fn(sae_params, act):
            out = fused_jumprelu_sae_loss_terms(
                sae_params, act, lambda_sparse, expansion_factor, **(fused_opts or {})
            )
            return out["loss"], out
    elif fused and sae_model_name == "gated_sae":
        from sparse_vision_tpu.ops.fused_gated_sae import fused_gated_sae_loss_terms

        def loss_fn(sae_params, act):
            out = fused_gated_sae_loss_terms(
                sae_params, act, lambda_sparse, expansion_factor, **(fused_opts or {})
            )
            return out["loss"], out
    elif fused and sae_model_name == "matryoshka_sae":
        from sparse_vision_tpu.ops.fused_matryoshka_sae import (
            fused_matryoshka_sae_loss_terms,
        )

        def loss_fn(sae_params, act):
            out = fused_matryoshka_sae_loss_terms(
                sae_params, act, lambda_sparse, expansion_factor,
                tuple(matryoshka_prefixes), **(fused_opts or {})
            )
            return out["loss"], out
    elif fused:
        from sparse_vision_tpu.ops.fused_sae import fused_sae_loss_terms

        def loss_fn(sae_params, act):
            out = fused_sae_loss_terms(
                sae_params, act, lambda_sparse, expansion_factor, **(fused_opts or {})
            )
            return out["loss"], out
    else:
        def loss_fn(sae_params, act):
            out = sae_inference_and_loss(
                sae_model_name, sae_params, act, lambda_sparse, topk=topk,
                topk_approx=topk_approx, jumprelu_bandwidth=jumprelu_bandwidth,
                matryoshka_prefixes=matryoshka_prefixes,
            )
            return out["loss"], out

    base_loss_fn = loss_fn

    def aux_loss_fn(sae_params, act, dead_mask, aux_scale):
        loss, out = base_loss_fn(sae_params, act)
        aux = topk_aux_loss(sae_params, act, act - out["decoded"],
                            dead_mask, aux_k, approx=topk_approx)
        out["aux_loss"] = aux
        return loss + aux_scale * aux, out

    @jax.jit
    def step_fn(ts: SAETrainState, act: jax.Array):
        if aux_on:
            mature = (ts.step % dead_neurons_steps) >= dead_neurons_steps // 2
            (loss, out), grads = jax.value_and_grad(aux_loss_fn, has_aux=True)(
                ts.params, act, ts.dead_acc, aux_alpha * mature)
        else:
            (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                ts.params, act)
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
            # rolling dead window for non-resampling variants (see
            # make_sae_train_step's docstring; the AuxK dead-revival fix)
            dead_acc = jnp.where(
                step % dead_neurons_steps == 0, jnp.ones_like(dead_acc), dead_acc
            )
        if sae_model_name == "batch_topk_sae":
            new_params = {
                **new_params,
                "threshold": batch_topk_threshold_update(
                    ts.params["threshold"], out["batch_topk_min_pos"]
                ),
            }
        m = {
            "sae_loss": loss,
            "sae_rec_loss": out["rec_loss"],
            "sae_l1_loss": out["l1_loss"],
            "sparsity": sparsity,
            "perc_dead": jnp.sum(dead_acc) / dead_acc.shape[0],
        }
        if aux_on:
            m["sae_aux_loss"] = out["aux_loss"]
        return SAETrainState(new_params, opt_state, step, dead_acc, rng), m

    return step_fn


def make_sae_train_multi_step(step_fn):
    """Wrap a ``(ts, acts) -> (ts, metrics)`` step into ONE jitted dispatch over a
    stacked [K, T, C] microbatch sequence via lax.scan.

    Host-dispatch overhead (worst on tunneled/remote backends, nonzero everywhere) is
    paid once per K steps instead of per step; metrics are returned stacked [K].
    The input train state is DONATED — its buffers are reused for the output state
    (params + Adam moments are the largest live arrays), so callers must not reuse
    the passed-in state object."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(ts: SAETrainState, acts_stack: jax.Array):
        def body(ts, a):
            return step_fn(ts, a)

        return jax.lax.scan(body, ts, acts_stack)

    return multi


def make_dequant_step_fn(step_fn, compute_dtype=jnp.float32):
    """Wrap a ``(ts, act) -> (ts, metrics)`` step to consume int8-quantized
    activations: ``(ts, q [T, C] int8, scale [C]) -> (ts, metrics)`` with the
    dequantize multiply ON DEVICE (data/activation_cache.quantize_int8 wrote the
    shards; an int8 cache then moves half the host->device bytes of bfloat16).
    Works unchanged over GSPMD/shard_map step functions — q shards over the token
    axis, the elementwise multiply preserves the sharding, scale is replicated."""

    @jax.jit
    def step_q(ts, q: jax.Array, scale: jax.Array):
        return step_fn(ts, q.astype(compute_dtype) * scale.astype(compute_dtype))

    return step_q


def make_sae_train_multi_step_quant(step_fn, compute_dtype=jnp.float32):
    """Quantized twin of :func:`make_sae_train_multi_step`: one jitted dispatch
    over an int8 [K, T, C] stack + its per-shard scale [C] (stacks never span
    shards in device-dequant mode, ActivationCache.stacks). The train state is
    DONATED, as in the unquantized version."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(ts: SAETrainState, q_stack: jax.Array, scale: jax.Array):
        def body(ts, q):
            return step_fn(ts, q.astype(compute_dtype) * scale.astype(compute_dtype))

        return jax.lax.scan(body, ts, q_stack)

    return multi


def make_sae_eval_step(
    net: SeqNet,
    sae_layer: str,
    sae_model_name: str,
    lambda_sparse: float,
    expansion_factor: int,
    criterion,
    last_stage: Optional[str] = None,
    topk: int = 32,
    topk_approx: bool = False,
    jumprelu_bandwidth: float = 1e-3,
    matryoshka_prefixes: tuple = (0.0625, 0.25, 1.0),
    input_scale: Optional[float] = None,
):
    """Eval step for the modified (SAE-spliced) model: all reference eval-epoch
    quantities for one batch (model_pipeline.py:661-714 + 806-878).

    ``input_scale`` (sae_input_norm="rms"): the SAE consumes ``act / scale``
    and the splice rescales the reconstruction back, so KLD/%same/loss_diff
    are raw-exact while rec/l1/rmse report on the normalized basis the
    dictionary was trained on (var_expl/NRMSE/sparsity are scale-invariant)."""
    last = last_stage or net.stage_names[-1]
    inv = None if input_scale is None else float(1.0 / input_scale)

    @jax.jit
    def step_fn(sae_params: dict, frozen_params: dict, frozen_state: dict,
                images: jax.Array, labels: jax.Array):
        logits_orig, taps, _ = net.apply(frozen_params, images, state=frozen_state)
        act = taps[sae_layer]
        if inv is not None:
            act = act * inv
        out = sae_inference_and_loss(
            sae_model_name, sae_params, act, lambda_sparse, topk=topk, topk_approx=topk_approx,
            jumprelu_bandwidth=jumprelu_bandwidth,
            matryoshka_prefixes=matryoshka_prefixes,
            # eval uses the deployment activation (batch_topk: the estimated
            # scalar threshold instead of batch-level selection)
            training=False,
        )
        decoded_raw = (out["decoded"] if inv is None
                       else out["decoded"] * float(input_scale))
        logits_mod = net.apply_segment(
            frozen_params, decoded_raw, after=sae_layer, upto=last, state=frozen_state
        )
        loss_mod = criterion(logits_mod, labels)
        loss_orig = criterion(logits_orig, labels)
        dead, sparsity, freq = metrics.measure_inactive_units(
            out["encoded"], expansion_factor
        )
        enc_for_topk = out["encoded_pre"] if out["encoded_pre"] is not None else out["encoded"]
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
            "var_expl": metrics.variance_explained(act, out["decoded"]),
        }
        arrays = {
            "dead": dead,
            "freq": freq,
            # channel-averaged (pre-ReLU when available) activations for top-k
            # (model_pipeline.py:335-360 uses prerelu for SAE top-k)
            "topk_acts": metrics.spatial_mean(enc_for_topk),
            # POST-activation sparse code, pooled — what sparse probing probes
            # (SAEBench/Gao et al. probe the sparse code, not the dense pre-code)
            "probe_acts": metrics.spatial_mean(out["encoded"]),
            "correct": jnp.sum(
                (jnp.argmax(logits_mod, axis=1) == labels).astype(jnp.int32)
            ),
        }
        return batch_metrics, arrays

    return step_fn


def make_model_train_step(net: SeqNet, tx: optax.GradientTransformation, criterion):
    """Train the original model (reference mode original_model=True, training=True;
    model_pipeline.py:653-660): plain CE + optimizer step, BN in train mode."""

    @jax.jit
    def step_fn(ts: ModelTrainState, images: jax.Array, labels: jax.Array):
        def loss_fn(params):
            logits, _, new_state = net.apply(params, images, state=ts.net_state, train=True)
            return criterion(logits, labels), (logits, new_state)

        (loss, (logits, new_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params
        )
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        m = {"model_loss": loss, "accuracy": metrics.accuracy(logits, labels)}
        return ModelTrainState(params, new_state, opt_state, ts.step + 1), m

    return step_fn


def make_model_eval_step(net: SeqNet, criterion, topk_layer: Optional[str] = None):
    """Eval the original model (reference mode original_model=True, training=False):
    loss/accuracy plus per-layer dead-unit & sparsity stats of the tapped layer.

    ``topk_layer`` names a backbone layer whose channel-averaged output is collected
    for top-k/MIS on the ORIGINAL model's channels — the reference's
    `original_model=True, mis != "0"` path, which reuses the sae_layer parameter to
    name a backbone layer (specify_parameters.py:245-247) and collects top-k whenever
    no SAE is in play (model_pipeline.py:344-345, use_output = output_avg_W_H). When
    set, ``arrays`` gains 'topk_acts' [B, C], 'freq' [C], 'dead' [C] (expansion
    factor 1, the reference's original-model sweep convention,
    specify_parameters.py:236-243) and the full taps dict is dropped from the return
    (it would pin every intermediate activation in HBM across the eval loop)."""

    @jax.jit
    def step_fn(params: dict, net_state: dict, images: jax.Array, labels: jax.Array):
        logits, taps, _ = net.apply(params, images, state=net_state)
        m = {
            "model_loss": criterion(logits, labels),
            "accuracy": metrics.accuracy(logits, labels),
        }
        arrays = {
            "correct": jnp.sum((jnp.argmax(logits, axis=1) == labels).astype(jnp.int32)),
        }
        if topk_layer is not None:
            act = taps[topk_layer]
            dead, _, freq = metrics.measure_inactive_units(act, 1)
            arrays["topk_acts"] = metrics.spatial_mean(act)
            arrays["freq"] = freq
            arrays["dead"] = dead
            return m, arrays, {}
        return m, arrays, taps

    return step_fn
