"""End-to-end SAE finetuning: a short KL-objective pass after MSE training.

"Revisiting End-To-End Sparse Autoencoder Training: A Short Finetune Is All You
Need" (arXiv:2503.17272; see PAPERS.md): an SAE trained on reconstruction MSE
is briefly finetuned with the DOWNSTREAM objective — make the spliced model's
output distribution match the original model's — which substantially improves
exactly the fidelity metrics the reference's thesis evaluates SAEs on (KLD,
%same-classification, loss_diff; model_pipeline.py:690-714) at a small compute
cost (the finetune is ~a few percent of the MSE-training steps).

Loss: KL(modified || original) through the splice (the reference's own KLD
metric direction, ops/metrics.kld_original_vs_modified) plus ``alpha_mse`` x the
reconstruction MSE as an anchor (alpha_mse=0 reproduces the paper's pure-KL
finetune) plus the usual lambda * L1 so sparsity pressure is maintained.

Gradients flow through the SPLICED downstream segment into the SAE parameters
only (the backbone stays frozen). The decoder-norm constraint (ConstrainedAdam)
and dead-unit bookkeeping continue unchanged, so a finetuned SAE remains a
drop-in for every downstream consumer (circuits, MIS, export).

Config: ``sae_e2e_finetune_epochs > 0`` runs this pass automatically after
every trainer (train_sae / train_sae_cached / train_transcoder_cached /
train_crosscoder_cached); ``sae_e2e_alpha_mse`` sets the anchor weight.

Variant splices (each matches its eval step's, so the finetune optimizes
exactly the KLD the results row reports):
- SAE: replace ``sae_layer``'s activation with the reconstruction.
- Transcoder: SKIP the (in_layer, target_layer] segment — logits_mod =
  backbone-to-in_layer -> transcoder -> apply_segment(after=target_layer)
  (train/transcoder.make_transcoder_eval_step).
- Crosscoder: acausal splice — code from ALL L original taps, the DEEPEST
  layer's activation replaced by its reconstruction
  (train/crosscoder.make_crosscoder_eval_step). Only the deepest decoder
  receives KL gradient (the others are off the spliced path); the L1 keeps
  every decoder's norm in the objective, and ``alpha_mse > 0`` anchors all
  L reconstructions. The decoder-norm diffing CSV is re-written after the
  finetune by train_crosscoder_cached.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from sparse_vision_tpu.models.sae import sae_inference_and_loss
from sparse_vision_tpu.ops import metrics
from sparse_vision_tpu.train.steps import SAETrainState


def make_sae_e2e_finetune_step(
    net,
    sae_layer: str,
    sae_model_name: str,
    lambda_sparse: float,
    tx: optax.GradientTransformation,
    alpha_mse: float = 0.0,
    last_stage: Optional[str] = None,
    topk: int = 32,
    topk_approx: bool = False,
    jumprelu_bandwidth: float = 1e-3,
    matryoshka_prefixes: tuple = (0.0625, 0.25, 1.0),
):
    """Build the jitted e2e finetune step: ``(ts, frozen_params, frozen_state,
    images, labels) -> (ts, metrics)`` minimizing KL(spliced || original)
    (+ alpha_mse * rec MSE + lambda * L1) w.r.t. the SAE parameters.

    No dead-unit resampling runs during the finetune (the paper finetunes a
    CONVERGED SAE; resampling would re-randomize latents the KL pass is trying
    to align) — the dead accumulator keeps updating for observability."""
    last = last_stage or net.stage_names[-1]

    def loss_fn(sae_params, frozen_params, frozen_state, images):
        logits_orig, taps, _ = net.apply(frozen_params, images, state=frozen_state)
        act = jax.lax.stop_gradient(taps[sae_layer])
        out = sae_inference_and_loss(
            sae_model_name, sae_params, act, lambda_sparse, topk=topk,
            topk_approx=topk_approx, jumprelu_bandwidth=jumprelu_bandwidth,
            matryoshka_prefixes=matryoshka_prefixes,
        )
        logits_mod = net.apply_segment(
            frozen_params, out["decoded"], after=sae_layer, upto=last,
            state=frozen_state,
        )
        kld = metrics.kld_original_vs_modified(
            jax.lax.stop_gradient(logits_orig), logits_mod
        )
        loss = kld + alpha_mse * out["rec_loss"] + lambda_sparse * out["l1_loss"]
        return loss, (out, kld, logits_orig, logits_mod)

    return _finetune_step_from_loss(loss_fn, tx)


def _finetune_step_from_loss(loss_fn, tx: optax.GradientTransformation):
    """Shared finetune-step skeleton: grad of ``loss_fn(sae_params,
    frozen_params, frozen_state, images) -> (loss, (out, kld, logits_orig,
    logits_mod))`` w.r.t. the SAE/transcoder/crosscoder params, optimizer
    update, dead-unit observability (no resampling — see
    make_sae_e2e_finetune_step's docstring), fidelity metrics."""

    @jax.jit
    def step_fn(ts: SAETrainState, frozen_params: dict, frozen_state: dict,
                images: jax.Array, labels: jax.Array):
        (loss, (out, kld, logits_orig, logits_mod)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(ts.params, frozen_params, frozen_state, images)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        if "batch_topk_min_pos" in out:
            # batch_topk_sae: keep the inference-threshold EMA tracking the
            # finetuned encoder (the key's presence is trace-static)
            from sparse_vision_tpu.models.sae import batch_topk_threshold_update

            new_params = {
                **new_params,
                "threshold": batch_topk_threshold_update(
                    ts.params["threshold"], out["batch_topk_min_pos"]
                ),
            }
        dead, sparsity, _ = metrics.measure_inactive_units(out["encoded"], 1)
        dead_acc = jnp.logical_and(ts.dead_acc, dead)
        m = {
            "e2e_loss": loss,
            "kld": kld,
            "sae_rec_loss": out["rec_loss"],
            "sae_l1_loss": out["l1_loss"],
            "perc_same": metrics.perc_same_classification(logits_orig, logits_mod),
            "sparsity": sparsity,
        }
        return SAETrainState(new_params, opt_state, ts.step + 1, dead_acc, ts.rng), m

    return step_fn


def make_transcoder_e2e_finetune_step(
    net,
    in_layer: str,
    tgt_layer: str,
    lambda_sparse: float,
    tx: optax.GradientTransformation,
    alpha_mse: float = 0.0,
    last_stage: Optional[str] = None,
):
    """Transcoder e2e finetune step: KL(spliced || original) through the
    segment-skip splice (backbone -> in_layer -> transcoder -> after
    tgt_layer), + alpha_mse * MSE(y_hat, y_tgt) + lambda * L1."""
    from sparse_vision_tpu.models.sae import transcoder_inference_and_loss

    last = last_stage or net.stage_names[-1]

    def loss_fn(params, frozen_params, frozen_state, images):
        logits_orig, taps, _ = net.apply(frozen_params, images, state=frozen_state)
        act_in = jax.lax.stop_gradient(taps[in_layer])
        act_tgt = jax.lax.stop_gradient(taps[tgt_layer])
        out = transcoder_inference_and_loss(params, act_in, act_tgt, lambda_sparse)
        logits_mod = net.apply_segment(
            frozen_params, out["decoded"], after=tgt_layer, upto=last,
            state=frozen_state,
        )
        kld = metrics.kld_original_vs_modified(
            jax.lax.stop_gradient(logits_orig), logits_mod
        )
        loss = kld + alpha_mse * out["rec_loss"] + lambda_sparse * out["l1_loss"]
        return loss, (out, kld, logits_orig, logits_mod)

    return _finetune_step_from_loss(loss_fn, tx)


def make_crosscoder_e2e_finetune_step(
    net,
    layers: tuple,
    lambda_sparse: float,
    tx: optax.GradientTransformation,
    alpha_mse: float = 0.0,
    last_stage: Optional[str] = None,
):
    """Crosscoder e2e finetune step: KL(spliced || original) through the
    acausal splice (code from ALL L original taps; the DEEPEST layer's
    activation replaced by its reconstruction), + alpha_mse * the summed
    per-layer MSE + lambda * the decoder-norm-weighted L1 (the training
    sparsity objective, models/crosscoder.crosscoder_loss_terms)."""
    from sparse_vision_tpu.models.crosscoder import crosscoder_inference_and_loss

    last = last_stage or net.stage_names[-1]
    deepest = layers[-1]

    def loss_fn(params, frozen_params, frozen_state, images):
        logits_orig, taps, _ = net.apply(frozen_params, images, state=frozen_state)
        acts = tuple(jax.lax.stop_gradient(taps[l]) for l in layers)
        out = crosscoder_inference_and_loss(params, acts, lambda_sparse)
        logits_mod = net.apply_segment(
            frozen_params, out["decoded"][-1], after=deepest, upto=last,
            state=frozen_state,
        )
        kld = metrics.kld_original_vs_modified(
            jax.lax.stop_gradient(logits_orig), logits_mod
        )
        loss = kld + alpha_mse * out["rec_loss"] + lambda_sparse * out["l1_loss"]
        return loss, (out, kld, logits_orig, logits_mod)

    return _finetune_step_from_loss(loss_fn, tx)


def e2e_finetune(pipe, epochs: Optional[int] = None) -> Optional[dict]:
    """Run the short e2e finetune on a Pipeline whose SAE is already trained
    (called automatically by Pipeline.train_sae when
    cfg.sae_e2e_finetune_epochs > 0, or standalone on a restored checkpoint).
    Re-evaluates after each epoch; the final eval's results row replaces the
    stored metrics, so the ranking tier sees the finetuned fidelity."""
    cfg = pipe.cfg
    epochs = cfg.sae_e2e_finetune_epochs if epochs is None else epochs
    if epochs <= 0:
        return None
    # meshes work via GSPMD: pipe._batches places images sharded over 'data'
    # and the SAE state flows through the jitted step with whatever sharding
    # training left it in — replicated (data-only meshes) or latent-sharded
    # over 'model' (tensor-parallel training leaves pipe.ts TP-placed; the
    # stock step partitions exactly like parallel/tensor_parallel.py's GSPMD
    # training path, incl. ConstrainedAdam's row-local renorm).
    # Parity: tests/test_e2e_finetune.py data-mesh + TP tests.
    if cfg.sae_model_name == "transcoder":
        step_fn = make_transcoder_e2e_finetune_step(
            pipe.net, cfg.sae_layer, cfg.transcoder_target_layer,
            cfg.sae_lambda_sparse, pipe.tx, alpha_mse=cfg.sae_e2e_alpha_mse,
        )
    elif cfg.sae_model_name == "crosscoder":
        step_fn = make_crosscoder_e2e_finetune_step(
            pipe.net, pipe.crosscoder_all_layers, cfg.sae_lambda_sparse,
            pipe.tx, alpha_mse=cfg.sae_e2e_alpha_mse,
        )
    else:
        step_fn = make_sae_e2e_finetune_step(
            pipe.net, cfg.sae_layer, cfg.sae_model_name, cfg.sae_lambda_sparse,
            pipe.tx, alpha_mse=cfg.sae_e2e_alpha_mse,
            topk=cfg.sae_topk, topk_approx=cfg.sae_topk_approx,
            jumprelu_bandwidth=cfg.jumprelu_bandwidth,
            matryoshka_prefixes=cfg.matryoshka_prefix_fractions,
        )
    from sparse_vision_tpu.train import checkpoint as ckpt

    last_eval = None
    base_epoch = cfg.sae_epochs
    # resume INTO the finetune: sae_checkpoint_epoch beyond the MSE epochs counts
    # completed finetune epochs — run only the remainder, numbered continuously
    done = max(0, cfg.sae_checkpoint_epoch - base_epoch)
    for e in range(done, epochs):
        for b in pipe._batches(
            pipe.train_ds, cfg.sae_batch_size, shuffle=True,
            seed=cfg.seed + 1000 + e,
        ):
            pipe.ts, m = step_fn(
                pipe.ts, pipe.frozen_params, pipe.net_state, b.images, b.labels
            )
            pipe.logger.log_train(int(pipe.ts.step), m)
        ckpt.save_checkpoint(
            pipe._sae_ckpt_dir(), base_epoch + e + 1,
            {
                "params": pipe.ts.params,
                "opt_state": pipe.ts.opt_state,
                "step": pipe.ts.step,
                "dead_acc": pipe.ts.dead_acc,
            },
            blocking=False,
        )
        last_eval = pipe.eval_modified(
            epoch=base_epoch + e + 1, final=(e + 1 == epochs)
        )
    ckpt.wait_for_saves()
    pipe._export_sae_weights()
    return last_eval
