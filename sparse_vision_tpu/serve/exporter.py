"""Export trained runs into serving artifacts (see serve/artifact.py).

Four artifact kinds, each a single jitted function with the weights closed
over (baked into the StableHLO module as constants):

- ``feature_service``: images -> spliced + original logits, channel-averaged
  SAE latent activations, and the per-sample top-k (value, index) features —
  the interpretability-serving payload (the reference computes the same
  quantities only inside its eval epoch, model_pipeline.py:661-714 + 335-360;
  here they ship as one deployable forward).
- ``backbone``: images -> logits of the (possibly trained) original model.
- ``sae_encoder``: tokens [T, d] -> latent activations [T, h] — the hot path
  for downstream feature pipelines that already hold activations.
- ``steering_service``: (images, steer_scale [h], steer_bias [h]) -> steered +
  original logits — inference-time feature steering (clamp/boost/pin any
  latent) from one artifact; see make_steering_service_fn.

The batch axis is exported shape-polymorphic by default
(``jax.export.symbolic_args_specs``): one artifact serves every batch size,
and the serving engine bounds XLA compile count with bucket padding
(serve/engine.py). Pass ``platforms=('tpu','cpu')`` to cross-lower one
artifact for both backends.

``weights_dtype="bfloat16"`` is weight-only quantization for the artifact:
every floating leaf of the closed-over parameter trees is cast to bf16 before
export, roughly halving the serialized module (the weights ARE the module —
constants dominate), while jnp's type promotion keeps the compute in f32
(f32 activations @ bf16 weights promote to f32), so outputs stay f32 and the
logit error is bounded by the weight rounding alone.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from sparse_vision_tpu.models.sae import (
    act_from_tokens,
    sae_decode,
    sae_encode,
    sae_inference_and_loss,
    tokens_from_act,
    topk_sae_apply,
)
from sparse_vision_tpu.ops import metrics
from sparse_vision_tpu.serve.artifact import save_artifact


def cast_weights(tree, weights_dtype):
    """Cast every floating leaf to ``weights_dtype`` (None/f32 = no-op);
    integer leaves (label tables, indices) pass through untouched."""
    if weights_dtype is None:
        return tree
    wd = jnp.dtype(weights_dtype)
    if wd == jnp.float32:
        return tree
    return jax.tree.map(
        lambda a: a.astype(wd)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )


def make_feature_service_fn(
    net,
    frozen_params: dict,
    frozen_state: dict,
    sae_model_name: str,
    sae_params: dict,
    sae_layer: str,
    *,
    top_k: int = 16,
    topk: int = 32,
    topk_approx: bool = False,
    jumprelu_bandwidth: float = 1e-3,
    matryoshka_prefixes: tuple = (0.0625, 0.25, 1.0),
    last_stage: Optional[str] = None,
):
    """images [B, ...] -> dict(logits, logits_original, latents_mean,
    top_values, top_indices). Pure function of the images only — all weights
    are closed over, which is what makes the export self-contained."""
    last = last_stage or net.stage_names[-1]

    def service(images: jax.Array) -> dict:
        logits_orig, taps, _ = net.apply(frozen_params, images, state=frozen_state)
        act = taps[sae_layer]
        out = sae_inference_and_loss(
            sae_model_name, sae_params, act, 0.0, topk=topk,
            topk_approx=topk_approx, jumprelu_bandwidth=jumprelu_bandwidth,
            matryoshka_prefixes=matryoshka_prefixes, training=False,
        )
        logits_mod = net.apply_segment(
            frozen_params, out["decoded"], after=sae_layer, upto=last,
            state=frozen_state,
        )
        # channel-averaged, pre-activation when the variant has one — the same
        # per-unit signal the top-k sample collector ranks by
        # (model_pipeline.py:335-360)
        enc = out["encoded_pre"] if out["encoded_pre"] is not None else out["encoded"]
        latents = metrics.spatial_mean(enc)
        k = min(top_k, latents.shape[-1])
        vals, idx = jax.lax.top_k(latents, k)
        return {
            "logits": logits_mod,
            "logits_original": logits_orig,
            "latents_mean": latents,
            "top_values": vals,
            "top_indices": idx,
        }

    return service


def make_steering_service_fn(
    net,
    frozen_params: dict,
    frozen_state: dict,
    sae_model_name: str,
    sae_params: dict,
    sae_layer: str,
    *,
    mode: str = "delta",
    topk: int = 32,
    topk_approx: bool = False,
    jumprelu_bandwidth: float = 1e-3,
    matryoshka_prefixes: tuple = (0.0625, 0.25, 1.0),
    last_stage: Optional[str] = None,
):
    """(images [B, ...], steer_scale [h], steer_bias [h]) -> steered logits.

    Inference-time feature steering: the per-latent affine edit
    ``z' = z * steer_scale + steer_bias`` is applied to the POST-activation
    latents, decoded, and spliced back into the backbone. One artifact serves
    every steering request — clamp a latent (scale 0), boost it (scale > 1),
    or drive it to a fixed strength (scale 0 + bias v) — without re-exporting.

    Splice modes:

    - ``"delta"`` (default): ``act + (decode(z') - decode(z))`` — the original
      activation keeps its SAE error, so identity steering (scale=1, bias=0)
      reproduces the ORIGINAL model exactly; steering adds pure decoder-
      direction deltas to the stream (the error-preserving recipe of
      Templeton et al. 2024, "Scaling Monosemanticity" steering interventions).
    - ``"splice"``: ``decode(z')`` replaces the activation — the eval-modified
      splice semantics (reference hook, model_pipeline.py:425-432); identity
      steering reproduces the SPLICED model.

    The reference's only intervention surface is decoder-weight surgery
    (sae_mlp.py:187-199 = models/sae.intervene_on_decoder_weights); this is
    its serving-time generalization to arbitrary per-latent affine edits with
    the weights untouched.
    """
    if sae_model_name == "sae_conv":
        raise ValueError("steering_service needs a token-decoder SAE variant "
                         "(sae_conv has no per-latent token code)")
    if mode not in ("delta", "splice"):
        raise ValueError(f"unknown steering mode {mode!r}")
    last = last_stage or net.stage_names[-1]

    def service(images: jax.Array, steer_scale: jax.Array,
                steer_bias: jax.Array) -> dict:
        logits_orig, taps, _ = net.apply(frozen_params, images, state=frozen_state)
        act = taps[sae_layer]
        out = sae_inference_and_loss(
            sae_model_name, sae_params, act, 0.0, topk=topk,
            topk_approx=topk_approx, jumprelu_bandwidth=jumprelu_bandwidth,
            matryoshka_prefixes=matryoshka_prefixes, training=False,
        )
        z_steer = out["encoded"] * steer_scale + steer_bias
        tok_z, _ = tokens_from_act(z_steer)
        decoded_steer = act_from_tokens(
            sae_decode(sae_model_name, sae_params, tok_z), act.shape
        )
        if mode == "delta":
            spliced = act + (decoded_steer - out["decoded"])
        else:
            spliced = decoded_steer
        logits_steered = net.apply_segment(
            frozen_params, spliced, after=sae_layer, upto=last,
            state=frozen_state,
        )
        enc = out["encoded_pre"] if out["encoded_pre"] is not None else out["encoded"]
        return {
            "logits_steered": logits_steered,
            "logits_original": logits_orig,
            "latents_mean": metrics.spatial_mean(enc),
        }

    return service


def make_backbone_fn(net, params: dict, state: dict):
    def forward(images: jax.Array) -> dict:
        logits, _, _ = net.apply(params, images, state=state)
        return {"logits": logits}

    return forward


def make_sae_encoder_fn(sae_model_name: str, sae_params: dict, *,
                        topk: int = 32, topk_approx: bool = False):
    if sae_model_name == "topk_sae":
        def encode(tok: jax.Array) -> dict:
            return {"encoded": topk_sae_apply(sae_params, tok, topk, topk_approx)[0]}
    else:
        def encode(tok: jax.Array) -> dict:
            return {"encoded": sae_encode(sae_model_name, sae_params, tok)}
    return encode


def export_fn(fn, example_shape: tuple, dtype, *, poly_batch: bool = True,
              platforms: Optional[Sequence[str]] = None,
              extra_specs: Sequence[tuple] = ()):
    """Export ``fn`` whose first arg is an array with a leading batch axis.

    ``example_shape`` includes a concrete example batch (used verbatim for a
    static-batch export; only its rank/trailing dims matter when
    ``poly_batch``). ``extra_specs`` adds further STATIC-shaped positional
    args as ``(shape, dtype)`` pairs (e.g. steering vectors) — they stay
    concrete under a polymorphic batch."""
    from jax import export as jexport

    jf = jax.jit(fn)
    main = jax.ShapeDtypeStruct(example_shape, dtype)
    extras = tuple(jax.ShapeDtypeStruct(tuple(s), d) for s, d in extra_specs)
    if poly_batch:
        spec = "b, " + ", ".join("_" * (len(example_shape) - 1))
        # per-arg spec pytree: only the batch arg gets a symbolic dim
        args = jexport.symbolic_args_specs(
            (main, *extras), (spec, *(None,) * len(extras))
        )
    else:
        args = (main, *extras)
    return jexport.export(jf, platforms=tuple(platforms) if platforms else None)(*args)


def _write(out_dir: str, exported, *, kind: str, example_shape: tuple, dtype,
           poly_batch: bool, outputs: Sequence[str], extras: dict) -> str:
    return save_artifact(out_dir, exported, {
        "kind": kind,
        "input_shape": list(example_shape[1:]),
        "input_dtype": jnp.dtype(dtype).name,
        "batch": "poly" if poly_batch else int(example_shape[0]),
        "outputs": list(outputs),
        **extras,
    })


def export_feature_service(
    net, frozen_params, frozen_state, sae_model_name, sae_params, sae_layer,
    out_dir: str, *, img_shape: tuple, example_batch: int = 8,
    poly_batch: bool = True, platforms: Optional[Sequence[str]] = None,
    dtype=jnp.float32, weights_dtype=None, extras: Optional[dict] = None,
    **service_kw,
) -> str:
    fn = make_feature_service_fn(
        net, cast_weights(frozen_params, weights_dtype),
        cast_weights(frozen_state, weights_dtype), sae_model_name,
        cast_weights(sae_params, weights_dtype), sae_layer, **service_kw,
    )
    shape = (example_batch, *img_shape)
    exported = export_fn(fn, shape, dtype, poly_batch=poly_batch,
                         platforms=platforms)
    return _write(
        out_dir, exported, kind="feature_service", example_shape=shape,
        dtype=dtype, poly_batch=poly_batch,
        outputs=("logits", "logits_original", "latents_mean", "top_values",
                 "top_indices"),
        extras={"sae_model_name": sae_model_name, "sae_layer": sae_layer,
                "weights_dtype": jnp.dtype(weights_dtype or jnp.float32).name,
                **(extras or {})},
    )


def export_steering_service(
    net, frozen_params, frozen_state, sae_model_name, sae_params, sae_layer,
    out_dir: str, *, img_shape: tuple, example_batch: int = 8,
    poly_batch: bool = True, platforms: Optional[Sequence[str]] = None,
    dtype=jnp.float32, weights_dtype=None, extras: Optional[dict] = None,
    mode: str = "delta", **service_kw,
) -> str:
    fn = make_steering_service_fn(
        net, cast_weights(frozen_params, weights_dtype),
        cast_weights(frozen_state, weights_dtype), sae_model_name,
        cast_weights(sae_params, weights_dtype), sae_layer, mode=mode,
        **service_kw,
    )
    h = sae_params["W_dec"].shape[0]  # rows = latent directions (repo convention)
    shape = (example_batch, *img_shape)
    exported = export_fn(
        fn, shape, dtype, poly_batch=poly_batch, platforms=platforms,
        extra_specs=(((h,), dtype), ((h,), dtype)),
    )
    return _write(
        out_dir, exported, kind="steering_service", example_shape=shape,
        dtype=dtype, poly_batch=poly_batch,
        outputs=("logits_steered", "logits_original", "latents_mean"),
        extras={
            "sae_model_name": sae_model_name, "sae_layer": sae_layer,
            "steering_mode": mode,
            "weights_dtype": jnp.dtype(weights_dtype or jnp.float32).name,
            # identity-steering fills let the engine warm up / default to a
            # no-op intervention (delta mode: == original model)
            "extra_inputs": [
                {"name": "steer_scale", "shape": [int(h)],
                 "dtype": jnp.dtype(dtype).name, "fill": 1.0},
                {"name": "steer_bias", "shape": [int(h)],
                 "dtype": jnp.dtype(dtype).name, "fill": 0.0},
            ],
            **(extras or {}),
        },
    )


def export_backbone(
    net, params, state, out_dir: str, *, img_shape: tuple,
    example_batch: int = 8, poly_batch: bool = True,
    platforms: Optional[Sequence[str]] = None, dtype=jnp.float32,
    weights_dtype=None, extras: Optional[dict] = None,
) -> str:
    shape = (example_batch, *img_shape)
    fn = make_backbone_fn(net, cast_weights(params, weights_dtype),
                          cast_weights(state, weights_dtype))
    exported = export_fn(fn, shape, dtype, poly_batch=poly_batch,
                         platforms=platforms)
    return _write(out_dir, exported, kind="backbone", example_shape=shape,
                  dtype=dtype, poly_batch=poly_batch, outputs=("logits",),
                  extras={
                      "weights_dtype": jnp.dtype(weights_dtype or jnp.float32).name,
                      **(extras or {}),
                  })


def export_sae_encoder(
    sae_model_name, sae_params, out_dir: str, *, d: int,
    example_batch: int = 1024, poly_batch: bool = True,
    platforms: Optional[Sequence[str]] = None, dtype=jnp.float32,
    weights_dtype=None, extras: Optional[dict] = None, topk: int = 32,
    topk_approx: bool = False,
) -> str:
    shape = (example_batch, d)
    fn = make_sae_encoder_fn(sae_model_name,
                             cast_weights(sae_params, weights_dtype),
                             topk=topk, topk_approx=topk_approx)
    exported = export_fn(fn, shape, dtype, poly_batch=poly_batch,
                         platforms=platforms)
    return _write(out_dir, exported, kind="sae_encoder", example_shape=shape,
                  dtype=dtype, poly_batch=poly_batch, outputs=("encoded",),
                  extras={"sae_model_name": sae_model_name,
                          "weights_dtype": jnp.dtype(
                              weights_dtype or jnp.float32).name,
                          **(extras or {})})


def export_from_pipeline(pipe, out_dir: str, *, kind: str = "feature_service",
                         poly_batch: bool = True,
                         platforms: Optional[Sequence[str]] = None,
                         **kw) -> str:
    """Export a constructed ``train.pipeline.Pipeline``'s current weights.

    The Pipeline has already applied the run's weight-loading contract
    (original-model checkpoint, ``sae_weights_path`` import,
    ``sae_checkpoint_epoch`` restore), so "what you would evaluate is what you
    export". To export a finished training run, construct the Pipeline with
    ``sae_checkpoint_epoch`` pointing at the trained epoch.
    """
    cfg = pipe.cfg
    img_shape = tuple(pipe.img_size)
    if kind == "backbone":
        return export_backbone(
            pipe.net, pipe.frozen_params, pipe.net_state, out_dir,
            img_shape=img_shape, poly_batch=poly_batch, platforms=platforms,
            extras={"model_name": cfg.model_name,
                    "dataset_name": cfg.dataset_name}, **kw,
        )
    if not cfg.use_sae:
        raise ValueError(f"kind={kind!r} needs an SAE run config (use_sae)")
    if cfg.sae_model_name in ("transcoder", "crosscoder"):
        raise ValueError(
            "serving export covers single-layer SAE variants; transcoder/"
            "crosscoder serving is a circuit-tier concern "
            "(interp/transcoder_circuit.py)"
        )
    sae_params = pipe.ts.params
    extras = {"model_name": cfg.model_name, "dataset_name": cfg.dataset_name,
              "sae_expansion_factor": cfg.sae_expansion_factor,
              "run_id": pipe.run_id}
    if kind == "feature_service":
        return export_feature_service(
            pipe.net, pipe.frozen_params, pipe.net_state, cfg.sae_model_name,
            sae_params, cfg.sae_layer, out_dir, img_shape=img_shape,
            poly_batch=poly_batch, platforms=platforms, extras=extras,
            topk=cfg.sae_topk, topk_approx=cfg.sae_topk_approx,
            jumprelu_bandwidth=cfg.jumprelu_bandwidth,
            matryoshka_prefixes=cfg.matryoshka_prefix_fractions, **kw,
        )
    if kind == "sae_encoder":
        return export_sae_encoder(
            cfg.sae_model_name, sae_params, out_dir, d=pipe.sae_input_size,
            poly_batch=poly_batch, platforms=platforms, extras=extras,
            topk=cfg.sae_topk, topk_approx=cfg.sae_topk_approx, **kw,
        )
    if kind == "steering_service":
        return export_steering_service(
            pipe.net, pipe.frozen_params, pipe.net_state, cfg.sae_model_name,
            sae_params, cfg.sae_layer, out_dir, img_shape=img_shape,
            poly_batch=poly_batch, platforms=platforms, extras=extras,
            topk=cfg.sae_topk, topk_approx=cfg.sae_topk_approx,
            jumprelu_bandwidth=cfg.jumprelu_bandwidth,
            matryoshka_prefixes=cfg.matryoshka_prefix_fractions, **kw,
        )
    raise ValueError(f"unknown artifact kind {kind!r}")
