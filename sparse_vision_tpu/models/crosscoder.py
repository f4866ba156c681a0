"""Crosscoder: ONE sparse latent space shared across SEVERAL layers
(beyond-reference variant; Lindsey et al. 2024, "Sparse Crosscoders for
Cross-Layer Features and Model Diffing", transformer-circuits.pub).

Where an SAE dictionaries a single layer and a transcoder maps layer A to
layer B, a crosscoder reads L layers at once and reconstructs ALL of them from
one code:

    z      = ReLU( sum_l  x_l  W_enc^l  +  b_enc )          z: [T, h]
    y_l    = z W_dec^l + b_dec^l                             per layer
    loss   = sum_l MSE(y_l, x_l)  +  lambda * mean_T sum_j z_j n_j / h
    n_j    = sum_l || W_dec^l[j] ||_2     (per-latent decoder-norm weight)

The decoder-norm-weighted L1 is the variant's defining term: a latent whose
direction is absent from layer l can drive ||W_dec^l[j]|| to zero at no
sparsity cost, so the per-layer norm profile n_j^l = ||W_dec^l[j]|| becomes a
measurement of WHERE each feature lives (shared vs layer-specific features —
the model-diffing readout, see :func:`crosscoder_decoder_norms`). For exactly
this reason crosscoders train with a PLAIN optimizer: ConstrainedAdam's
unit-norm decoder-row invariant would erase the norm signal (and its
projection assumes a single ``W_dec`` array) — train/crosscoder.py enforces
``sae_optimizer_name="adam"``.

TPU-native fit: the L aligned token caches come from ONE backbone pass
(data/activation_cache.dump_activations_multi — identical shard geometry and
token order), the encoder's sum of L matmuls and the L decoder matmuls are
independent MXU contractions XLA fuses freely, and the flat parameter layout
(``W_enc_0..W_enc_{L-1}`` etc.) keeps checkpoints/exports/Adam-moment surgery
on the same plumbing as every other variant.

Layer geometry contract: all L layers must share spatial dims (per-token
crossing of channel spaces), like the transcoder pair contract
(models/sae.transcoder_inference_and_loss). GoogLeNet's mixed4a..mixed4e block
(five 14x14 layers) is the production target shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sparse_vision_tpu.models.sae import (
    act_from_tokens,
    kaiming_uniform,
    tokens_from_act,
)


def crosscoder_num_layers(params: dict) -> int:
    return sum(1 for k in params if k.startswith("W_enc_"))


def init_crosscoder(key: jax.Array, dims: tuple, expansion_factor: int,
                    dtype=jnp.float32) -> dict:
    """Flat parameter dict for ``L = len(dims)`` layers.

    ``h = dims[0] * expansion_factor`` — the ANCHOR layer (the run's
    ``sae_layer``) sets the dictionary size, consistent with
    Pipeline._num_latents. Encoders follow the sae_mlp Kaiming recipe per layer
    scaled by 1/L (the L encoder terms SUM, so per-layer scaling keeps the
    pre-activation variance at the single-layer SAE's level); decoders start
    with rows at norm 1/L (the L reconstructions are driven by one shared code;
    norms are FREE during training — they carry the diffing signal).
    """
    h = int(dims[0] * expansion_factor)
    n = len(dims)
    keys = jax.random.split(key, 2 * n)
    params: dict = {"b_enc": jnp.zeros((h,), dtype)}
    for i, d in enumerate(dims):
        w_enc = kaiming_uniform(keys[2 * i], (h, d), fan_in=d, dtype=dtype).T
        w_dec = kaiming_uniform(keys[2 * i + 1], (d, h), fan_in=h, dtype=dtype).T
        w_dec = w_dec / jnp.linalg.norm(w_dec, axis=1, keepdims=True) / n
        params[f"W_enc_{i}"] = w_enc / n
        params[f"W_dec_{i}"] = w_dec
        params[f"b_dec_{i}"] = jnp.zeros((d,), dtype)
    return params


def crosscoder_apply(params: dict, xs: tuple) -> tuple:
    """``(encoded [T, h], decoded tuple of [T, d_l], pre [T, h])`` on per-layer
    token inputs. One shared ReLU code from the SUM of per-layer encoder
    projections; per-layer affine decoders."""
    n = crosscoder_num_layers(params)
    assert len(xs) == n, (len(xs), n)
    pre = params["b_enc"]
    for i, x in enumerate(xs):
        pre = pre + x @ params[f"W_enc_{i}"]
    z = jax.nn.relu(pre)
    decoded = tuple(
        z @ params[f"W_dec_{i}"] + params[f"b_dec_{i}"] for i in range(n)
    )
    return z, decoded, pre


def crosscoder_decoder_norms(params: dict) -> jax.Array:
    """Per-layer per-latent decoder row norms ``[L, h]`` — the model-diffing
    readout: row l is "how much latent j writes into layer l". A latent with a
    flat profile is a SHARED feature; one whose mass concentrates in a single
    row is layer-specific (Lindsey et al. 2024, §"Model Diffing")."""
    n = crosscoder_num_layers(params)
    return jnp.stack(
        [jnp.linalg.norm(params[f"W_dec_{i}"], axis=1) for i in range(n)]
    )


def crosscoder_loss_terms(params: dict, encoded: jax.Array, decoded: tuple,
                          targets: tuple, lambda_sparse: float) -> dict:
    """Summed per-layer MSE + decoder-norm-weighted L1 (module docstring).

    ``rec_loss`` = sum over layers of the per-layer token MSE. ``l1_loss`` =
    ``mean_T sum_j z_j n_j / h`` — at init (all n_j = 1 by construction of
    init_crosscoder's 1/L row norms summed over L) this equals the plain
    ``mean|z|`` of every other variant, so ``sae_lambda_sparse`` transfers.
    RMSE/NRMSE are reported on the ANCHOR layer for the shared results schema.
    """
    from sparse_vision_tpu.ops import losses  # local import to avoid cycles

    rec = sum(jnp.mean(jnp.square(y - t)) for y, t in zip(decoded, targets))
    norms = crosscoder_decoder_norms(params)  # [L, h]
    weight = jnp.sum(norms, axis=0)  # n_j, [h]
    l1 = jnp.mean(encoded * weight[None, :])
    rmse, nrmse = losses.rmse_nrmse(decoded[0], targets[0])
    return {
        "loss": rec + lambda_sparse * l1,
        "rec_loss": rec,
        "l1_loss": l1,
        "nrmse_loss": nrmse,
        "rmse_loss": rmse,
        "aux_loss": jnp.zeros((), encoded.dtype),
    }


def crosscoder_inference_and_loss(params: dict, acts: tuple,
                                  lambda_sparse: float) -> dict:
    """Crosscoder twin of sae_inference_and_loss: per-layer taps -> tokens ->
    shared code -> per-layer reconstructions + loss terms. ``encoded`` /
    ``encoded_pre`` are reshaped back to the ANCHOR layer's feature-map layout
    (the eval step's top-k collection reads them); ``decoded`` is the per-layer
    tuple in tap order."""
    toks = []
    t0 = None
    for i, act in enumerate(acts):
        tok, _ = tokens_from_act(act)
        if t0 is None:
            t0 = tok.shape[0]
        elif tok.shape[0] != t0:
            raise ValueError(
                f"Crosscoder taps disagree on token count: layer 0 {acts[0].shape}"
                f" -> {t0} tokens, layer {i} {act.shape} -> {tok.shape[0]} tokens"
                " (all layers must share spatial dims)"
            )
        toks.append(tok)
    encoded, decoded, pre = crosscoder_apply(params, tuple(toks))
    terms = crosscoder_loss_terms(params, encoded, decoded, tuple(toks),
                                  lambda_sparse)
    if acts[0].ndim > 2:
        encoded = act_from_tokens(encoded, acts[0].shape)
        pre = act_from_tokens(pre, acts[0].shape)
        decoded = tuple(
            act_from_tokens(y, a.shape) for y, a in zip(decoded, acts)
        )
    terms.update(encoded=encoded, encoded_pre=pre, decoded=decoded)
    return terms
