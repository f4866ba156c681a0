"""Dead-neuron resampling as a pure function, plus the resample/reset schedule.

Reference semantics (sae_mlp.py:79-184 reset_encoder_weights + model_pipeline.py:771-794
schedule): with n = dead_neurons_steps and i = 1-based train step,
- resample at i where (i-1) % n == 0, ((i-1)//n) % 2 == 0, i != 1  (i.e. 2n+1, 4n+1, ...)
- reset the dead-neuron measurement (without resampling) at i = n, 3n, 5n, ...
so the SAE alternates n measured steps -> resample -> n burn-in steps -> ...

The reference mutates parameter rows/columns and Adam moment slices in place; here the
whole surgery is a pure jnp.where over the latent axis, executable under jit/lax.cond
and trivially correct under sharding (each chip rewrites its local latent rows).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from sparse_vision_tpu.models.sae import kaiming_uniform


def should_resample(step: jax.Array, dead_neurons_steps: int) -> jax.Array:
    """1-based train step i: true at i = 2n+1, 4n+1, ... (model_pipeline.py:771-775)."""
    i = step
    n = dead_neurons_steps
    return ((i - 1) % n == 0) & (((i - 1) // n) % 2 == 0) & (i - 1 != 0)


def should_reset_measurement(step: jax.Array, dead_neurons_steps: int) -> jax.Array:
    """True at i = n, 3n, 5n, ... (model_pipeline.py:786-788): clear the dead-neuron
    accumulator without resampling."""
    i = step
    n = dead_neurons_steps
    return (i == n) | ((i > n) & (i % n == 0) & ((i // n) % 2 == 1))


def resample_dead_neurons(
    params: dict,
    opt_state,
    dead_mask: jax.Array,  # bool [h], True = dead
    key: jax.Array,
) -> tuple[dict, object]:
    """Re-initialize dead latents of an sae_mlp and zero their Adam moments.

    Faithful to reference sae_mlp.py:103-176 including its quirks:
    - new encoder rows: Kaiming-uniform, row-normalized to the mean L2 norm of the LIVE
      encoder rows (torch rows [h, d] == our W_enc columns [d, h]).
    - new decoder entries: Kaiming-uniform draw whose rows (torch dim=1) are normalized
      to the mean of ``norm(W_dec[:, live], dim=1)`` — the reference's quirk of norming
      the act-axis rows ACROSS live latents (sae_mlp.py:118-120, which its own comment
      questions); dead columns are then spliced in and ALL columns renormalized to unit
      norm, so only the direction mix (not the scale) survives — replicated exactly.
    - b_enc[dead] = mean(|b_enc[live]|)  (sae_mlp.py:122-130)
    - Adam exp_avg / exp_avg_sq slices of dead latents are zeroed for W_enc, b_enc,
      W_dec (sae_mlp.py:148-176). Adam's step count is NOT reset (reference keeps it).
    If there are no live latents the norms fall back to 1 to avoid NaN.
    """
    w_enc, b_enc, w_dec = params["W_enc"], params["b_enc"], params["W_dec"]
    d, h = w_enc.shape
    live = ~dead_mask
    n_live = jnp.maximum(jnp.sum(live), 1)

    k_enc, k_dec = jax.random.split(key)

    # --- encoder weights: our W_enc[d, h] columns are torch's rows ---
    enc_norms = jnp.linalg.norm(w_enc, axis=0)  # [h]
    avg_l2_enc = jnp.where(
        jnp.any(live), jnp.sum(jnp.where(live, enc_norms, 0.0)) / n_live, 1.0
    )
    new_enc_t = kaiming_uniform(k_enc, (h, d), fan_in=d, dtype=w_enc.dtype)  # torch layout
    new_enc_t = new_enc_t / jnp.linalg.norm(new_enc_t, axis=1, keepdims=True) * avg_l2_enc
    new_w_enc = jnp.where(dead_mask[None, :], new_enc_t.T, w_enc)

    # --- encoder bias ---
    avg_abs_b = jnp.where(
        jnp.any(live), jnp.sum(jnp.where(live, jnp.abs(b_enc), 0.0)) / n_live, 0.0
    )
    new_b_enc = jnp.where(dead_mask, avg_abs_b, b_enc)

    # --- decoder weights: our W_dec[h, d] rows are torch's columns ---
    # reference quirk: mean over act-axis rows of norms across LIVE latents (dim=1 of
    # torch W_dec[:, live]) — i.e. per-act-dim norms over the live-latent axis.
    d_out = w_dec.shape[1]  # == d for sae_mlp; the transcoder decodes to another layer
    dec_live = jnp.where(live[:, None], w_dec, 0.0)  # [h, d_out]
    quirk_norms = jnp.linalg.norm(dec_live, axis=0)  # [d_out] — norm across live latents
    avg_l2_dec = jnp.where(jnp.any(live), jnp.mean(quirk_norms), 1.0)
    new_dec_t = kaiming_uniform(k_dec, (d_out, h), fan_in=h, dtype=w_dec.dtype)  # torch layout
    new_dec_t = new_dec_t / jnp.linalg.norm(new_dec_t, axis=1, keepdims=True) * avg_l2_dec
    new_w_dec = jnp.where(dead_mask[:, None], new_dec_t.T, w_dec)
    # renormalize ALL latent directions to unit norm (sae_mlp.py:141-143)
    new_w_dec = new_w_dec / jnp.linalg.norm(new_w_dec, axis=1, keepdims=True)

    new_params = dict(params)
    new_params.update(W_enc=new_w_enc, b_enc=new_b_enc, W_dec=new_w_dec)

    # --- zero Adam moments of the dead slices ---
    def zero_dead_moments(moments: dict) -> dict:
        out = dict(moments)
        if "W_enc" in out:
            out["W_enc"] = jnp.where(dead_mask[None, :], 0.0, out["W_enc"])
        if "b_enc" in out:
            out["b_enc"] = jnp.where(dead_mask, 0.0, out["b_enc"])
        if "W_dec" in out:
            out["W_dec"] = jnp.where(dead_mask[:, None], 0.0, out["W_dec"])
        return out

    def fix_state(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=s.count, mu=zero_dead_moments(s.mu), nu=zero_dead_moments(s.nu)
            )
        return s

    new_opt_state = jax.tree.map(
        fix_state, opt_state, is_leaf=lambda s: isinstance(s, optax.ScaleByAdamState)
    )
    return new_params, new_opt_state


def resample_dead_neurons_tp(
    params: dict,
    opt_state,
    dead_mask: jax.Array,  # bool [h_local], True = dead — the chip's latent shard
    key: jax.Array,  # REPLICATED across the mesh
    n_model: int,
    model_axis: str = "model",
) -> tuple[dict, object]:
    """resample_dead_neurons under a 'model'-sharded latent axis (shard_map body).

    Exact-parity construction: every chip draws the FULL global Kaiming matrices
    from the replicated key (the reference normalizes the decoder draw per act-dim
    row ACROSS the whole latent axis, resample_dead_neurons:87-88 — a global-h
    operation — so a per-shard draw could not match anyway; at production shapes the
    full draw is ~tens of MB, once every 2n steps) and slices its own latent rows,
    while the live-latent statistics psum over ``model_axis``. With the same key and
    dead mask this reproduces the single-device surgery bit-for-bit per shard
    (tests/test_tensor_parallel.py pins it across a resample boundary)."""
    w_enc, b_enc, w_dec = params["W_enc"], params["b_enc"], params["W_dec"]
    d, h_l = w_enc.shape
    h_g = h_l * n_model
    live = ~dead_mask
    n_live_g = jnp.maximum(jax.lax.psum(jnp.sum(live), model_axis), 1)
    any_live = jax.lax.psum(jnp.sum(live.astype(jnp.int32)), model_axis) > 0

    k_enc, k_dec = jax.random.split(key)
    k_idx = jax.lax.axis_index(model_axis)

    # --- encoder weights ---
    enc_norms = jnp.linalg.norm(w_enc, axis=0)  # [h_l]
    avg_l2_enc = jnp.where(
        any_live,
        jax.lax.psum(jnp.sum(jnp.where(live, enc_norms, 0.0)), model_axis) / n_live_g,
        1.0,
    )
    new_enc_t = kaiming_uniform(k_enc, (h_g, d), fan_in=d, dtype=w_enc.dtype)
    new_enc_t = new_enc_t / jnp.linalg.norm(new_enc_t, axis=1, keepdims=True) * avg_l2_enc
    new_enc_t = jax.lax.dynamic_slice_in_dim(new_enc_t, k_idx * h_l, h_l, 0)
    new_w_enc = jnp.where(dead_mask[None, :], new_enc_t.T, w_enc)

    # --- encoder bias ---
    avg_abs_b = jnp.where(
        any_live,
        jax.lax.psum(jnp.sum(jnp.where(live, jnp.abs(b_enc), 0.0)), model_axis)
        / n_live_g,
        0.0,
    )
    new_b_enc = jnp.where(dead_mask, avg_abs_b, b_enc)

    # --- decoder weights (reference quirk preserved: per-act-dim norms across the
    # GLOBAL live-latent axis, then mean) ---
    d_out = w_dec.shape[1]  # == d for sae_mlp; transcoders decode to another layer
    dec_live = jnp.where(live[:, None], w_dec, 0.0)  # [h_l, d_out]
    quirk_norms = jnp.sqrt(
        jax.lax.psum(jnp.sum(jnp.square(dec_live), axis=0), model_axis)
    )  # [d_out]
    avg_l2_dec = jnp.where(any_live, jnp.mean(quirk_norms), 1.0)
    new_dec_t = kaiming_uniform(k_dec, (d_out, h_g), fan_in=h_g, dtype=w_dec.dtype)
    new_dec_t = new_dec_t / jnp.linalg.norm(new_dec_t, axis=1, keepdims=True) * avg_l2_dec
    new_dec_t = jax.lax.dynamic_slice_in_dim(new_dec_t, k_idx * h_l, h_l, 1)
    new_w_dec = jnp.where(dead_mask[:, None], new_dec_t.T, w_dec)
    new_w_dec = new_w_dec / jnp.linalg.norm(new_w_dec, axis=1, keepdims=True)

    new_params = dict(params)
    new_params.update(W_enc=new_w_enc, b_enc=new_b_enc, W_dec=new_w_dec)

    def zero_dead_moments(moments: dict) -> dict:
        out = dict(moments)
        if "W_enc" in out:
            out["W_enc"] = jnp.where(dead_mask[None, :], 0.0, out["W_enc"])
        if "b_enc" in out:
            out["b_enc"] = jnp.where(dead_mask, 0.0, out["b_enc"])
        if "W_dec" in out:
            out["W_dec"] = jnp.where(dead_mask[:, None], 0.0, out["W_dec"])
        return out

    def fix_state(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=s.count, mu=zero_dead_moments(s.mu), nu=zero_dead_moments(s.nu)
            )
        return s

    new_opt_state = jax.tree.map(
        fix_state, opt_state, is_leaf=lambda s: isinstance(s, optax.ScaleByAdamState)
    )
    return new_params, new_opt_state


def resample_dead_neurons_crosscoder(
    params: dict,
    opt_state,
    dead_mask: jax.Array,  # bool [h], True = dead
    key: jax.Array,
) -> tuple[dict, object]:
    """Dead-latent surgery for the crosscoder's flat multi-layer layout
    (models/crosscoder.py: ``W_enc_i [d_i, h]``, ``b_enc [h]``,
    ``W_dec_i [h, d_i]``, ``b_dec_i``).

    Per layer, the sae_mlp recipe (resample_dead_neurons) applies to that
    layer's encoder/decoder slices — with ONE deliberate difference: dead
    decoder rows are re-drawn at the LIVE rows' mean norm of that layer and
    there is NO final unit renormalization. Crosscoder decoder norms are free
    parameters (they carry the per-layer feature-presence signal and weight the
    L1 term, models/crosscoder.crosscoder_loss_terms), so the reference's
    renorm-to-unit step (sae_mlp.py:141-143) would destroy exactly what the
    variant measures. Adam moments of every dead slice are zeroed across all
    per-layer entries.
    """
    from sparse_vision_tpu.models.crosscoder import crosscoder_num_layers

    n_layers = crosscoder_num_layers(params)
    live = ~dead_mask
    n_live = jnp.maximum(jnp.sum(live), 1)
    any_live = jnp.any(live)
    h = dead_mask.shape[0]
    keys = jax.random.split(key, 2 * n_layers)

    new_params = dict(params)
    b_enc = params["b_enc"]
    avg_abs_b = jnp.where(
        any_live, jnp.sum(jnp.where(live, jnp.abs(b_enc), 0.0)) / n_live, 0.0
    )
    new_params["b_enc"] = jnp.where(dead_mask, avg_abs_b, b_enc)

    for i in range(n_layers):
        w_enc = params[f"W_enc_{i}"]  # [d_i, h]
        w_dec = params[f"W_dec_{i}"]  # [h, d_i]
        d = w_enc.shape[0]
        enc_norms = jnp.linalg.norm(w_enc, axis=0)  # [h]
        avg_enc = jnp.where(
            any_live, jnp.sum(jnp.where(live, enc_norms, 0.0)) / n_live, 1.0
        )
        new_enc_t = kaiming_uniform(keys[2 * i], (h, d), fan_in=d,
                                    dtype=w_enc.dtype)
        new_enc_t = (new_enc_t / jnp.linalg.norm(new_enc_t, axis=1,
                                                 keepdims=True) * avg_enc)
        new_params[f"W_enc_{i}"] = jnp.where(dead_mask[None, :], new_enc_t.T,
                                             w_enc)

        dec_norms = jnp.linalg.norm(w_dec, axis=1)  # [h]
        avg_dec = jnp.where(
            any_live, jnp.sum(jnp.where(live, dec_norms, 0.0)) / n_live, 1.0
        )
        new_dec_t = kaiming_uniform(keys[2 * i + 1], (d, h), fan_in=h,
                                    dtype=w_dec.dtype)
        new_dec_t = (new_dec_t / jnp.linalg.norm(new_dec_t, axis=0,
                                                 keepdims=True) * avg_dec)
        new_params[f"W_dec_{i}"] = jnp.where(dead_mask[:, None], new_dec_t.T,
                                             w_dec)

    def zero_dead_moments(moments: dict) -> dict:
        out = dict(moments)
        if "b_enc" in out:
            out["b_enc"] = jnp.where(dead_mask, 0.0, out["b_enc"])
        for i in range(n_layers):
            ke, kd = f"W_enc_{i}", f"W_dec_{i}"
            if ke in out:
                out[ke] = jnp.where(dead_mask[None, :], 0.0, out[ke])
            if kd in out:
                out[kd] = jnp.where(dead_mask[:, None], 0.0, out[kd])
        return out

    def fix_state(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=s.count, mu=zero_dead_moments(s.mu),
                nu=zero_dead_moments(s.nu),
            )
        return s

    new_opt_state = jax.tree.map(
        fix_state, opt_state, is_leaf=lambda s: isinstance(s, optax.ScaleByAdamState)
    )
    return new_params, new_opt_state


def resample_dead_neurons_crosscoder_tp(
    params: dict,
    opt_state,
    dead_mask: jax.Array,  # bool [h_local], True = dead — the chip's latent shard
    key: jax.Array,  # REPLICATED across the mesh
    n_model: int,
    model_axis: str = "model",
) -> tuple[dict, object]:
    """resample_dead_neurons_crosscoder under a 'model'-sharded latent axis
    (shard_map body) — the resample_dead_neurons_tp construction: every chip
    draws the FULL global per-layer Kaiming matrices from the replicated key
    and slices its own latent rows (the per-latent normalizations slice
    cleanly), while live-latent statistics psum over ``model_axis``. With the
    same key and dead mask this reproduces the single-device crosscoder
    surgery bit-for-bit per shard. Decoder norms stay free (no unit renorm) —
    the crosscoder's diffing signal."""
    from sparse_vision_tpu.models.crosscoder import crosscoder_num_layers

    n_layers = crosscoder_num_layers(params)
    h_l = dead_mask.shape[0]
    h_g = h_l * n_model
    live = ~dead_mask
    n_live_g = jnp.maximum(jax.lax.psum(jnp.sum(live), model_axis), 1)
    any_live = jax.lax.psum(jnp.sum(live.astype(jnp.int32)), model_axis) > 0
    keys = jax.random.split(key, 2 * n_layers)
    k_idx = jax.lax.axis_index(model_axis)

    new_params = dict(params)
    b_enc = params["b_enc"]  # [h_l]
    avg_abs_b = jnp.where(
        any_live,
        jax.lax.psum(jnp.sum(jnp.where(live, jnp.abs(b_enc), 0.0)), model_axis)
        / n_live_g,
        0.0,
    )
    new_params["b_enc"] = jnp.where(dead_mask, avg_abs_b, b_enc)

    for i in range(n_layers):
        w_enc = params[f"W_enc_{i}"]  # [d_i, h_l]
        w_dec = params[f"W_dec_{i}"]  # [h_l, d_i]
        d = w_enc.shape[0]
        enc_norms = jnp.linalg.norm(w_enc, axis=0)  # [h_l]
        avg_enc = jnp.where(
            any_live,
            jax.lax.psum(jnp.sum(jnp.where(live, enc_norms, 0.0)), model_axis)
            / n_live_g,
            1.0,
        )
        new_enc_t = kaiming_uniform(keys[2 * i], (h_g, d), fan_in=d,
                                    dtype=w_enc.dtype)
        new_enc_t = (new_enc_t / jnp.linalg.norm(new_enc_t, axis=1,
                                                 keepdims=True) * avg_enc)
        new_enc_t = jax.lax.dynamic_slice_in_dim(new_enc_t, k_idx * h_l, h_l, 0)
        new_params[f"W_enc_{i}"] = jnp.where(dead_mask[None, :], new_enc_t.T,
                                             w_enc)

        dec_norms = jnp.linalg.norm(w_dec, axis=1)  # [h_l]
        avg_dec = jnp.where(
            any_live,
            jax.lax.psum(jnp.sum(jnp.where(live, dec_norms, 0.0)), model_axis)
            / n_live_g,
            1.0,
        )
        new_dec_t = kaiming_uniform(keys[2 * i + 1], (d, h_g), fan_in=h_g,
                                    dtype=w_dec.dtype)
        new_dec_t = (new_dec_t / jnp.linalg.norm(new_dec_t, axis=0,
                                                 keepdims=True) * avg_dec)
        new_dec_t = jax.lax.dynamic_slice_in_dim(new_dec_t, k_idx * h_l, h_l, 1)
        new_params[f"W_dec_{i}"] = jnp.where(dead_mask[:, None], new_dec_t.T,
                                             w_dec)

    def zero_dead_moments(moments: dict) -> dict:
        out = dict(moments)
        if "b_enc" in out:
            out["b_enc"] = jnp.where(dead_mask, 0.0, out["b_enc"])
        for i in range(n_layers):
            ke, kd = f"W_enc_{i}", f"W_dec_{i}"
            if ke in out:
                out[ke] = jnp.where(dead_mask[None, :], 0.0, out[ke])
            if kd in out:
                out[kd] = jnp.where(dead_mask[:, None], 0.0, out[kd])
        return out

    def fix_state(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=s.count, mu=zero_dead_moments(s.mu),
                nu=zero_dead_moments(s.nu),
            )
        return s

    new_opt_state = jax.tree.map(
        fix_state, opt_state, is_leaf=lambda s: isinstance(s, optax.ScaleByAdamState)
    )
    return new_params, new_opt_state
