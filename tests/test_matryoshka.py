"""Matryoshka SAE (beyond-reference variant; Bussmann et al. 2024): prefix-loss
math golden, gradient structure, training, and Pipeline e2e."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparse_vision_tpu.models.sae import (
    init_sae,
    matryoshka_prefix_counts,
    matryoshka_sae_apply,
    sae_inference_and_loss,
)


def test_prefix_counts():
    assert matryoshka_prefix_counts(128, (0.0625, 0.25, 1.0)) == (8, 32, 128)
    assert matryoshka_prefix_counts(10, (1.0,)) == (10,)
    # last prefix is forced to the full dictionary
    assert matryoshka_prefix_counts(100, (0.5, 0.9))[-1] == 100
    with pytest.raises(ValueError):
        matryoshka_prefix_counts(100, (0.5, 0.5, 1.0))  # duplicate counts
    with pytest.raises(ValueError):
        matryoshka_prefix_counts(100, (0.0, 1.0))


def test_loss_matches_manual_numpy(rng):
    d, exp, t = 16, 4, 64
    h = d * exp
    params = init_sae("matryoshka_sae", jax.random.key(0), d, exp)
    x = jnp.asarray(rng.normal(size=(t, d)), jnp.float32)
    lam = 0.3
    fracs = (0.25, 0.5, 1.0)
    out = sae_inference_and_loss("matryoshka_sae", params, x, lam,
                                 matryoshka_prefixes=fracs)

    W_enc, b_enc = np.asarray(params["W_enc"]), np.asarray(params["b_enc"])
    W_dec, b_dec = np.asarray(params["W_dec"]), np.asarray(params["b_dec"])
    xn = np.asarray(x)
    post = np.maximum((xn - b_dec) @ W_enc + b_enc, 0.0)
    mses = []
    for m in (h // 4, h // 2, h):
        rec = post[:, :m] @ W_dec[:m] + b_dec
        mses.append(np.mean((rec - xn) ** 2))
    expected = np.mean(mses) + lam * np.mean(np.abs(post))
    np.testing.assert_allclose(float(out["loss"]), expected, rtol=1e-5)
    # rec_loss reports the FULL-dictionary MSE; decomposition sums to the loss
    np.testing.assert_allclose(float(out["rec_loss"]), mses[-1], rtol=1e-5)
    np.testing.assert_allclose(
        float(out["rec_loss"]) + lam * float(out["l1_loss"]) + float(out["aux_loss"]),
        expected, rtol=1e-5,
    )


def test_gradient_structure_prefix_rows(rng):
    """Decoder rows OUTSIDE the first prefix receive gradient only from the
    larger-prefix reconstruction terms — the nesting that makes early latents
    carry coarse features. With prefixes (0.5, 1.0): d loss/d W_dec[m:] must
    equal the gradient of (1/2)*MSE_full alone."""
    d, exp, t = 8, 4, 32
    h = d * exp
    m = h // 2
    params = init_sae("matryoshka_sae", jax.random.key(0), d, exp)
    x = jnp.asarray(rng.normal(size=(t, d)), jnp.float32)

    def loss(p):
        return sae_inference_and_loss("matryoshka_sae", p, x, 0.0,
                                      matryoshka_prefixes=(0.5, 1.0))["loss"]

    def full_only(p):
        post, recons = None, None
        counts = (m, h)
        post, rec_full, _, recons = matryoshka_sae_apply(p, x, counts)
        return 0.5 * jnp.mean(jnp.square(recons[-1] - x))

    g = jax.grad(loss)(params)["W_dec"]
    g_full = jax.grad(full_only)(params)["W_dec"]
    np.testing.assert_allclose(np.asarray(g[m:]), np.asarray(g_full[m:]),
                               rtol=1e-5, atol=1e-8)
    # rows INSIDE the prefix also accumulate the small-prefix term
    assert not np.allclose(np.asarray(g[:m]), np.asarray(g_full[:m]))


def test_training_reduces_loss(rng):
    from sparse_vision_tpu.ops import optim
    from sparse_vision_tpu.train.steps import (
        init_sae_train_state,
        make_sae_train_step_from_acts,
    )

    d, exp = 16, 4
    acts = jnp.asarray(rng.normal(size=(1024, d)), jnp.float32)
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    ts = init_sae_train_state(
        init_sae("matryoshka_sae", jax.random.key(0), d, exp), tx, d * exp)
    step = make_sae_train_step_from_acts(
        "matryoshka_sae", 0.1, tx, 1000, exp, matryoshka_prefixes=(0.25, 1.0))
    m0 = None
    for _ in range(40):
        ts, m = step(ts, acts)
        if m0 is None:
            m0 = {k: float(v) for k, v in m.items()}
    assert float(m["sae_loss"]) < m0["sae_loss"]
    assert float(m["sae_rec_loss"]) < m0["sae_rec_loss"]


def test_pipeline_e2e(tmp_path):
    from sparse_vision_tpu.config import RunConfig
    from sparse_vision_tpu.train.pipeline import Pipeline

    cfg = RunConfig(
        model_name="custom_mlp_9", sae_layer="fc1", dataset_name="synthetic",
        directory_path=str(tmp_path), sae_model_name="matryoshka_sae",
        sae_matryoshka_prefixes="0.25,1.0", sae_epochs=1, sae_batch_size=64,
        batch_size=64, sae_expansion_factor=2, dead_neurons_steps=100,
        use_activation_cache=True, cache_tokens_per_step=512, log_every=1000,
    )
    res = Pipeline(cfg).run()
    assert res and np.isfinite(res["sae_rec_loss"])
    # decomposition sums to the trained objective (aux may be negative early:
    # a random larger dictionary can reconstruct WORSE than its own prefix)
    np.testing.assert_allclose(
        res["sae_rec_loss"] + 0.1 * res["sae_l1_loss"] + res["sae_aux_loss"],
        res["sae_loss"], rtol=1e-4,
    )
