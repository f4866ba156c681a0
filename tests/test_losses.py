"""Golden-value parity of loss functions vs. small torch fixtures
(reference semantics: losses/sparse_loss.py, utils.py:99-137, utils.py:2467-2475)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sparse_vision_tpu.ops import losses


def test_rmse_nrmse_matches_torch(rng):
    decoded = rng.normal(size=(32, 16)).astype(np.float32)
    targets = rng.normal(size=(32, 16)).astype(np.float32)

    # torch reference computation (sparse_loss.py:4-21)
    td, tt = torch.tensor(decoded), torch.tensor(targets)
    sq = torch.square(td - tt)
    sample_mse = torch.mean(sq, dim=0)
    sample_range = torch.max(tt, dim=0)[0] - torch.min(tt, dim=0)[0]
    t_rmse = torch.mean(torch.sqrt(sample_mse))
    t_nrmse = torch.mean(torch.sqrt(sample_mse) / sample_range)

    rmse, nrmse = losses.rmse_nrmse(jnp.asarray(decoded), jnp.asarray(targets))
    np.testing.assert_allclose(float(rmse), t_rmse.item(), rtol=1e-5)
    np.testing.assert_allclose(float(nrmse), t_nrmse.item(), rtol=1e-5)


def test_sae_loss_terms_matches_torch(rng):
    enc = np.abs(rng.normal(size=(32, 64))).astype(np.float32)
    dec = rng.normal(size=(32, 16)).astype(np.float32)
    tgt = rng.normal(size=(32, 16)).astype(np.float32)
    lam = 5.0

    t_rec = F.mse_loss(torch.tensor(dec), torch.tensor(tgt))
    t_l1 = torch.mean(torch.abs(torch.tensor(enc)))
    t_total = t_rec + lam * t_l1

    terms = losses.sae_loss_terms(jnp.asarray(enc), jnp.asarray(dec), jnp.asarray(tgt), lam)
    np.testing.assert_allclose(float(terms["rec_loss"]), t_rec.item(), rtol=1e-5)
    np.testing.assert_allclose(float(terms["l1_loss"]), t_l1.item(), rtol=1e-5)
    np.testing.assert_allclose(float(terms["loss"]), t_total.item(), rtol=1e-5)
    assert float(terms["aux_loss"]) == 0.0


def test_gated_sae_loss_matches_torch(rng):
    relu_pi = np.abs(rng.normal(size=(32, 64))).astype(np.float32)
    via_gate = rng.normal(size=(32, 16)).astype(np.float32)
    dec = rng.normal(size=(32, 16)).astype(np.float32)
    tgt = rng.normal(size=(32, 16)).astype(np.float32)
    lam = 0.1

    t_rec = F.mse_loss(torch.tensor(dec), torch.tensor(tgt))
    t_l1 = torch.mean(torch.abs(torch.tensor(relu_pi)))
    t_aux = F.mse_loss(torch.tensor(via_gate), torch.tensor(tgt))
    t_total = t_rec + lam * t_l1 + t_aux

    terms = losses.gated_sae_loss_terms(
        jnp.asarray(relu_pi), jnp.asarray(via_gate), jnp.asarray(dec), jnp.asarray(tgt), lam
    )
    np.testing.assert_allclose(float(terms["loss"]), t_total.item(), rtol=1e-5)
    np.testing.assert_allclose(float(terms["aux_loss"]), t_aux.item(), rtol=1e-5)


def test_cross_entropy_matches_torch(rng):
    logits = rng.normal(size=(16, 10)).astype(np.float32)
    targets = rng.integers(0, 10, size=(16,))
    t = F.cross_entropy(torch.tensor(logits), torch.tensor(targets))
    j = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(j), t.item(), rtol=1e-5)


def test_negative_log_likelihood_matches_reference_semantics(rng):
    probs = rng.uniform(0.01, 1.0, size=(16, 10)).astype(np.float32)
    probs = probs / probs.sum(axis=1, keepdims=True)
    targets = rng.integers(0, 10, size=(16,))
    # reference CustomCrossEntropyLoss (utils.py:113-125)
    tp = torch.tensor(probs)
    tc = torch.gather(tp, 1, torch.tensor(targets).unsqueeze(1)).squeeze(1)
    t = torch.mean(-torch.log(tc + 1e-40))
    j = losses.negative_log_likelihood(jnp.asarray(probs), jnp.asarray(targets))
    np.testing.assert_allclose(float(j), t.item(), rtol=1e-5)
