"""Golden-value parity of metric reductions vs torch (reference: utils.py:1996-2069,
model_pipeline.py:690-714). NHWC here <-> NCHW in the reference."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sparse_vision_tpu.ops import metrics


def _sparsify(x, rng, frac=0.5):
    mask = rng.uniform(size=x.shape) < frac
    return np.where(mask, 0.0, x).astype(np.float32)


def test_measure_inactive_units_2d(rng):
    x = _sparsify(np.abs(rng.normal(size=(16, 32))), rng)
    dead, sparsity, freq = metrics.measure_inactive_units(jnp.asarray(x), expansion_factor=2)

    tb = torch.tensor(x) == 0
    t_dead = torch.all(tb, dim=0)
    t_freq = 1 - torch.mean(tb.float(), dim=0)
    n_active = 32 - torch.sum(tb, dim=1)
    t_sparsity = torch.mean(n_active / (32 / 2))

    np.testing.assert_array_equal(np.asarray(dead), t_dead.numpy())
    np.testing.assert_allclose(np.asarray(freq), t_freq.numpy(), rtol=1e-6)
    np.testing.assert_allclose(float(sparsity), t_sparsity.item(), rtol=1e-6)


def test_measure_inactive_units_conv(rng):
    # NHWC for us, NCHW for torch; a channel is inactive iff all H*W pixels are zero
    x_nhwc = _sparsify(np.abs(rng.normal(size=(8, 4, 4, 6))), rng, frac=0.9)
    dead, sparsity, freq = metrics.measure_inactive_units(jnp.asarray(x_nhwc), expansion_factor=3)

    x_nchw = torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)))
    tb = x_nchw == 0
    t_sample_inactive = torch.all(torch.all(tb, dim=3), dim=2)  # [B, C]
    t_dead = torch.all(t_sample_inactive, dim=0)
    t_freq = 1 - torch.mean(t_sample_inactive.float(), dim=0)
    n_active = 6 - torch.sum(t_sample_inactive, dim=1)
    t_sparsity = torch.mean(n_active / (6 / 3))

    np.testing.assert_array_equal(np.asarray(dead), t_dead.numpy())
    np.testing.assert_allclose(np.asarray(freq), t_freq.numpy(), rtol=1e-6)
    np.testing.assert_allclose(float(sparsity), t_sparsity.item(), rtol=1e-6)


def test_variance_explained_matches_torch(rng):
    x_nhwc = rng.normal(size=(8, 5, 5, 7)).astype(np.float32)
    r_nhwc = rng.normal(size=(8, 5, 5, 7)).astype(np.float32)
    ve = metrics.variance_explained(jnp.asarray(x_nhwc), jnp.asarray(r_nhwc))

    tx = torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)))
    tr = torch.tensor(np.transpose(r_nhwc, (0, 3, 1, 2)))
    t_ve = 1 - torch.mean(torch.var(tr, dim=(2, 3))) / torch.mean(torch.var(tx, dim=(2, 3)))
    np.testing.assert_allclose(float(ve), t_ve.item(), rtol=1e-5, atol=1e-6)

    x2 = rng.normal(size=(8, 16)).astype(np.float32)
    r2 = rng.normal(size=(8, 16)).astype(np.float32)
    ve2 = metrics.variance_explained(jnp.asarray(x2), jnp.asarray(r2))
    t_ve2 = 1 - torch.mean(torch.var(torch.tensor(r2), dim=1)) / torch.mean(
        torch.var(torch.tensor(x2), dim=1)
    )
    np.testing.assert_allclose(float(ve2), t_ve2.item(), rtol=1e-5)


def test_kld_matches_torch(rng):
    a = rng.normal(size=(16, 10)).astype(np.float32)
    b = rng.normal(size=(16, 10)).astype(np.float32)
    # reference: F.kl_div(log_softmax(original), log_softmax(modified), 'sum', log_target)/B
    t = (
        F.kl_div(
            F.log_softmax(torch.tensor(a), dim=1),
            F.log_softmax(torch.tensor(b), dim=1),
            reduction="sum",
            log_target=True,
        ).item()
        / 16
    )
    j = metrics.kld_original_vs_modified(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(float(j), t, rtol=5e-5)


def test_perc_same_and_accuracy(rng):
    a = rng.normal(size=(32, 10)).astype(np.float32)
    b = a.copy()
    b[:8] = rng.normal(size=(8, 10))
    psc = metrics.perc_same_classification(jnp.asarray(a), jnp.asarray(b))
    t = (torch.argmax(torch.tensor(a), 1) == torch.argmax(torch.tensor(b), 1)).float().mean()
    np.testing.assert_allclose(float(psc), t.item())

    tgt = np.argmax(a, axis=1)
    assert float(metrics.accuracy(jnp.asarray(a), jnp.asarray(tgt))) == 1.0


def test_dead_accumulator_is_running_and():
    a = jnp.array([True, True, False])
    b = jnp.array([True, False, False])
    acc = metrics.update_dead_accumulator(None, a)
    acc = metrics.update_dead_accumulator(acc, b)
    np.testing.assert_array_equal(np.asarray(acc), [True, False, False])
