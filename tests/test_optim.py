"""Optimizer parity: ConstrainedAdam vs a torch implementation of the published
algorithm (reference: utils.py:50-97), plus unit-norm invariants and StepLR."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from sparse_vision_tpu.models import sae
from sparse_vision_tpu.ops import optim


class TorchConstrainedAdam(torch.optim.Adam):
    """The published constrained-Adam algorithm (saprmarks/dictionary_learning, as used
    at reference utils.py:50-82): project away the decoder-direction-parallel gradient
    component before the step, renormalize the directions after it. Here the constrained
    parameter is W_dec [h, d] with unit-norm ROWS (= the reference's columns)."""

    def __init__(self, params, constrained_param, lr):
        super().__init__(params, lr=lr, betas=(0.9, 0.999))
        self.p = constrained_param

    @torch.no_grad()
    def step(self, closure=None):
        if self.p.grad is not None:
            normed = self.p / self.p.norm(dim=1, keepdim=True)
            self.p.grad -= (self.p.grad * normed).sum(dim=1, keepdim=True) * normed
        super().step(closure=closure)
        self.p /= self.p.norm(dim=1, keepdim=True)


def _sae_loss_torch(params, x, lam):
    x_cent = x - params["b_dec"]
    post = torch.relu(x_cent @ params["W_enc"] + params["b_enc"])
    recon = post @ params["W_dec"] + params["b_dec"]
    return torch.mean((recon - x) ** 2) + lam * torch.mean(torch.abs(post))


def _sae_loss_jax(params, x, lam):
    post, recon, _ = sae.sae_mlp_apply(params, x)
    terms_rec = jnp.mean((recon - x) ** 2)
    return terms_rec + lam * jnp.mean(jnp.abs(post))


def test_constrained_adam_matches_torch_over_steps(rng):
    d, k, t, lam, lr = 8, 2, 32, 0.5, 1e-2
    jparams = sae.init_sae_mlp(jax.random.key(0), d, k)
    tparams = {
        n: torch.tensor(np.asarray(v), requires_grad=True) for n, v in jparams.items()
    }
    topt = TorchConstrainedAdam(list(tparams.values()), tparams["W_dec"], lr=lr)

    tx = optim.get_optimizer("constrained_adam", lr)
    opt_state = tx.init(jparams)

    for step in range(5):
        x = rng.normal(size=(t, d)).astype(np.float32)

        loss_t = _sae_loss_torch(tparams, torch.tensor(x), lam)
        topt.zero_grad()
        loss_t.backward()
        topt.step()

        grads = jax.grad(_sae_loss_jax)(jparams, jnp.asarray(x), lam)
        updates, opt_state = tx.update(grads, opt_state, jparams)
        jparams = optax.apply_updates(jparams, updates)

    for n in jparams:
        np.testing.assert_allclose(
            np.asarray(jparams[n]), tparams[n].detach().numpy(), atol=2e-5,
            err_msg=f"param {n} diverged",
        )
    # decoder rows stay unit norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(jparams["W_dec"]), axis=1), 1.0, atol=1e-6
    )


def test_adam_nonstandard_beta2_matches_torch(rng):
    """'adam' uses betas (0.9, 0.9999) (reference utils.py:86)."""
    w = rng.normal(size=(4, 4)).astype(np.float32)
    tw = torch.tensor(w, requires_grad=True)
    topt = torch.optim.Adam([tw], lr=1e-3, betas=(0.9, 0.9999))

    tx = optim.get_optimizer("adam", 1e-3)
    jp = jnp.asarray(w)
    st = tx.init(jp)
    for _ in range(3):
        g = rng.normal(size=(4, 4)).astype(np.float32)
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()
        u, st = tx.update(jnp.asarray(g), st, jp)
        jp = optax.apply_updates(jp, u)
    np.testing.assert_allclose(np.asarray(jp), tw.detach().numpy(), atol=1e-6)


def test_sgd_with_step_lr_schedule(rng):
    """StepLR(7, 0.1): lr scales by 0.1 every 7 epochs (utils.py:89-93)."""
    w = jnp.ones((3,))
    tx = optim.get_optimizer("sgd_w_scheduler", 1.0)
    st = tx.init(w)
    g = jnp.ones((3,))

    u, st = tx.update(g, st, w)
    np.testing.assert_allclose(np.asarray(u), -1.0)

    for _ in range(7):
        st = optim.advance_epoch(st)
    # momentum trace: second update with same grad has trace = 0.9*1 + 1 = 1.9
    u, st = tx.update(g, st, w)
    np.testing.assert_allclose(np.asarray(u), -0.1 * 1.9, rtol=1e-6)


def test_project_away_parallel_grad_property(rng):
    w = rng.normal(size=(5, 7)).astype(np.float32)
    g = rng.normal(size=(5, 7)).astype(np.float32)
    pg = optim.project_away_parallel_grad(jnp.asarray(g), jnp.asarray(w))
    # projected grad is orthogonal to each row direction
    dots = np.sum(np.asarray(pg) * (w / np.linalg.norm(w, axis=1, keepdims=True)), axis=1)
    np.testing.assert_allclose(dots, 0.0, atol=1e-5)
