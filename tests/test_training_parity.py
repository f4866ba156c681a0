"""FULL-TRAJECTORY training parity vs a reference-faithful torch implementation.

The strongest parity evidence for the NMSE/L0 criterion: a torch SAE + ConstrainedAdam
built exactly to the reference's semantics (sae_mlp.py:42-53 forward,
sparse_loss.py:30-61 loss, utils.py:50-82 optimizer: project decoder-column-parallel
gradient before the Adam step, renormalize columns after) is trained for 60 steps on
identical data from identical initial parameters, against BOTH our stock jitted step
and the fused Pallas step. Losses must track within f32 drift and final parameters
must match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sparse_vision_tpu.models.sae import init_sae_mlp
from sparse_vision_tpu.ops import optim
from sparse_vision_tpu.train.steps import (
    init_sae_train_state,
    make_sae_train_step_from_acts,
)

C, K, T = 64, 4, 256
LAMBDA = 0.5
LR = 1e-3
STEPS = 60


class TorchSae(torch.nn.Module):
    """Reference SaeMLP semantics (sae_mlp.py:26-53)."""

    def __init__(self, w_enc, b_enc, w_dec, b_dec):
        super().__init__()
        self.encoder = torch.nn.Linear(C, C * K)
        self.decoder = torch.nn.Linear(C * K, C)
        with torch.no_grad():
            self.encoder.weight.copy_(torch.tensor(np.asarray(w_enc).T))
            self.encoder.bias.copy_(torch.tensor(np.asarray(b_enc)))
            self.decoder.weight.copy_(torch.tensor(np.asarray(w_dec).T))
            self.decoder.bias.copy_(torch.tensor(np.asarray(b_dec)))

    def forward(self, x):
        x_cent = x - self.decoder.bias
        pre = self.encoder(x_cent)
        post = torch.relu(pre)
        recon = self.decoder(post)
        return post, recon


class TorchConstrainedAdam(torch.optim.Adam):
    """Reference ConstrainedAdam (utils.py:50-82)."""

    def __init__(self, params, constrained_param, lr):
        super().__init__(params, lr=lr, betas=(0.9, 0.999))
        self.p = constrained_param

    def step(self, closure=None):
        with torch.no_grad():
            if self.p.grad is not None:
                normed = self.p / self.p.norm(dim=0, keepdim=True)
                self.p.grad -= (self.p.grad * normed).sum(dim=0, keepdim=True) * normed
        super().step(closure=closure)
        with torch.no_grad():
            self.p /= self.p.norm(dim=0, keepdim=True)


def _torch_trajectory(params0, batches):
    sae = TorchSae(params0["W_enc"], params0["b_enc"], params0["W_dec"], params0["b_dec"])
    opt = TorchConstrainedAdam(sae.parameters(), sae.decoder.weight, lr=LR)
    losses = []
    for x in batches:
        xt = torch.tensor(x)
        post, recon = sae(xt)
        rec = torch.mean((recon - xt) ** 2)
        l1 = torch.mean(torch.abs(post))
        loss = rec + LAMBDA * l1
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    final = {
        "W_enc": sae.encoder.weight.detach().numpy().T,
        "b_enc": sae.encoder.bias.detach().numpy(),
        "W_dec": sae.decoder.weight.detach().numpy().T,
        "b_dec": sae.decoder.bias.detach().numpy(),
    }
    return losses, final


@pytest.mark.parametrize("fused", [False, True])
def test_training_trajectory_matches_torch(fused):
    params0 = init_sae_mlp(jax.random.key(0), C, K)
    rng = np.random.default_rng(0)
    batches = [rng.normal(size=(T, C)).astype(np.float32) for _ in range(STEPS)]
    golden_losses, golden_final = _torch_trajectory(params0, batches)

    tx = optim.get_optimizer("constrained_adam", LR)
    ts = init_sae_train_state(params0, tx, C * K)
    kwargs = dict(fused=fused)
    if fused:
        kwargs["fused_opts"] = dict(
            tile_t=64, tile_h=128, compute_dtype=jnp.float32, interpret=True
        )
    # dead_neurons_steps large: no resample inside the comparison window
    step = make_sae_train_step_from_acts("sae_mlp", LAMBDA, tx, 10_000, K, **kwargs)

    losses = []
    for x in batches:
        ts, m = step(ts, jnp.asarray(x))
        losses.append(float(m["sae_loss"]))

    np.testing.assert_allclose(losses, golden_losses, rtol=2e-4)
    for k in params0:
        np.testing.assert_allclose(
            np.asarray(ts.params[k]), golden_final[k], rtol=2e-3, atol=2e-5,
            err_msg=f"final {k} ({'fused' if fused else 'stock'})",
        )
