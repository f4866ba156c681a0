"""Dead-neuron resample schedule arithmetic and functional surgery
(reference: model_pipeline.py:771-794 + sae_mlp.py:79-184)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sparse_vision_tpu.models import sae
from sparse_vision_tpu.ops import optim, resample


def test_schedule_matches_reference_arithmetic():
    """For n=100: resample at 201, 401, 601...; reset measurement at 100, 300, 500...
    (the reference documents this exact example at model_pipeline.py:775-780 and
    verifies it in supplementary reinitalize_dead_neurons_times.py)."""
    n = 100
    resample_steps = [
        i for i in range(1, 1001) if bool(resample.should_resample(jnp.int32(i), n))
    ]
    reset_steps = [
        i for i in range(1, 1001) if bool(resample.should_reset_measurement(jnp.int32(i), n))
    ]
    assert resample_steps == [201, 401, 601, 801]
    assert reset_steps == [100, 300, 500, 700, 900]
    assert not bool(resample.should_resample(jnp.int32(1), n))


def test_resample_surgery_properties(rng):
    d, k = 8, 4
    h = d * k
    params = sae.init_sae_mlp(jax.random.key(0), d, k)
    # make biases nonzero so the live-mean is meaningful
    params["b_enc"] = jnp.asarray(rng.normal(size=(h,)).astype(np.float32))

    tx = optim.get_optimizer("constrained_adam", 1e-3)
    opt_state = tx.init(params)
    # take one step so moments are nonzero
    g = jax.tree.map(lambda p: jnp.ones_like(p), params)
    updates, opt_state = tx.update(g, opt_state, params)
    params = optax.apply_updates(params, updates)

    dead = np.zeros(h, dtype=bool)
    dead[[3, 10, 17]] = True
    dead_j = jnp.asarray(dead)

    new_params, new_opt_state = resample.resample_dead_neurons(
        params, opt_state, dead_j, jax.random.key(1)
    )

    live = ~dead
    # live latents untouched in encoder
    np.testing.assert_array_equal(
        np.asarray(new_params["W_enc"])[:, live], np.asarray(params["W_enc"])[:, live]
    )
    np.testing.assert_array_equal(
        np.asarray(new_params["b_enc"])[live], np.asarray(params["b_enc"])[live]
    )
    # dead encoder columns changed and have the mean live L2 norm
    enc_norms = np.linalg.norm(np.asarray(params["W_enc"]), axis=0)
    avg = enc_norms[live].mean()
    new_dead_norms = np.linalg.norm(np.asarray(new_params["W_enc"])[:, dead], axis=0)
    np.testing.assert_allclose(new_dead_norms, avg, rtol=1e-5)
    # dead bias = mean |b_live|
    np.testing.assert_allclose(
        np.asarray(new_params["b_enc"])[dead],
        np.abs(np.asarray(params["b_enc"])[live]).mean(),
        rtol=1e-5,
    )
    # all decoder rows unit norm after surgery (sae_mlp.py:141-143)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(new_params["W_dec"]), axis=1), 1.0, atol=1e-6
    )
    # dead decoder rows actually changed
    assert not np.allclose(
        np.asarray(new_params["W_dec"])[dead], np.asarray(params["W_dec"])[dead]
    )

    # Adam moments zeroed exactly on dead slices
    def moments(state):
        adam = [s for s in jax.tree.leaves(state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)) if isinstance(s, optax.ScaleByAdamState)]
        assert adam
        return adam[0]

    m = moments(new_opt_state)
    assert np.all(np.asarray(m.mu["W_enc"])[:, dead] == 0)
    assert np.all(np.asarray(m.nu["W_enc"])[:, dead] == 0)
    assert np.all(np.asarray(m.mu["b_enc"])[dead] == 0)
    assert np.all(np.asarray(m.mu["W_dec"])[dead, :] == 0)
    # live moments untouched
    m_old = moments(opt_state)
    np.testing.assert_array_equal(
        np.asarray(m.mu["W_enc"])[:, live], np.asarray(m_old.mu["W_enc"])[:, live]
    )


def test_resample_no_dead_is_noop_on_params(rng):
    params = sae.init_sae_mlp(jax.random.key(2), 8, 2)
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    opt_state = tx.init(params)
    dead = jnp.zeros(16, dtype=bool)
    new_params, _ = resample.resample_dead_neurons(params, opt_state, dead, jax.random.key(3))
    for n in params:
        np.testing.assert_allclose(
            np.asarray(new_params[n]), np.asarray(params[n]), atol=1e-6
        )


def test_resample_under_jit_cond(rng):
    """The resample must be executable under lax.cond inside jit (our schedule runs
    on-device, unlike the reference's host-side surgery)."""
    d, k = 4, 2
    h = d * k
    params = sae.init_sae_mlp(jax.random.key(4), d, k)
    tx = optim.get_optimizer("constrained_adam", 1e-3)
    opt_state = tx.init(params)
    dead = jnp.zeros(h, dtype=bool).at[2].set(True)

    @jax.jit
    def maybe_resample(step, params, opt_state, dead, key):
        return jax.lax.cond(
            resample.should_resample(step, 10),
            lambda: resample.resample_dead_neurons(params, opt_state, dead, key),
            lambda: (params, opt_state),
        )

    p1, _ = maybe_resample(jnp.int32(21), params, opt_state, dead, jax.random.key(5))
    assert not np.allclose(np.asarray(p1["W_dec"])[2], np.asarray(params["W_dec"])[2])
    p2, _ = maybe_resample(jnp.int32(22), params, opt_state, dead, jax.random.key(5))
    np.testing.assert_array_equal(np.asarray(p2["W_dec"]), np.asarray(params["W_dec"]))
