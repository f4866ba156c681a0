"""Property-based tests (hypothesis): randomized shapes/values against independent
oracles for the stateful streaming ops and the optimizer invariant."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
from hypothesis import given, settings, strategies as st

from sparse_vision_tpu.ops.histograms import init_histogram, update_histogram
from sparse_vision_tpu.ops.optim import get_optimizer
from sparse_vision_tpu.ops.topk import init_topk, update_topk


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    k=st.integers(1, 6),
    units=st.integers(1, 5),
    batches=st.lists(st.integers(1, 7), min_size=1, max_size=5),
    largest=st.booleans(),
)
def test_streaming_topk_matches_full_sort(seed, k, units, batches, largest):
    rng = np.random.default_rng(seed)
    state = init_topk(k, units, largest=largest)
    all_vals, all_fn = [], []
    start = 0
    for b in batches:
        vals = rng.normal(size=(b, units)).astype(np.float32)
        fn = rng.integers(0, 1000, b).astype(np.int32)
        state = update_topk(state, jnp.asarray(vals), jnp.int32(start), jnp.asarray(fn))
        all_vals.append(vals)
        all_fn.append(fn)
        start += b
    full = np.concatenate(all_vals, axis=0)
    n = full.shape[0]
    kk = min(k, n)
    order = np.argsort(-full if largest else full, axis=0, kind="stable")[:kk]
    expected = np.take_along_axis(full, order, axis=0)
    got = np.asarray(state.values)[:kk]
    # compare VALUE multisets per unit (ties make index order ambiguous)
    for u in range(units):
        np.testing.assert_allclose(np.sort(got[:, u]), np.sort(expected[:, u]),
                                   rtol=1e-6)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    bins=st.integers(1, 12),
    units=st.integers(1, 4),
    n=st.integers(1, 64),
    lo=st.floats(-3, 0),
    span=st.floats(0.1, 4),
)
def test_streaming_histogram_matches_torch_histc(seed, bins, units, n, lo, span):
    rng = np.random.default_rng(seed)
    mins = np.full(units, lo, np.float32)
    maxs = np.full(units, lo + span, np.float32)
    acts = rng.uniform(lo - 1, lo + span + 1, (n, units)).astype(np.float32)
    state = init_histogram(bins, jnp.asarray(mins), jnp.asarray(maxs))
    state = update_histogram(state, jnp.asarray(acts))
    for u in range(units):
        golden = torch.histc(torch.tensor(acts[:, u]), bins=bins,
                             min=float(mins[u]), max=float(maxs[u])).numpy()
        np.testing.assert_allclose(np.asarray(state.counts[:, u]), golden,
                                   err_msg=f"unit {u}")


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 10_000), d=st.integers(2, 16), h=st.integers(2, 24),
       steps=st.integers(1, 4))
def test_constrained_adam_preserves_unit_decoder_rows(seed, d, h, steps):
    """Invariant from the reference's ConstrainedAdam (utils.py:50-82): after every
    step, every decoder direction has exactly unit norm."""
    key = jax.random.key(seed)
    k1, k2 = jax.random.split(key)
    w = jax.random.normal(k1, (h, d))
    params = {"W_dec": w / jnp.linalg.norm(w, axis=-1, keepdims=True),
              "b_enc": jnp.zeros((h,))}
    tx = get_optimizer("constrained_adam", 1e-2)
    opt_state = tx.init(params)
    import optax

    for i in range(steps):
        grads = jax.tree.map(
            lambda p: jax.random.normal(jax.random.fold_in(k2, i), p.shape), params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        norms = np.asarray(jnp.linalg.norm(params["W_dec"], axis=-1))
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
