"""Streaming top-k merge parity vs the reference's concat+topk+gather semantics
(utils.py:1445-1481), validated against a plain numpy oracle over the full stream."""

import jax
import jax.numpy as jnp
import numpy as np

from sparse_vision_tpu.ops.topk import init_topk, merge_topk_states, update_topk


def _stream_oracle(batches, filenames, k, largest):
    all_vals = np.concatenate(batches, axis=0)  # [N, U]
    all_fn = np.concatenate(filenames, axis=0)  # [N]
    order = np.argsort(-all_vals if largest else all_vals, axis=0, kind="stable")[:k]
    vals = np.take_along_axis(all_vals, order, axis=0)
    ds_idx = order
    fn_idx = all_fn[order]
    return vals, ds_idx, fn_idx


def test_streaming_topk_matches_oracle(rng):
    k, u, b, n_batches = 5, 7, 8, 6
    batches = [rng.normal(size=(b, u)).astype(np.float32) for _ in range(n_batches)]
    filenames = [rng.integers(0, 10000, size=(b,)).astype(np.int32) for _ in range(n_batches)]

    for largest in (True, False):
        state = init_topk(k, u, largest=largest)
        for i, (vals, fns) in enumerate(zip(batches, filenames)):
            state = update_topk(state, jnp.asarray(vals), jnp.int32(i * b), jnp.asarray(fns))
        o_vals, o_ds, o_fn = _stream_oracle(batches, filenames, k, largest)
        np.testing.assert_allclose(np.asarray(state.values), o_vals, rtol=1e-6)
        # values may tie; compare values gathered at our indices instead of raw indices
        flat = np.concatenate(batches, axis=0)
        picked = np.take_along_axis(flat, np.asarray(state.dataset_indices), axis=0)
        np.testing.assert_allclose(picked, o_vals, rtol=1e-6)
        fn_all = np.concatenate(filenames, axis=0)
        picked_fn = fn_all[np.asarray(state.dataset_indices)]
        np.testing.assert_array_equal(picked_fn, np.asarray(state.filename_indices))


def test_topk_before_k_samples_keeps_sentinels(rng):
    k, u, b = 10, 3, 4
    state = init_topk(k, u, largest=True)
    vals = rng.normal(size=(b, u)).astype(np.float32)
    fns = np.arange(b, dtype=np.int32)
    state = update_topk(state, jnp.asarray(vals), jnp.int32(0), jnp.asarray(fns))
    # 4 real entries, 6 sentinels (-inf / index -1)
    assert int(np.sum(np.asarray(state.dataset_indices) >= 0)) == b * u
    assert np.all(np.isneginf(np.sort(np.asarray(state.values), axis=0)[: k - b]))


def test_merge_topk_states_associative(rng):
    k, u, b = 4, 5, 16
    v1 = rng.normal(size=(b, u)).astype(np.float32)
    v2 = rng.normal(size=(b, u)).astype(np.float32)
    fn = np.arange(b, dtype=np.int32)

    s1 = update_topk(init_topk(k, u), jnp.asarray(v1), jnp.int32(0), jnp.asarray(fn))
    s2 = update_topk(init_topk(k, u), jnp.asarray(v2), jnp.int32(b), jnp.asarray(fn + b))
    merged = merge_topk_states(s1, s2)

    seq = update_topk(s1, jnp.asarray(v2), jnp.int32(b), jnp.asarray(fn + b))
    np.testing.assert_allclose(np.asarray(merged.values), np.asarray(seq.values), rtol=1e-6)


def test_topk_state_is_jittable():
    """largest is pytree aux data, so the state passes through jit/scan unchanged."""
    state = init_topk(3, 4, largest=True)

    @jax.jit
    def step(s, acts, start, fn):
        return update_topk(s, acts, start, fn)

    acts = jnp.arange(8.0).reshape(2, 4)
    s2 = step(state, acts, jnp.int32(0), jnp.zeros(2, jnp.int32))
    assert s2.largest is True
    assert float(s2.values[0, 0]) == 4.0  # larger row wins

    def body(s, a):
        return update_topk(s, a, jnp.int32(0), jnp.zeros(2, jnp.int32)), 0

    s3, _ = jax.lax.scan(body, state, jnp.stack([acts, acts + 1]))
    assert s3.largest is True
