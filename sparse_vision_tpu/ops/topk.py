"""Streaming per-unit top-k / bottom-k activating samples.

Reference semantics (utils.py:1445-1481 get_top_k_samples + model_pipeline.py:278-360):
per batch, take the k most-/least-activating samples per unit of the channel-averaged
(pre-ReLU for SAEs) activations, then merge with the running top-k by concatenating and
re-running top-k, carrying dataset indices and filename indices through gathers.

TPU-native redesign: fixed-shape state from step one (jit/pjit friendly, no growing
concat). The state holds value/index/filename buffers of shape [k, U] initialized with
sentinel values (-inf for largest, +inf for smallest; index -1). Once >= k real samples
have been seen the contents equal the reference's exactly; before that, sentinel rows
(index -1) are simply ignored by consumers.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class TopKState:
    values: jax.Array  # [k, U] float
    dataset_indices: jax.Array  # [k, U] int32 (index of the sample in the dataset)
    filename_indices: jax.Array  # [k, U] int32
    largest: bool  # STATIC (pytree aux data): survives jit/scan without tracing

    def tree_flatten(self):
        return (self.values, self.dataset_indices, self.filename_indices), self.largest

    @classmethod
    def tree_unflatten(cls, largest, children):
        return cls(*children, largest)


def init_topk(k: int, num_units: int, largest: bool = True, dtype=jnp.float32) -> TopKState:
    fill = -jnp.inf if largest else jnp.inf
    return TopKState(
        values=jnp.full((k, num_units), fill, dtype=dtype),
        dataset_indices=jnp.full((k, num_units), -1, dtype=jnp.int32),
        filename_indices=jnp.full((k, num_units), -1, dtype=jnp.int32),
        largest=largest,
    )


def update_topk(
    state: TopKState,
    batch_activations: jax.Array,  # [B, U] channel-averaged activations
    batch_start_index: jax.Array,  # scalar: dataset index of the first sample in batch
    batch_filename_indices: jax.Array,  # [B] int32
) -> TopKState:
    """Merge one batch into the running top-k.

    Equivalent to the reference's concat+topk+gather merge (utils.py:1463-1481), with
    the dataset index of a sample computed as batch_start_index + position-in-batch
    (the reference adds (eval_batch_idx-1)*batch_size, utils.py:1457-1460).
    """
    k = state.values.shape[0]
    b, u = batch_activations.shape
    sign = 1.0 if state.largest else -1.0

    batch_ds_idx = (
        batch_start_index
        + jnp.arange(b, dtype=jnp.int32)[:, None] * jnp.ones((1, u), jnp.int32)
    )
    batch_fn_idx = batch_filename_indices.astype(jnp.int32)[:, None] * jnp.ones((1, u), jnp.int32)

    merged_vals = jnp.concatenate([state.values, batch_activations.astype(state.values.dtype)], axis=0)
    merged_ds = jnp.concatenate([state.dataset_indices, batch_ds_idx], axis=0)
    merged_fn = jnp.concatenate([state.filename_indices, batch_fn_idx], axis=0)

    # top-k along axis 0 for every unit; jax.lax.top_k works on the last axis
    top_vals_t, top_pos_t = jax.lax.top_k((sign * merged_vals).T, k)  # [U, k]
    new_vals = sign * top_vals_t.T
    top_pos = top_pos_t.T  # [k, U] positions into merged axis 0
    new_ds = jnp.take_along_axis(merged_ds, top_pos, axis=0)
    new_fn = jnp.take_along_axis(merged_fn, top_pos, axis=0)
    return TopKState(new_vals, new_ds, new_fn, state.largest)


def merge_topk_states(a: TopKState, b: TopKState) -> TopKState:
    """Associative merge of two partial top-k states — used to all-gather per-chip
    states and reduce them (the reference is single-device and has no equivalent)."""
    assert a.largest == b.largest
    k = a.values.shape[0]
    sign = 1.0 if a.largest else -1.0
    vals = jnp.concatenate([a.values, b.values], axis=0)
    ds = jnp.concatenate([a.dataset_indices, b.dataset_indices], axis=0)
    fn = jnp.concatenate([a.filename_indices, b.filename_indices], axis=0)
    top_vals_t, top_pos_t = jax.lax.top_k((sign * vals).T, k)
    top_pos = top_pos_t.T
    return TopKState(
        sign * top_vals_t.T,
        jnp.take_along_axis(ds, top_pos, axis=0),
        jnp.take_along_axis(fn, top_pos, axis=0),
        a.largest,
    )
