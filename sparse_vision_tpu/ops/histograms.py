"""Streaming per-unit activation histograms, jit-friendly.

Reference semantics (utils.py:1934-1963 update_histogram): fixed per-unit bin ranges
[small_value, top_value] chosen once (so bins are identical across batches), counts
accumulated with torch.histc per batch — torch.histc places values on uniform bins,
counts the boundary values, and DROPS out-of-range values.

Here the per-batch update is one vectorized bucketize + scatter-add over all units
(the reference loops units on host), so it runs on device inside the eval step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class HistogramState(NamedTuple):
    counts: jax.Array  # [num_bins, U] float32
    mins: jax.Array  # [U] lower edge per unit (fixed across batches)
    maxs: jax.Array  # [U] upper edge per unit


def init_histogram(num_bins: int, mins: jax.Array, maxs: jax.Array) -> HistogramState:
    u = mins.shape[0]
    return HistogramState(jnp.zeros((num_bins, u), jnp.float32), mins, maxs)


def update_histogram(state: HistogramState, acts: jax.Array) -> HistogramState:
    """Accumulate one batch of activations [B, U] (torch.histc semantics per unit:
    uniform bins over [min, max], boundaries included, out-of-range dropped)."""
    num_bins = state.counts.shape[0]
    span = state.maxs - state.mins
    # guard constant units (span 0): all in-range values land in bin 0 like histc
    scale = jnp.where(span > 0, num_bins / jnp.where(span > 0, span, 1.0), 0.0)
    idx = jnp.floor((acts - state.mins[None, :]) * scale[None, :]).astype(jnp.int32)
    valid = (acts >= state.mins[None, :]) & (acts <= state.maxs[None, :])
    idx = jnp.clip(idx, 0, num_bins - 1)  # x == max falls into the last bin
    unit_idx = jnp.broadcast_to(jnp.arange(acts.shape[1])[None, :], acts.shape)
    counts = state.counts.at[idx.ravel(), unit_idx.ravel()].add(
        valid.ravel().astype(jnp.float32)
    )
    return HistogramState(counts, state.mins, state.maxs)


def bin_edges(state: HistogramState, unit: int):
    """Edges for plotting one unit (utils.py:1981 torch.linspace equivalent)."""
    num_bins = state.counts.shape[0]
    return jnp.linspace(state.mins[unit], state.maxs[unit], num_bins + 1)


def plot_histograms(state: HistogramState, neuron_indices, path: str, title: str) -> str:
    """Figure grid of per-unit histograms (reference activation_histograms_2,
    utils.py:1966-1994)."""
    import math
    import os

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    num_units = state.counts.shape[1]
    cols = math.ceil(math.sqrt(num_units))
    rows = math.ceil(num_units / cols)
    fig = plt.figure(figsize=(18, 12))
    plt.suptitle(title)
    counts = np.asarray(state.counts)
    for i in range(num_units):
        plt.subplot(rows, cols, i + 1)
        plt.stairs(values=counts[:, i], edges=np.asarray(bin_edges(state, i)), fill=True)
        plt.xlabel("Activation value")
        plt.ylabel("No. of samples")
        plt.title(f"Neuron {neuron_indices[i]}")
    fig.tight_layout(pad=1.0)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.savefig(path, dpi=150)
    plt.close(fig)
    return path
