"""Segment reductions — the TPU-native replacement for torch_scatter.

The reference delegates all scatter/gather work to torch_scatter /
torch_sparse CUDA kernels (e.g. ``scatter_add_`` at
``physical particle/difformer-v2.py:98,105``). On TPU the idiomatic
formulation is XLA's sorted-scatter (``jax.ops.segment_sum``), which the
compiler lowers to efficient vectorized scatters; when segment ids are sorted
(we sort edges by destination at preprocessing time) ``indices_are_sorted``
unlocks the fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments, *, indices_are_sorted=False):
    """Sum ``data`` rows into ``num_segments`` buckets by ``segment_ids``."""
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(data, segment_ids, num_segments, *, indices_are_sorted=False):
    """Mean-reduce rows per segment; empty segments produce 0."""
    totals = segment_sum(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    counts = segment_sum(
        jnp.ones((data.shape[0],), dtype=data.dtype),
        segment_ids,
        num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    counts = jnp.maximum(counts, 1)
    return totals / counts.reshape((-1,) + (1,) * (data.ndim - 1))


def segment_max(data, segment_ids, num_segments, *, indices_are_sorted=False):
    """Max-reduce rows per segment; empty segments produce the dtype min."""
    return jax.ops.segment_max(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_softmax(logits, segment_ids, num_segments, *, indices_are_sorted=False):
    """Numerically-stable softmax within each segment.

    Used by the GAT baseline (reference uses PyG's scatter-softmax inside
    ``GATConv``, ``node classification/gnns.py:163-201``).
    """
    seg_max = segment_max(
        logits, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    denom = segment_sum(
        exp, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    return exp / jnp.maximum(denom, 1e-16)[segment_ids]
