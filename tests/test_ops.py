"""Unit tests for segment ops and gcn_conv against dense numpy references."""

import jax.numpy as jnp
import numpy as np
import pytest

from difformer_tpu.ops import (
    gcn_conv,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)
from difformer_tpu.ops.graph_ops import spmm


def dense_gcn_reference(x, senders, receivers, edge_weight, n):
    """Numpy transcription of the reference gcn_conv math
    (node classification/difformer.py:63-79): out[col] += w * d[col]^-.5 *
    d[row]^-.5 * x[row], d = receiver counts, nan/inf -> 0."""
    d = np.zeros(n)
    np.add.at(d, receivers, 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.sqrt(1.0 / d)
    w = np.ones(len(senders)) if edge_weight is None else edge_weight
    val = w * inv[receivers] * inv[senders]
    val = np.nan_to_num(val, nan=0.0, posinf=0.0, neginf=0.0)
    out = np.zeros_like(x)
    np.add.at(out, receivers, val.reshape((-1,) + (1,) * (x.ndim - 1)) * x[senders])
    return out


def test_segment_sum_basic():
    data = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    seg = jnp.asarray([0, 0, 2])
    out = segment_sum(data, seg, 3)
    np.testing.assert_allclose(out, [[4.0, 6.0], [0, 0], [5, 6]])


def test_segment_mean_empty_segment():
    data = jnp.asarray([2.0, 4.0])
    out = segment_mean(data, jnp.asarray([1, 1]), 3)
    np.testing.assert_allclose(out, [0.0, 3.0, 0.0])


def test_segment_max():
    data = jnp.asarray([1.0, 5.0, -2.0])
    out = segment_max(data, jnp.asarray([0, 0, 1]), 2)
    np.testing.assert_allclose(out, [5.0, -2.0])


def test_segment_softmax_sums_to_one():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=12))
    seg = jnp.asarray([0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3])
    sm = segment_softmax(logits, seg, 4)
    sums = segment_sum(sm, seg, 4)
    np.testing.assert_allclose(sums, np.ones(4), rtol=1e-6)


@pytest.mark.parametrize("with_weight", [False, True])
@pytest.mark.parametrize("heads", [1, 2])
def test_gcn_conv_matches_dense(rng, with_weight, heads):
    n, e, d = 30, 120, 5
    x = rng.normal(size=(n, heads, d)).astype(np.float32)
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32) if with_weight else None

    expect = dense_gcn_reference(x, senders, receivers, w, n)
    got = gcn_conv(
        jnp.asarray(x),
        jnp.asarray(senders, jnp.int32),
        jnp.asarray(receivers, jnp.int32),
        None if w is None else jnp.asarray(w),
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_gcn_conv_isolated_nodes_zero(rng):
    """Nodes with zero degree must produce zeros (nan_to_num parity)."""
    n = 10
    x = rng.normal(size=(n, 1, 4)).astype(np.float32)
    senders = jnp.asarray([0, 1], jnp.int32)
    receivers = jnp.asarray([1, 0], jnp.int32)
    out = gcn_conv(jnp.asarray(x), senders, receivers, None)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(out[2:], 0.0)


def test_gcn_conv_edge_mask_equals_subgraph(rng):
    """Padded edges (mask False) must be invisible to degrees and messages."""
    n, e, d = 20, 60, 3
    x = rng.normal(size=(n, 1, d)).astype(np.float32)
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)

    keep = 40
    expect = dense_gcn_reference(x, senders[:keep], receivers[:keep], None, n)
    mask = np.zeros(e, dtype=bool)
    mask[:keep] = True
    got = gcn_conv(
        jnp.asarray(x),
        jnp.asarray(senders, jnp.int32),
        jnp.asarray(receivers, jnp.int32),
        None,
        edge_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_spmm_matches_dense(rng):
    n, e, d = 16, 50, 4
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)
    vals = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (receivers, senders), vals)
    got = spmm(
        jnp.asarray(vals),
        jnp.asarray(senders, jnp.int32),
        jnp.asarray(receivers, jnp.int32),
        jnp.asarray(x),
    )
    np.testing.assert_allclose(got, dense @ x, rtol=1e-5, atol=1e-5)
