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


# --------------------------------------------------------------------------
# locality reordering (TPU gather-locality preprocessing)
# --------------------------------------------------------------------------

def _clustered_graph(n_clusters=16, size=32, p_in=0.4, seed=0):
    rng = np.random.default_rng(seed)
    n = n_clusters * size
    blocks = []
    for c in range(n_clusters):
        m = rng.uniform(size=(size, size)) < p_in
        r, co = np.nonzero(m)
        blocks.append(np.stack([r + c * size, co + c * size]))
    ei = np.concatenate(blocks, axis=1)
    # sprinkle a few cross-cluster edges
    extra = rng.integers(0, n, (2, n // 4))
    ei = np.concatenate([ei, extra], axis=1)
    # scramble node ids so the natural order has no locality
    scram = rng.permutation(n)
    return scram[ei], n


def _bandwidth(ei):
    # median, not mean: a few long-range cross-cluster edges are expected
    return float(np.median(np.abs(ei[0] - ei[1])))


@pytest.mark.parametrize("method", ["rcm", "bfs", "degree"])
def test_locality_reorder_is_permutation(method):
    from difformer_tpu.data.transforms import locality_reorder

    ei, n = _clustered_graph()
    perm = locality_reorder(ei, n, method=method)
    assert np.array_equal(np.sort(perm), np.arange(n))


def test_rcm_reduces_gather_distance():
    from difformer_tpu.data.transforms import locality_reorder, permute_graph

    ei, n = _clustered_graph()
    perm = locality_reorder(ei, n, method="rcm")
    (ei2,) = permute_graph(perm, ei)
    assert _bandwidth(ei2) < 0.25 * _bandwidth(ei)


def test_permute_graph_model_equivariance():
    """Forward on the reordered graph == permuted forward on the original —
    the reorder is purely a memory-layout change."""
    import jax
    import jax.numpy as jnp

    from difformer_tpu.data.transforms import (
        locality_reorder, permute_graph, standard_preprocess)
    from difformer_tpu.nn import DIFFormer

    ei, n = _clustered_graph(n_clusters=4, size=16)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(n, 12)).astype(np.float32)
    ei = standard_preprocess(ei, n)

    model = DIFFormer(hidden_channels=16, out_channels=3, num_layers=2,
                      num_heads=2, kernel="simple")
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(ei[0], jnp.int32),
                           jnp.asarray(ei[1], jnp.int32), train=False)

    def fwd(x, ei):
        s, r = ei
        order = np.argsort(r, kind="stable")
        return np.asarray(model.apply(
            variables, jnp.asarray(x),
            jnp.asarray(s[order], jnp.int32),
            jnp.asarray(r[order], jnp.int32),
            train=False, indices_are_sorted=True))

    out = fwd(x, ei)
    perm = locality_reorder(ei, n, method="rcm")
    ei2, x2 = permute_graph(perm, ei, x)
    out2 = fwd(x2, ei2)
    inv = np.argsort(perm)
    np.testing.assert_allclose(out2, out[inv], rtol=2e-4, atol=2e-5)
