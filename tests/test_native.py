"""Native graphprep library tests — build, correctness vs numpy, and
integration with the ELL builder."""

import numpy as np
import pytest

from difformer_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_sort_edges(lib, rng):
    n, e = 50, 300
    recv = rng.integers(0, n, e).astype(np.int32)
    order, indptr = native.sort_edges_by_receiver(recv, n)
    assert (np.diff(recv[order]) >= 0).all()
    counts = np.zeros(n, np.int64)
    np.add.at(counts, recv, 1)
    np.testing.assert_array_equal(np.diff(indptr), counts)
    # stability: equal receivers keep original order
    for node in range(n):
        seg = order[indptr[node]:indptr[node + 1]]
        assert (np.diff(seg) > 0).all()


def test_gcn_norm_values_matches_numpy(lib, rng):
    from difformer_tpu.ops.ell import _gcn_values

    n, e = 40, 200
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    np.testing.assert_allclose(
        native.gcn_norm_values(s, r, n, w), _gcn_values(s, r, n, w),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        native.gcn_norm_values(s, r, n, None), _gcn_values(s, r, n, None),
        rtol=1e-6,
    )


def test_induced_subgraph_matches_numpy(lib, rng):
    from difformer_tpu.data.transforms import subgraph

    n, e = 60, 400
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    chunk = rng.permutation(n)[:20]
    expect, _ = subgraph(chunk, ei, n, relabel_nodes=True)
    got = native.induced_subgraph(ei[0], ei[1], chunk, n)
    # same edge multiset
    assert got.shape == expect.shape
    key_e = np.sort(expect[0] * 1000 + expect[1])
    key_g = np.sort(got[0].astype(np.int64) * 1000 + got[1])
    np.testing.assert_array_equal(key_e, key_g)


def test_knn_matches_numpy(lib, rng):
    from difformer_tpu.data.transforms import knn_graph

    x = rng.normal(size=(80, 6)).astype(np.float32)
    nbr = native.knn_neighbors(x, 5, include_self=True)
    expect = knn_graph(x, 5, include_self=True)
    got_src = nbr.reshape(-1)
    np.testing.assert_array_equal(np.sort(got_src.reshape(80, 5), axis=1),
                                  np.sort(expect[0].reshape(80, 5), axis=1))


def test_ell_with_native_matches_segment(rng):
    import jax.numpy as jnp

    from difformer_tpu.ops.ell import build_ell_gcn, gcn_conv_ell
    from difformer_tpu.ops.graph_ops import gcn_conv

    n, e = 64, 500
    x = rng.normal(size=(n, 1, 8)).astype(np.float32)
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    expect = gcn_conv(jnp.asarray(x), jnp.asarray(s, jnp.int32),
                      jnp.asarray(r, jnp.int32), None)
    ef, er = build_ell_gcn(s, r, n)
    got = gcn_conv_ell(jnp.asarray(x), ef, er)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_label_propagation_native(lib, rng):
    """Native LP finds the planted SBM communities, deterministically, and
    matches the numpy fallback's community count."""
    from difformer_tpu.data.transforms import label_propagation

    n, comm = 512, 32
    planted = np.arange(n) // comm
    e = 6000
    src = rng.integers(0, n, e)
    dst = np.where(
        rng.random(e) < 0.9,
        planted[src] * comm + rng.integers(0, comm, e),
        rng.integers(0, n, e),
    )
    ei = np.stack([src, dst]).astype(np.int64)
    shuf = rng.permutation(n)
    eis = shuf[ei]

    lab = native.label_propagation(eis[0], eis[1], n)
    lab2 = native.label_propagation(eis[0], eis[1], n)
    np.testing.assert_array_equal(lab, lab2)
    assert lab.min() == 0 and lab.max() + 1 == len(np.unique(lab))

    lab_np = label_propagation(eis, n, use_native=False)
    # both recover roughly the planted structure (16 blocks +- noise)
    assert abs(int(lab.max()) + 1 - n // comm) <= n // comm
    assert abs(int(lab_np.max()) + 1 - n // comm) <= n // comm
    # native labels agree with the planted blocks for the vast majority of
    # nodes (majority label per planted block covers >=80% of its nodes)
    planted_shuffled = np.empty(n, np.int64)
    planted_shuffled[shuf] = planted
    agree = 0
    for b in range(n // comm):
        members = lab[planted_shuffled == b]
        agree += np.max(np.bincount(members))
    assert agree >= 0.8 * n, agree
