"""Locality-aware partition layout (label-propagation community reorder
+ degree-balanced cuts + min-cut
snap): halo-traffic regression gate + numerical parity with single-device.

The reference has no distributed layer at all (SURVEY.md §2.6); this guards
the TPU build's own north star — boundary bytes are what gate ≥80% scaling
efficiency over ICI (BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difformer_tpu.nn import DIFFormer
from difformer_tpu.parallel import make_mesh, partition_graph
from difformer_tpu.parallel.api import sharded_apply
from difformer_tpu.parallel.partition import (
    boundary_rows,
    crossing_counts,
    locality_layout,
)

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((N_DEV,), ("graph",))


def _shuffled_sbm(n=2048, e=16384, f=8, comm=64, intra=0.9, seed=0):
    """SBM with community-contiguous ids, then a random relabel — real
    graphs do not arrive community-sorted; the locality layout must recover
    the structure that the shuffle destroyed."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, f)).astype(np.float32)
    e_in = int(e * intra)
    c = rng.integers(0, n // comm, e_in)
    senders = np.concatenate([
        c * comm + rng.integers(0, comm, e_in), rng.integers(0, n, e - e_in)])
    receivers = np.concatenate([
        c * comm + rng.integers(0, comm, e_in), rng.integers(0, n, e - e_in)])
    ei = np.stack([senders, receivers]).astype(np.int64)
    shuf = rng.permutation(n)
    return x[np.argsort(shuf)], shuf[ei]


def test_crossing_counts_small():
    # path graph 0-1-2-3: one edge crosses each interior boundary
    ei = np.array([[0, 1, 2], [1, 2, 3]])
    cross = crossing_counts(ei, 4)
    np.testing.assert_array_equal(cross[:5], [0, 1, 1, 1, 0])
    # an edge spanning 0..3 crosses every boundary
    cross = crossing_counts(np.array([[0], [3]]), 4)
    np.testing.assert_array_equal(cross[:5], [0, 1, 1, 1, 0])


def test_locality_layout_is_permutation():
    x, ei = _shuffled_sbm()
    perm, n_loc = locality_layout(ei, x.shape[0], N_DEV)
    shard_of = perm // n_loc
    assert sorted(set(shard_of)) == list(range(N_DEV))
    # positions unique within the padded layout
    assert np.unique(perm).shape[0] == x.shape[0]


def test_locality_layout_cuts_halo_2x():
    """VERDICT round-2 item 4 gate: ≥2× fewer boundary rows than the
    contiguous cut on a (shuffled) clustered graph."""
    x, ei = _shuffled_sbm()
    n = x.shape[0]
    n_loc_cont = -(-n // N_DEV)
    cont = boundary_rows(ei, np.arange(n), n_loc_cont)
    perm, n_loc = locality_layout(ei, n, N_DEV)
    loc = boundary_rows(ei, perm, n_loc)
    assert loc * 2 <= cont, (loc, cont)


def test_locality_layout_balances_edges():
    x, ei = _shuffled_sbm()
    n = x.shape[0]
    perm, n_loc = locality_layout(ei, n, N_DEV)
    counts = np.bincount(perm[ei[1]] // n_loc, minlength=N_DEV)
    assert counts.max() <= 1.5 * ei.shape[1] / N_DEV


def test_locality_partition_matches_single_device(mesh):
    x, ei = _shuffled_sbm(n=256, e=2048, comm=32)
    n, c = x.shape[0], 3
    rng = np.random.default_rng(1)
    y = rng.integers(0, c, n)

    single = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2)
    s = jnp.asarray(ei[0], jnp.int32)
    r = jnp.asarray(ei[1], jnp.int32)
    variables = single.init(jax.random.PRNGKey(0), jnp.asarray(x), s, r,
                            train=False)
    expect = np.asarray(single.apply(variables, jnp.asarray(x), s, r,
                                     train=False))

    sharded_model = DIFFormer(hidden_channels=16, out_channels=c,
                              num_layers=2, axis_name="graph")
    perm, n_loc = locality_layout(ei, n, N_DEV)
    sg = partition_graph(x, ei, N_DEV, labels=y, node_perm=perm,
                         nodes_per_shard=n_loc, build_halo=True)
    apply_fn = sharded_apply(sharded_model, mesh)
    got = np.asarray(
        jax.jit(lambda p, g: apply_fn(p, g))(variables["params"], sg)
    ).reshape(-1, c)[perm]
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_boundary_rows_matches_built_plan():
    """boundary_rows (layout metric, no plan build) must equal the halo
    plan's real send-row count."""
    x, ei = _shuffled_sbm(n=256, e=2048, comm=32)
    n = x.shape[0]
    perm, n_loc = locality_layout(ei, n, N_DEV)
    sg = partition_graph(x, ei, N_DEV, node_perm=perm,
                         nodes_per_shard=n_loc, build_halo=True)
    assert boundary_rows(ei, perm, n_loc) == int(np.asarray(sg.send_mask).sum())


def test_locality_layout_star_graph():
    """Hub-dominated degree mass used to crash the cut search; the
    degenerate degree-balanced cut now falls back (with a warning) to
    equal-node cuts so padding cannot blow memory n_shards-fold."""
    import warnings

    n = 64
    ei = np.stack([np.arange(1, n), np.zeros(n - 1, np.int64)])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        perm, n_loc = locality_layout(ei, n, 4)
    assert any("degenerate" in str(x.message) for x in w)
    assert np.unique(perm).shape[0] == n
    # fallback keeps shards node-balanced: no shard exceeds ceil(n/4)
    occ = np.bincount(perm // n_loc, minlength=4)
    assert occ.max() <= -(-n // 4)
    assert 4 * n_loc <= 2 * n  # padding waste bounded


def test_label_propagation_degenerate_graphs():
    """Empty and self-loop-only graphs: numpy fallback must not crash and
    must agree with the native path (every node its own community)."""
    from difformer_tpu.data.transforms import label_propagation

    for ei in (np.zeros((2, 0), np.int64),
               np.stack([np.arange(4), np.arange(4)])):
        lab = label_propagation(ei, 5, use_native=False)
        np.testing.assert_array_equal(np.sort(np.unique(lab)), np.arange(5))
        try:
            lab_n = label_propagation(ei, 5, use_native=True)
        except RuntimeError:
            continue  # native lib absent in this environment
        assert np.unique(lab_n).shape[0] == 5


def test_shard_balance_stats_gate_skew():
    """VERDICT r3 item 7 regression gate: on a heavy-tailed (powerlaw)
    graph the production layouts (balanced / locality) keep the per-shard
    edge padding inflation bounded — the term the ICI forecast now charges
    compute with. The contiguous layout's inflation on the same graph is
    strictly worse (that is why the layouts exist)."""
    from difformer_tpu.parallel.partition import (
        edge_balanced_layout,
        shard_balance_stats,
    )

    rng = np.random.default_rng(7)
    n, e = 4096, 32768
    w = rng.pareto(2.0, n) + 1.0
    p = w / w.sum()
    ei = np.stack([rng.choice(n, size=e, p=p), rng.choice(n, size=e, p=p)])
    x = rng.normal(size=(n, 8)).astype(np.float32)

    # what each layout guarantees (and the forecast charges for):
    #  * edge_balanced_layout cuts at equal cumulative receiver degree —
    #    near-perfect edge balance by construction;
    #  * locality_layout trades balance (within its balance_tol=0.15) for
    #    halo-byte reduction — its padding inflation must stay bounded by
    #    roughly 1 + tol (+ bucket rounding), NOT drift arbitrarily.
    for s in (4, 8):
        for make, bound in ((edge_balanced_layout, 1.10),
                            (locality_layout, 1.35)):
            perm, n_loc = make(ei, n, s)
            sg = partition_graph(x, ei, s, build_halo=False,
                                 node_perm=perm, nodes_per_shard=n_loc)
            st = shard_balance_stats(sg)
            assert st["edge_pad_factor"] <= bound, (s, make.__name__, st)
            assert st["edge_skew"] <= bound, (s, make.__name__, st)
