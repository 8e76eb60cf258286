"""Boundary-exchange (halo) distributed conv: must match the all-gather
sharded conv and the single-device conv exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from difformer_tpu.data.synthetic import random_graph
from difformer_tpu.nn import DIFFormer
from difformer_tpu.ops.graph_ops import gcn_conv
from difformer_tpu.parallel import make_mesh, partition_graph
from difformer_tpu.parallel.api import sharded_apply
from difformer_tpu.parallel.sharded_ops import gcn_conv_halo

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((N_DEV,), ("graph",))


def test_halo_plan_consistency(rng):
    n, e = 64, 300
    x = rng.normal(size=(n, 4)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    sg = partition_graph(x, ei, 4, build_halo=True)
    assert sg.senders_table is not None
    B = sg.halo_width
    # every real edge's table index is either local or a valid halo slot
    for s in range(4):
        em = np.asarray(sg.edge_mask[s])
        tab = np.asarray(sg.senders_table[s])[em]
        assert (tab < sg.nodes_per_shard + 4 * B).all()
        # reconstruct: halo slot (j, b) must hold global id send_idx[j, s, b]
        glob = np.asarray(sg.senders[s])[em].astype(np.int64)
        own = glob // sg.nodes_per_shard == s
        for t, g in zip(tab[~own], glob[~own]):
            j = (t - sg.nodes_per_shard) // B
            b = (t - sg.nodes_per_shard) % B
            assert np.asarray(sg.send_idx)[j, s, b] + j * sg.nodes_per_shard == g


def test_gcn_conv_halo_matches_single(rng, mesh):
    n, e, h, d = 96, 500, 1, 8
    x = rng.normal(size=(n, h, d)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    expect = gcn_conv(
        jnp.asarray(x), jnp.asarray(ei[0], jnp.int32),
        jnp.asarray(ei[1], jnp.int32), None,
    )
    sg = partition_graph(x.reshape(n, -1), ei, N_DEV, build_halo=True)

    def body(xs, tab, rcv, ev, sidx, smask):
        out = gcn_conv_halo(
            xs[0].reshape(-1, h, d), tab[0], rcv[0], ev[0], sidx[0],
            smask[0], axis_name="graph",
        )
        return out.reshape(1, xs.shape[1], -1)

    f = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("graph"),) * 6,
            out_specs=P("graph"),
        )
    )
    got = f(sg.node_feat, sg.senders_table, sg.receivers, sg.edge_value,
            sg.send_idx, sg.send_mask)
    got = np.asarray(got).reshape(-1, h, d)[:n]
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kernel", ["simple", "sigmoid"])
def test_sharded_difformer_halo_matches_single(rng, mesh, kernel):
    n, e, f, c = 100, 400, 8, 3
    x, ei, y = random_graph(n, e, f, c, seed=3)

    single = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                       kernel=kernel)
    s = jnp.asarray(ei[0], jnp.int32)
    r = jnp.asarray(ei[1], jnp.int32)
    variables = single.init(jax.random.PRNGKey(0), jnp.asarray(x), s, r,
                            train=False)
    expect = np.asarray(single.apply(variables, jnp.asarray(x), s, r,
                                     train=False))

    sharded_model = DIFFormer(hidden_channels=16, out_channels=c,
                              num_layers=2, kernel=kernel, axis_name="graph")
    sg = partition_graph(x, ei, N_DEV, labels=y, build_halo=True)
    apply_fn = sharded_apply(sharded_model, mesh)
    got = np.asarray(
        jax.jit(lambda p, g: apply_fn(p, g))(variables["params"], sg)
    ).reshape(-1, c)[:n]
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_sharded_difformer_halo_spmm_first_matches_single(rng, mesh):
    """spmm_first over the halo path: the all_to_all ships F+1-wide feature
    rows instead of H*D-wide value rows; results match the single-device
    reference-order model up to float reassociation."""
    n, e, f, c, h = 100, 400, 8, 3, 4
    x, ei, y = random_graph(n, e, f, c, seed=3)

    single = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                       num_heads=h)
    s = jnp.asarray(ei[0], jnp.int32)
    r = jnp.asarray(ei[1], jnp.int32)
    variables = single.init(jax.random.PRNGKey(0), jnp.asarray(x), s, r,
                            train=False)
    expect = np.asarray(single.apply(variables, jnp.asarray(x), s, r,
                                     train=False))

    for build_halo in (True, False):   # halo all_to_all + all_gather paths
        sharded_model = DIFFormer(hidden_channels=16, out_channels=c,
                                  num_layers=2, num_heads=h,
                                  axis_name="graph", spmm_first=True)
        sg = partition_graph(x, ei, N_DEV, labels=y, build_halo=build_halo)
        apply_fn = sharded_apply(sharded_model, mesh)
        got = np.asarray(
            jax.jit(lambda p, g: apply_fn(p, g))(variables["params"], sg)
        ).reshape(-1, c)[:n]
        np.testing.assert_allclose(got, expect, rtol=5e-4, atol=5e-4)
