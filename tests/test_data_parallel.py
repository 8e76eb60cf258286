"""Data-parallel graph-level training on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from difformer_tpu.data.synthetic import random_small_graphs
from difformer_tpu.nn import DIFFormerV2, GraphLevelModel
from difformer_tpu.ops.graph_ops import gen_normalized_adjs, spmm
from difformer_tpu.parallel.data_parallel import (
    make_dp_train_step,
    shard_batches,
)
from difformer_tpu.parallel.mesh import make_mesh
from difformer_tpu.train.optim import torch_adam


def test_gen_normalized_adjs_modes(rng):
    n, e = 20, 80
    s = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    r = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    x = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    for mode in ("DAD", "DA", "AD"):
        vals = gen_normalized_adjs(s, r, n, mode=mode)
        out = spmm(vals, s, r, x)
        assert np.isfinite(np.asarray(out)).all()
    # DA: rows of the operator sum to 1 over receivers with nonzero degree
    vals = gen_normalized_adjs(s, r, n, mode="DA")
    ones = spmm(vals, s, r, jnp.ones((n, 1)))
    deg = np.zeros(n)
    np.add.at(deg, np.asarray(r), 1)
    np.testing.assert_allclose(
        np.asarray(ones)[deg > 0, 0], 1.0, rtol=1e-5
    )


def test_dp_training_learns():
    mesh = make_mesh((8,), ("data",))
    graphs = random_small_graphs(256, seed=7)
    max_nodes = max(g[0].shape[0] for g in graphs)
    max_edges = 4 * max(g[1].shape[1] for g in graphs)

    enc = DIFFormerV2(hidden_channels=16, out_channels=16, num_layers=2,
                      dropout=0.0)
    model = GraphLevelModel(encoder=enc, out_channels=1)
    tx = torch_adam(1e-2, 0.0)
    step = make_dp_train_step(model, mesh, tx, axis="data")

    batches = list(shard_batches(
        graphs, np.arange(256), per_device_batch=4, n_devices=8,
        max_nodes=max_nodes, max_edges=max_edges,
    ))
    b0 = jax.tree_util.tree_map(lambda t: jnp.asarray(t[0]), batches[0])
    variables = model.init(
        jax.random.PRNGKey(0), b0.node_feat, b0.node_mask, b0.n_nodes,
        b0.senders, b0.receivers, None, b0.edge_mask, train=False,
    )
    params = variables["params"]
    opt_state = tx.init(params)

    losses = []
    rng = jax.random.PRNGKey(1)
    for epoch in range(6):
        for b in batches:
            rng, sk = jax.random.split(rng)
            params, opt_state, loss = step(
                params, opt_state,
                jax.tree_util.tree_map(jnp.asarray, b), sk,
            )
            losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])


def test_dp_dense_plan_matches_edge_list():
    """round 5: shard_batches(dense_plan=True) attaches the block-dense
    conv plan and the DP step result matches the edge-list DP step."""
    mesh = make_mesh((8,), ("data",))
    graphs = random_small_graphs(64, seed=11)
    max_nodes = max(g[0].shape[0] for g in graphs)
    max_edges = 4 * max(g[1].shape[1] for g in graphs)

    enc = DIFFormerV2(hidden_channels=16, out_channels=16, num_layers=2,
                      dropout=0.0)
    model = GraphLevelModel(encoder=enc, out_channels=1)
    tx = torch_adam(1e-2, 0.0)
    step = make_dp_train_step(model, mesh, tx, axis="data")

    kw = dict(per_device_batch=4, n_devices=8,
              max_nodes=max_nodes, max_edges=max_edges)
    b_e = next(iter(shard_batches(graphs, np.arange(64), **kw)))
    b_d = next(iter(shard_batches(graphs, np.arange(64), dense_plan=True,
                                  **kw)))
    assert b_d.dense_adj is not None and b_d.dense_adj.shape[0] == 8

    b0 = jax.tree_util.tree_map(lambda t: jnp.asarray(t[0]), b_e)
    variables = model.init(
        jax.random.PRNGKey(0), b0.node_feat, b0.node_mask, b0.n_nodes,
        b0.senders, b0.receivers, None, b0.edge_mask, train=False,
    )
    params = variables["params"]
    rng = jax.random.PRNGKey(1)
    fresh = lambda: jax.tree_util.tree_map(jnp.array, params)
    p0 = fresh()
    p_e, _, l_e = step(p0, tx.init(p0),
                       jax.tree_util.tree_map(jnp.asarray, b_e), rng)
    p1 = fresh()
    p_d, _, l_d = step(p1, tx.init(p1),
                       jax.tree_util.tree_map(jnp.asarray, b_d), rng)
    np.testing.assert_allclose(float(l_d), float(l_e), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_e),
                    jax.tree_util.tree_leaves(p_d)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
