"""Distributed-path tests on a virtual 8-device CPU mesh: every sharded op
and the end-to-end sharded model must match the single-device computation on
the unpadded graph."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from difformer_tpu.data.synthetic import random_graph
from difformer_tpu.nn import DIFFormer
from difformer_tpu.ops.graph_ops import gcn_conv
from difformer_tpu.ops.sigmoid_attention import sigmoid_attention
from difformer_tpu.parallel import make_mesh, partition_graph
from difformer_tpu.parallel.api import make_sharded_train_step, sharded_apply
from difformer_tpu.parallel.sharded_ops import (
    gcn_conv_sharded,
    sigmoid_attention_sharded,
)
from difformer_tpu.train.optim import torch_adam

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((N_DEV,), ("graph",))


def test_partition_roundtrip(rng):
    n, e = 50, 200
    x = rng.normal(size=(n, 4)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    sg = partition_graph(x, ei, 4)
    assert sg.node_feat.shape[0] == 4
    # every real edge appears exactly once, with global sender / local recv
    count = int(sg.edge_mask.sum())
    assert count == e
    for s in range(4):
        em = np.asarray(sg.edge_mask[s])
        rec = np.asarray(sg.receivers[s])[em] + s * sg.nodes_per_shard
        assert (np.asarray(rec) // sg.nodes_per_shard == s).all()


def test_gcn_conv_sharded_matches_single(rng, mesh):
    n, e, h, d = 64, 256, 2, 4
    x = rng.normal(size=(n, h, d)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    sg = partition_graph(x.reshape(n, -1), ei, N_DEV)

    expect = gcn_conv(
        jnp.asarray(x), jnp.asarray(ei[0], jnp.int32),
        jnp.asarray(ei[1], jnp.int32), None,
    )

    def body(xs, snd, rcv, em):
        return gcn_conv_sharded(
            xs.reshape(-1, h, d), snd, rcv, None, edge_mask=em,
            axis_name="graph",
        ).reshape(xs.shape[0], -1)

    f = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("graph"), P("graph"), P("graph"), P("graph")),
            out_specs=P("graph"),
        )
    )
    got = f(
        sg.node_feat.reshape(-1, h * d),
        sg.senders.reshape(-1),
        sg.receivers.reshape(-1),
        sg.edge_mask.reshape(-1),
    )
    got = np.asarray(got).reshape(-1, h, d)[:n]
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_ring_sigmoid_matches_single(rng, mesh):
    n, h, m, d = 64, 2, 4, 4
    q = rng.normal(size=(n, h, m)).astype(np.float32)
    k = rng.normal(size=(n, h, m)).astype(np.float32)
    v = rng.normal(size=(n, h, d)).astype(np.float32)

    expect = sigmoid_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), use_pallas=False
    )

    def body(q_l, k_l, v_l):
        return sigmoid_attention_sharded(q_l, k_l, v_l, axis_name="graph")

    f = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("graph"), P("graph"), P("graph")),
            out_specs=P("graph"),
        )
    )
    got = f(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("kernel", ["simple", "sigmoid"])
def test_sharded_difformer_matches_single(rng, mesh, kernel):
    n, e, f, c = 100, 400, 8, 3
    x, ei, y = random_graph(n, e, f, c, seed=3)

    single = DIFFormer(
        hidden_channels=16, out_channels=c, num_layers=2, kernel=kernel
    )
    s = jnp.asarray(ei[0], jnp.int32)
    r = jnp.asarray(ei[1], jnp.int32)
    variables = single.init(jax.random.PRNGKey(0), jnp.asarray(x), s, r,
                            train=False)
    expect = np.asarray(single.apply(variables, jnp.asarray(x), s, r,
                                     train=False))

    sharded_model = DIFFormer(
        hidden_channels=16, out_channels=c, num_layers=2, kernel=kernel,
        axis_name="graph",
    )
    sg = partition_graph(x, ei, N_DEV, labels=y)
    apply_fn = sharded_apply(sharded_model, mesh)
    got = np.asarray(
        jax.jit(lambda p, g: apply_fn(p, g))(variables["params"], sg)
    )
    got = got.reshape(-1, c)[:n]
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_sharded_train_step_runs_and_learns(rng, mesh):
    n, e, f, c = 80, 300, 8, 3
    x, ei, y = random_graph(n, e, f, c, seed=5)
    train_mask = np.zeros(n, bool)
    train_mask[: n // 2] = True
    sg = partition_graph(x, ei, N_DEV, labels=y, label_mask=train_mask)

    model = DIFFormer(
        hidden_channels=16, out_channels=c, num_layers=2, dropout=0.0,
        axis_name="graph",
    )
    # init with an axis-free twin (same params, no collectives at init time)
    init_model = DIFFormer(
        hidden_channels=16, out_channels=c, num_layers=2, dropout=0.0,
    )
    variables = init_model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(x), jnp.asarray(ei[0], jnp.int32),
        jnp.asarray(ei[1], jnp.int32), train=False,
    )
    params = variables["params"]
    tx = torch_adam(1e-2, 5e-4)
    opt_state = tx.init(params)

    def loss_fn(logits, labels, mask):
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(
            logp, labels.reshape(-1, 1).astype(jnp.int32), axis=-1
        )[:, 0]
        m = mask.astype(logits.dtype)
        return -jnp.sum(ll * m), jnp.sum(m)

    step = make_sharded_train_step(model, mesh, tx, loss_fn)
    losses = []
    rng_key = jax.random.PRNGKey(7)
    for i in range(30):
        rng_key, sk = jax.random.split(rng_key)
        params, opt_state, loss = step(params, opt_state, sg, sk)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]


def test_halo_bytes_much_less_than_allgather_on_clustered_graph():
    """On a community-structured graph the boundary set is a small fraction
    of the nodes, so the halo all_to_all must ship far less than the full
    feature all_gather (the point of the plan; VERDICT r1 item 7)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import build_graph
    from difformer_tpu.parallel.partition import partition_graph
    from difformer_tpu.parallel.sharded_ops import collective_bytes_per_layer

    n, e = 4096, 32768
    x, s_sorted, r_sorted, _, _ = build_graph(n, e, 8, kind="clustered",
                                              comm=512, intra=0.9)
    ei = np.stack([s_sorted, r_sorted])
    sg = partition_graph(x, ei, 8, build_halo=True)
    comm = collective_bytes_per_layer(sg, feat_dim=64)
    assert comm["halo_wire"] > 0
    # 512-node communities align with 512-node shards: ~90% of edges are
    # internal, so boundary rows ≪ all nodes
    assert comm["halo_wire"] < 0.5 * comm["allgather"], comm
    assert comm["halo_real"] <= comm["halo_wire"]
    # psum payload is N-independent and tiny
    assert comm["attn_psum"] < comm["allgather"] / 10
