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


def test_ring_sigmoid_pallas_matches_single(rng, mesh):
    """Ring attention with the Pallas unnormalized per-step kernels
    (interpret mode on CPU): forward parity + gradient parity vs the
    single-device blockwise op."""
    n, h, m, d = 64, 2, 4, 4
    q = rng.normal(size=(n, h, m)).astype(np.float32)
    k = rng.normal(size=(n, h, m)).astype(np.float32)
    v = rng.normal(size=(n, h, d)).astype(np.float32)
    qj, kj, vj = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)

    expect = sigmoid_attention(qj, kj, vj, use_pallas=False)

    def body(q_l, k_l, v_l):
        return sigmoid_attention_sharded(q_l, k_l, v_l, axis_name="graph",
                                         use_pallas=True, interpret=True)

    # check_vma=False: the Pallas HLO *interpreter* internally mixes
    # varying/unvarying operands in a dynamic_slice and trips the vma
    # checker (jax-ml/jax interpreter limitation); the compiled TPU path
    # threads vma through _out_struct and does not need this.
    f = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("graph"), P("graph"), P("graph")),
            out_specs=P("graph"),
            check_vma=False,
        )
    )
    got = f(qj, kj, vj)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-5)

    def loss_ring(q, k, v):
        return jnp.sum(f(q, k, v) ** 2)

    def loss_single(q, k, v):
        return jnp.sum(sigmoid_attention(q, k, v, use_pallas=False) ** 2)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(qj, kj, vj)
    gs = jax.grad(loss_single, argnums=(0, 1, 2))(qj, kj, vj)
    for a, b in zip(gr, gs):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_pallas_unnormalized_matches_dense(rng):
    """Raw (num, den) form vs explicit scores; grads via autodiff parity."""
    from difformer_tpu.kernels.pallas_sigmoid_attention import (
        sigmoid_attention_pallas_unnormalized,
    )

    n, l, h, m, d = 48, 56, 2, 8, 8
    q = jnp.asarray(rng.normal(size=(n, h, m)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(l, h, m)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(l, h, d)).astype(np.float32))

    num, den = sigmoid_attention_pallas_unnormalized(q, k, v, interpret=True)
    scores = jax.nn.sigmoid(jnp.einsum("nhm,lhm->nlh", q, k))
    np.testing.assert_allclose(num, jnp.einsum("nlh,lhd->nhd", scores, v),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(den, scores.sum(axis=1), rtol=1e-4, atol=1e-5)

    def loss_p(q, k, v):
        num, den = sigmoid_attention_pallas_unnormalized(q, k, v,
                                                         interpret=True)
        return jnp.sum(num ** 2) + jnp.sum(jnp.sin(den))

    def loss_ref(q, k, v):
        s = jax.nn.sigmoid(jnp.einsum("nhm,lhm->nlh", q, k))
        return (jnp.sum(jnp.einsum("nlh,lhd->nhd", s, v) ** 2)
                + jnp.sum(jnp.sin(s.sum(axis=1))))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)
