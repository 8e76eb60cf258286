"""DIFFormerV2 activation parity vs a numpy transcription of the reference
batched forward (``physical particle/difformer-v2.py:196-223``), run on the
flat (unpadded) representation the reference uses."""

import jax
import jax.numpy as jnp
import numpy as np

from difformer_tpu.data.batching import pad_graph_batch
from difformer_tpu.nn import DIFFormerV2
from tests.test_parity import np_gcn_conv, np_layernorm, np_linear


def np_v2_simple_attention(q, k, v, n_nodes):
    """difformer-v2.py:80-111 on flat tensors: global frobenius norm,
    per-graph aggregates, +n_g denominator."""
    q = q / np.linalg.norm(q)
    k = k / np.linalg.norm(k)
    out = np.zeros_like(v)
    off = 0
    for n in n_nodes:
        qg, kg, vg = q[off:off + n], k[off:off + n], v[off:off + n]
        kv = np.einsum("lhm,lhd->hmd", kg, vg)
        num = np.einsum("nhm,hmd->nhd", qg, kv) + vg.sum(0)[None]
        den = np.einsum("nhm,hm->nh", qg, kg.sum(0)) + n
        out[off:off + n] = num / den[..., None]
        off += n
    return out


def reference_v2_forward(params, xs, eis, n_nodes, *, num_layers, hidden,
                         alpha=0.5):
    """Flat block-diagonal transcription of DIFFormer_v2.forward."""
    x = np.concatenate(xs)
    offsets = np.cumsum([0] + list(n_nodes[:-1]))
    senders = np.concatenate(
        [ei[0] + o for ei, o in zip(eis, offsets)]
    )
    receivers = np.concatenate(
        [ei[1] + o for ei, o in zip(eis, offsets)]
    )
    n = x.shape[0]
    p = params
    x = np_linear(x, p["fc_in"]["kernel"], p["fc_in"]["bias"])
    ln = p["ln_0"]["LayerNorm_0"]
    x = np_layernorm(x, ln["scale"], ln["bias"])
    x = np.maximum(x, 0.0)
    prev = x
    for i in range(num_layers):
        c = p[f"conv_{i}"]
        q = np_linear(x, c["Wq"]["kernel"], c["Wq"]["bias"]).reshape(
            n, 1, hidden
        )
        k = np_linear(x, c["Wk"]["kernel"], c["Wk"]["bias"]).reshape(
            n, 1, hidden
        )
        v = np_linear(x, c["Wv"]["kernel"], c["Wv"]["bias"]).reshape(
            n, 1, hidden
        )
        att = np_v2_simple_attention(q, k, v, n_nodes)
        g = np_gcn_conv(v, senders, receivers, n)
        x = (att + g).mean(axis=1)
        x = alpha * x + (1 - alpha) * prev
        ln = p[f"ln_{i + 1}"]["LayerNorm_0"]
        x = np_layernorm(x, ln["scale"], ln["bias"])
        x = np.maximum(x, 0.0)     # v2 extra ReLU (difformer-v2.py:217)
        prev = x
    return np_linear(x, p["fc_out"]["kernel"], p["fc_out"]["bias"])


def test_v2_forward_parity(rng):
    n_nodes = [6, 9, 4]
    f, h, L = 8, 12, 2
    xs = [rng.normal(size=(n, f)).astype(np.float32) for n in n_nodes]
    eis = [
        np.stack([rng.integers(0, n, 3 * n), rng.integers(0, n, 3 * n)])
        for n in n_nodes
    ]
    batch = pad_graph_batch(xs, eis, [0.0] * 3)

    model = DIFFormerV2(hidden_channels=h, out_channels=h, num_layers=L,
                        dropout=0.0)
    args = (
        jnp.asarray(batch.node_feat), jnp.asarray(batch.node_mask),
        jnp.asarray(batch.n_nodes), jnp.asarray(batch.senders),
        jnp.asarray(batch.receivers), None, jnp.asarray(batch.edge_mask),
    )
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)
    out_pad = np.asarray(model.apply(variables, *args, train=False))

    params_np = jax.tree_util.tree_map(np.asarray, variables["params"])
    out_ref = reference_v2_forward(params_np, xs, eis, n_nodes,
                                   num_layers=L, hidden=h)
    off = 0
    for b, n in enumerate(n_nodes):
        np.testing.assert_allclose(
            out_pad[b, :n], out_ref[off:off + n], rtol=2e-3, atol=2e-4
        )
        off += n


def test_v2_sorted_scatter_path_matches(rng):
    """indices_are_sorted=True (unlocked by pad_graph_batch's tail padding
    + center-major kNN edges) is numerically identical to the default
    scatter path."""
    from difformer_tpu.data.transforms import knn_graph

    xs, eis = [], []
    for n in (9, 14, 11):
        pos = rng.normal(size=(n, 3)).astype(np.float32)
        xs.append(np.concatenate(
            [rng.normal(size=(n, 5)).astype(np.float32), pos], axis=1))
        eis.append(knn_graph(pos, 4, include_self=True))
    batch = pad_graph_batch(xs, eis, [0.0, 1.0, 0.0])
    assert batch.edges_sorted

    model = DIFFormerV2(hidden_channels=16, out_channels=4, num_layers=2,
                        dropout=0.0)
    args = (jnp.asarray(batch.node_feat), jnp.asarray(batch.node_mask),
            jnp.asarray(batch.n_nodes), jnp.asarray(batch.senders),
            jnp.asarray(batch.receivers), None,
            jnp.asarray(batch.edge_mask))
    params = model.init(jax.random.PRNGKey(0), *args, train=False)["params"]
    out_u = model.apply({"params": params}, *args, train=False)
    out_s = model.apply({"params": params}, *args, train=False,
                        indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               rtol=1e-6, atol=1e-6)


def test_v2_knn_table_conv_matches_edge_list(rng):
    """The scatter-free k-in-regular conv plan (regular_knn_table) equals
    the masked edge-list gcn_conv path."""
    from difformer_tpu.data.batching import regular_knn_table
    from difformer_tpu.data.transforms import knn_graph

    xs, eis = [], []
    for n in (9, 14, 11):
        pos = rng.normal(size=(n, 3)).astype(np.float32)
        xs.append(np.concatenate(
            [rng.normal(size=(n, 5)).astype(np.float32), pos], axis=1))
        eis.append(knn_graph(pos, 4, include_self=True))
    batch = pad_graph_batch(xs, eis, [0.0, 1.0, 0.0])
    t = regular_knn_table(batch)
    assert t is not None
    idx, w, ridx, rw = t
    assert ridx is not None and rw is not None

    model = DIFFormerV2(hidden_channels=16, out_channels=4, num_layers=2,
                        dropout=0.0)
    args = (jnp.asarray(batch.node_feat), jnp.asarray(batch.node_mask),
            jnp.asarray(batch.n_nodes), jnp.asarray(batch.senders),
            jnp.asarray(batch.receivers), None,
            jnp.asarray(batch.edge_mask))
    params = model.init(jax.random.PRNGKey(0), *args, train=False)["params"]
    out_e = model.apply({"params": params}, *args, train=False)
    table4 = tuple(jnp.asarray(a) for a in t)
    out_k = model.apply({"params": params}, *args, train=False,
                        knn_table=table4)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_e),
                               rtol=1e-5, atol=1e-5)

    # gradient parity: the static-shape reverse-table backward
    # (knn_table_conv custom VJP) equals AD through the edge-list path
    def loss_e(p):
        return jnp.sum(model.apply({"params": p}, *args, train=False) ** 2)

    def loss_k(p):
        return jnp.sum(model.apply({"params": p}, *args, train=False,
                                   knn_table=table4) ** 2)

    g_e = jax.grad(loss_e)(params)
    g_k = jax.grad(loss_k)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_e),
                    jax.tree_util.tree_leaves(g_k)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)

    # non-regular batch (drop an edge) -> builder declines
    eis_bad = [e.copy() for e in eis]
    eis_bad[0] = eis_bad[0][:, :-1]
    b2 = pad_graph_batch(xs, eis_bad, [0.0, 1.0, 0.0])
    assert regular_knn_table(b2) is None


def test_knn_table_conv_weighted_and_vjp(rng):
    """round 5: the table plan accepts per-edge weights (baked into w/rw)
    and knn_table_conv's custom VJP equals the take-VJP scatter backward
    on the raw op."""
    import jax

    from difformer_tpu.data.batching import regular_knn_table
    from difformer_tpu.data.transforms import knn_graph
    from difformer_tpu.ops.graph_ops import gcn_conv, knn_table_conv

    xs, eis, ews = [], [], []
    for n in (9, 14, 11):
        pos = rng.normal(size=(n, 3)).astype(np.float32)
        xs.append(rng.normal(size=(n, 6)).astype(np.float32))
        ei = knn_graph(pos, 4, include_self=True)
        eis.append(ei)
        ews.append(rng.uniform(0.5, 1.5, ei.shape[1]).astype(np.float32))
    batch = pad_graph_batch(xs, eis, [0.0, 1.0, 0.0], edge_weights=ews)
    t = regular_knn_table(batch, k_rev_pad=24)
    assert t is not None and t[2] is not None
    idx, w, ridx, rw = (jnp.asarray(a) for a in t)
    assert ridx.shape[1] == 24      # padded to the caller's static bound

    B, M = batch.node_feat.shape[:2]
    v = jnp.asarray(
        rng.normal(size=(B * M, 2, 5)).astype(np.float32))

    out_t = knn_table_conv(v, idx, w, ridx, rw)
    out_e = gcn_conv(v, jnp.asarray(batch.senders),
                     jnp.asarray(batch.receivers),
                     jnp.asarray(batch.edge_weight),
                     num_nodes=B * M, edge_mask=jnp.asarray(batch.edge_mask))
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_e),
                               rtol=1e-5, atol=1e-5)

    # VJP parity vs plain AD through the forward einsum (take-VJP scatter)
    def fwd_ad(v):
        return jnp.einsum("rk,rkhd->rhd", w, jnp.take(v, idx, axis=0))

    dg = jnp.asarray(rng.normal(size=out_t.shape).astype(np.float32))
    dv_t = jax.vjp(lambda v: knn_table_conv(v, idx, w, ridx, rw), v)[1](dg)[0]
    dv_a = jax.vjp(fwd_ad, v)[1](dg)[0]
    np.testing.assert_allclose(np.asarray(dv_t), np.asarray(dv_a),
                               rtol=1e-5, atol=1e-5)


def test_v2_dense_adj_conv_matches_edge_list(rng):
    """round 5: the block-dense conv plan (data/batching.dense_adj — one
    batched MXU matmul per direction) equals the masked edge-list
    gcn_conv path in forward AND gradient, including per-edge weights and
    duplicate-edge accumulation."""
    from difformer_tpu.data.batching import dense_adj
    from difformer_tpu.data.transforms import knn_graph

    xs, eis, ews = [], [], []
    for n in (9, 14, 11):
        pos = rng.normal(size=(n, 3)).astype(np.float32)
        xs.append(np.concatenate(
            [rng.normal(size=(n, 5)).astype(np.float32), pos], axis=1))
        ei = knn_graph(pos, 4, include_self=True)
        # duplicate one edge: dense_adj must accumulate like segment_sum
        ei = np.concatenate([ei, ei[:, :1]], axis=1)
        eis.append(ei)
        ews.append(rng.uniform(0.5, 1.5, ei.shape[1]).astype(np.float32))
    batch = pad_graph_batch(xs, eis, [0.0, 1.0, 0.0], edge_weights=ews)
    A = dense_adj(batch)
    assert A is not None
    B, M = batch.node_feat.shape[:2]
    assert A.shape == (B, M, M)

    model = DIFFormerV2(hidden_channels=16, out_channels=4, num_layers=2,
                        dropout=0.0)
    args = (jnp.asarray(batch.node_feat), jnp.asarray(batch.node_mask),
            jnp.asarray(batch.n_nodes), jnp.asarray(batch.senders),
            jnp.asarray(batch.receivers), jnp.asarray(batch.edge_weight),
            jnp.asarray(batch.edge_mask))
    params = model.init(jax.random.PRNGKey(0), *args, train=False)["params"]
    out_e = model.apply({"params": params}, *args, train=False)
    out_d = model.apply({"params": params}, *args, train=False,
                        dense_adj=jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_e),
                               rtol=1e-5, atol=1e-5)

    def loss_e(p):
        return jnp.sum(model.apply({"params": p}, *args, train=False) ** 2)

    def loss_d(p):
        return jnp.sum(model.apply({"params": p}, *args, train=False,
                                   dense_adj=jnp.asarray(A)) ** 2)

    for a, b in zip(jax.tree_util.tree_leaves(jax.grad(loss_e)(params)),
                    jax.tree_util.tree_leaves(jax.grad(loss_d)(params))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_dense_adj_gating():
    """dense_adj declines when M exceeds max_m or B·M² exceeds the HBM
    budget (large per-graph node counts stay on the gather plans)."""
    from difformer_tpu.data.batching import dense_adj

    rng = np.random.default_rng(0)
    xs = [rng.normal(size=(20, 4)).astype(np.float32) for _ in range(3)]
    eis = [np.stack([np.arange(20), np.roll(np.arange(20), 1)]).astype(
        np.int64) for _ in range(3)]
    b = pad_graph_batch(xs, eis, [0.0, 1.0, 0.0])
    assert dense_adj(b) is not None
    assert dense_adj(b, max_m=8) is None
    assert dense_adj(b, budget_bytes=100) is None


def test_graph_level_trainer_probes_dense_plan(rng):
    """GraphLevelTrainer elects the block-dense plan on small-graph
    datasets and its fit still trains."""
    from difformer_tpu.nn import GraphLevelModel
    from difformer_tpu.train.graph_level import GraphLevelTrainer
    from difformer_tpu.data.transforms import knn_graph

    dataset = []
    for i in range(24):
        n = int(rng.integers(8, 14))
        pos = rng.normal(size=(n, 3)).astype(np.float32)
        x = np.concatenate(
            [rng.normal(size=(n, 5)).astype(np.float32), pos], axis=1)
        ei = knn_graph(pos, 4, include_self=True)
        dataset.append((x, ei, float(i % 2)))
    enc = DIFFormerV2(hidden_channels=16, out_channels=16, num_layers=2,
                      dropout=0.0)
    model = GraphLevelModel(encoder=enc, out_channels=1)
    tr = GraphLevelTrainer(model, dataset, batch_size=8, metric="acc")
    split = {"train": np.arange(16), "valid": np.arange(16, 20),
             "test": np.arange(20, 24)}
    res = tr.fit(split, epochs=2, runs=1)
    assert tr._dense_mode is True
    assert 0.0 <= res[0]["test"] <= 1.0
