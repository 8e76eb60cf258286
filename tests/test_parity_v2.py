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
    idx, w = t

    model = DIFFormerV2(hidden_channels=16, out_channels=4, num_layers=2,
                        dropout=0.0)
    args = (jnp.asarray(batch.node_feat), jnp.asarray(batch.node_mask),
            jnp.asarray(batch.n_nodes), jnp.asarray(batch.senders),
            jnp.asarray(batch.receivers), None,
            jnp.asarray(batch.edge_mask))
    params = model.init(jax.random.PRNGKey(0), *args, train=False)["params"]
    out_e = model.apply({"params": params}, *args, train=False)
    out_k = model.apply({"params": params}, *args, train=False,
                        knn_table=(jnp.asarray(idx), jnp.asarray(w)))
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_e),
                               rtol=1e-5, atol=1e-5)

    # non-regular batch (drop an edge) -> builder declines
    eis[0] = eis[0][:, :-1]
    b2 = pad_graph_batch(xs, eis, [0.0, 1.0, 0.0])
    assert regular_knn_table(b2) is None
