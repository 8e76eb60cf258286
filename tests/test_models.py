"""Model-level tests: shapes, jit, grads, config flags."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difformer_tpu.data.batching import pad_graph_batch
from difformer_tpu.data.synthetic import random_graph, random_small_graphs
from difformer_tpu.nn import DIFFormer, DIFFormerV2, GraphLevelModel


def _graph(rng_seed=0, n=50, e=200, f=16, c=3):
    x, ei, y = random_graph(n, e, f, c, seed=rng_seed)
    return (
        jnp.asarray(x),
        jnp.asarray(ei[0], jnp.int32),
        jnp.asarray(ei[1], jnp.int32),
        y,
    )


@pytest.mark.parametrize("kernel", ["simple", "sigmoid"])
@pytest.mark.parametrize("use_graph", [True, False])
def test_difformer_forward_shapes(kernel, use_graph):
    x, s, r, _ = _graph()
    model = DIFFormer(
        hidden_channels=32, out_channels=3, num_layers=2, num_heads=2,
        kernel=kernel, use_graph=use_graph,
    )
    variables = model.init(jax.random.PRNGKey(0), x, s, r, train=False)
    out = model.apply(variables, x, s, r, train=False)
    assert out.shape == (x.shape[0], 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize(
    "flags",
    [
        dict(use_weight=False, num_heads=1),
        dict(graph_weight=0.8),
        dict(use_source=True),
        dict(use_residual=False),
        dict(use_bn=False),
    ],
)
def test_difformer_flag_matrix(flags):
    x, s, r, _ = _graph()
    model = DIFFormer(hidden_channels=16, out_channels=3, **flags)
    variables = model.init(jax.random.PRNGKey(0), x, s, r, train=False)
    out = model.apply(variables, x, s, r, train=False)
    assert out.shape == (x.shape[0], 3)


def test_difformer_jit_and_grad():
    x, s, r, y = _graph()
    model = DIFFormer(hidden_channels=16, out_channels=3)
    variables = model.init(jax.random.PRNGKey(0), x, s, r, train=False)
    labels = jnp.asarray(y)

    @jax.jit
    def loss_fn(params, rng):
        out = model.apply(
            {"params": params}, x, s, r, train=True, rngs={"dropout": rng}
        )
        logp = jax.nn.log_softmax(out)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))

    g = jax.grad(loss_fn)(variables["params"], jax.random.PRNGKey(1))
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)
    assert any(float(jnp.abs(t).sum()) > 0 for t in flat)


def test_difformer_dropout_train_vs_eval():
    x, s, r, _ = _graph()
    model = DIFFormer(hidden_channels=16, out_channels=3, dropout=0.5)
    variables = model.init(jax.random.PRNGKey(0), x, s, r, train=False)
    out1 = model.apply(variables, x, s, r, train=False)
    out2 = model.apply(variables, x, s, r, train=False)
    np.testing.assert_allclose(out1, out2)  # eval is deterministic
    t1 = model.apply(
        variables, x, s, r, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    t2 = model.apply(
        variables, x, s, r, train=True, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert np.abs(np.asarray(t1 - t2)).max() > 0


def test_difformer_output_attn():
    x, s, r, _ = _graph(n=20, e=60)
    model = DIFFormer(hidden_channels=8, out_channels=3, num_layers=2)
    variables = model.init(jax.random.PRNGKey(0), x, s, r, train=False)
    out, attns = model.apply(variables, x, s, r, train=False, output_attn=True)
    assert attns.shape == (2, 20, 20, 1)


@pytest.mark.parametrize("kernel", ["simple", "sigmoid"])
def test_difformer_v2_graph_level(kernel):
    graphs = random_small_graphs(6, seed=0)
    batch = pad_graph_batch(
        [g[0] for g in graphs],
        [g[1] for g in graphs],
        [g[2] for g in graphs],
    )
    encoder = DIFFormerV2(
        hidden_channels=16, out_channels=16, num_layers=2, kernel=kernel
    )
    model = GraphLevelModel(encoder=encoder, out_channels=1)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch.node_feat),
        jnp.asarray(batch.node_mask),
        jnp.asarray(batch.n_nodes),
        jnp.asarray(batch.senders),
        jnp.asarray(batch.receivers),
        None,
        jnp.asarray(batch.edge_mask),
        train=False,
    )
    out = model.apply(
        variables,
        jnp.asarray(batch.node_feat),
        jnp.asarray(batch.node_mask),
        jnp.asarray(batch.n_nodes),
        jnp.asarray(batch.senders),
        jnp.asarray(batch.receivers),
        None,
        jnp.asarray(batch.edge_mask),
        train=False,
    )
    assert out.shape == (6, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_v2_padding_invariance():
    """Adding padding graphs/slots must not change real-graph outputs."""
    graphs = random_small_graphs(4, seed=1)
    b1 = pad_graph_batch(
        [g[0] for g in graphs], [g[1] for g in graphs], [g[2] for g in graphs]
    )
    b2 = pad_graph_batch(
        [g[0] for g in graphs], [g[1] for g in graphs], [g[2] for g in graphs],
        max_nodes=b1.max_nodes + 5,
        batch_size=6,
        max_edges=b1.senders.shape[0] + 64,
    )
    encoder = DIFFormerV2(hidden_channels=8, out_channels=8, num_layers=1)
    model = GraphLevelModel(encoder=encoder, out_channels=1)

    def run(b):
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(b.node_feat), jnp.asarray(b.node_mask),
            jnp.asarray(b.n_nodes), jnp.asarray(b.senders),
            jnp.asarray(b.receivers), None, jnp.asarray(b.edge_mask),
            train=False,
        )
        return variables, model.apply(
            variables,
            jnp.asarray(b.node_feat), jnp.asarray(b.node_mask),
            jnp.asarray(b.n_nodes), jnp.asarray(b.senders),
            jnp.asarray(b.receivers), None, jnp.asarray(b.edge_mask),
            train=False,
        )

    v1, o1 = run(b1)
    # same params on padded batch
    o2 = model.apply(
        v1,
        jnp.asarray(b2.node_feat), jnp.asarray(b2.node_mask),
        jnp.asarray(b2.n_nodes), jnp.asarray(b2.senders),
        jnp.asarray(b2.receivers), None, jnp.asarray(b2.edge_mask),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2)[:4], rtol=2e-4,
                               atol=2e-5)


def test_spmm_first_matches_reference_order(rng):
    """(ÂX)Wv == Â(XWv) up to float reassociation — outputs and gradients,
    plain segment path and ELL path, bias correction included (rows of Â do
    NOT sum to 1)."""
    import jax
    import jax.numpy as jnp

    from difformer_tpu.nn import DIFFormer
    from difformer_tpu.ops.ell import build_ell_gcn

    n, e, f, c, h = 96, 700, 16, 5, 4
    x = rng.normal(size=(n, f)).astype(np.float32)
    s = rng.integers(0, n, e).astype(np.int64)
    r = rng.integers(0, n, e).astype(np.int64)
    xs, sj, rj = jnp.asarray(x), jnp.asarray(s, jnp.int32), jnp.asarray(r, jnp.int32)

    def build(spmm_first):
        return DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                         num_heads=h, dropout=0.0, spmm_first=spmm_first)

    m0, m1 = build(False), build(True)
    params = m0.init(jax.random.PRNGKey(0), xs, sj, rj, train=False)["params"]

    for ell in (None, build_ell_gcn(s, r, n)):
        out0 = m0.apply({"params": params}, xs, sj, rj, train=False, ell=ell)
        out1 = m1.apply({"params": params}, xs, sj, rj, train=False, ell=ell)
        np.testing.assert_allclose(out1, out0, rtol=2e-4, atol=2e-5)

        def loss(p, m, ell=ell):
            return jnp.sum(m.apply({"params": p}, xs, sj, rj, train=False,
                                   ell=ell) ** 2)

        g0 = jax.grad(loss)(params, m0)
        g1 = jax.grad(loss)(params, m1)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-3,
                                                    atol=5e-4), g0, g1)


def test_spmm_first_auto_policy(rng):
    """spmm_first='auto' (the Config/CLI default) resolves per the measured
    crossover H·D ≥ 2·(F+1): bit-identical to False at H=1 (reference
    operation order preserved) and to True at H=8 (the measured-win regime
    gets the rewrite without hand-flags — VERDICT r3 item 5)."""
    import jax
    import jax.numpy as jnp

    from difformer_tpu.nn import DIFFormer

    n, e, c = 96, 700, 5
    x = rng.normal(size=(n, 16)).astype(np.float32)
    s = rng.integers(0, n, e).astype(np.int64)
    r = rng.integers(0, n, e).astype(np.int64)
    xs = jnp.asarray(x)
    sj, rj = jnp.asarray(s, jnp.int32), jnp.asarray(r, jnp.int32)

    for h, expect_flag in ((1, False), (8, True)):
        def build(sf):
            return DIFFormer(hidden_channels=16, out_channels=c,
                             num_layers=2, num_heads=h, dropout=0.0,
                             spmm_first=sf)

        m_auto, m_fixed = build("auto"), build(expect_flag)
        params = m_auto.init(jax.random.PRNGKey(0), xs, sj, rj,
                             train=False)["params"]
        out_auto = m_auto.apply({"params": params}, xs, sj, rj, train=False)
        out_fixed = m_fixed.apply({"params": params}, xs, sj, rj, train=False)
        np.testing.assert_array_equal(np.asarray(out_auto),
                                      np.asarray(out_fixed))


def test_cli_spmm_first_tri_state():
    """--spmm_first parses 'auto'/'true'/'false' (a plain-str parse would
    turn 'false' into a truthy string)."""
    from difformer_tpu.cli import build_parser

    p = build_parser()
    assert p.parse_args(["--spmm_first", "auto"]).spmm_first == "auto"
    assert p.parse_args(["--spmm_first", "false"]).spmm_first is False
    assert p.parse_args(["--spmm_first", "true"]).spmm_first is True
    assert p.parse_args([]).spmm_first is None


def test_fuse_head_mean_matches_unfused(rng):
    """round 5: fuse_head_mean=True (head-mean folded into the attention
    contraction and the linear GCN branch — no [N, H, D] branch outputs)
    equals the reference order (mean after stacking heads) up to float
    reassociation — outputs and gradients, across spmm_first x ELL x
    graph_weight x use_source."""
    import jax
    import jax.numpy as jnp

    from difformer_tpu.nn import DIFFormer
    from difformer_tpu.ops.ell import build_ell_gcn

    n, e, f, c, h = 96, 700, 16, 5, 4
    x = rng.normal(size=(n, f)).astype(np.float32)
    s = rng.integers(0, n, e).astype(np.int64)
    r = rng.integers(0, n, e).astype(np.int64)
    xs = jnp.asarray(x)
    sj, rj = jnp.asarray(s, jnp.int32), jnp.asarray(r, jnp.int32)

    for kwargs in (dict(), dict(spmm_first=True), dict(graph_weight=0.3),
                   dict(use_source=True), dict(use_graph=False)):
        def build(fuse):
            return DIFFormer(hidden_channels=16, out_channels=c,
                             num_layers=2, num_heads=h, dropout=0.0,
                             fuse_head_mean=fuse, **kwargs)

        m0, m1 = build(False), build(True)
        params = m0.init(jax.random.PRNGKey(0), xs, sj, rj,
                         train=False)["params"]
        ells = ((None, build_ell_gcn(s, r, n))
                if kwargs.get("use_graph", True) and "spmm_first" not in
                kwargs else (None,))
        for ell in ells:
            out0 = m0.apply({"params": params}, xs, sj, rj, train=False,
                            ell=ell)
            out1 = m1.apply({"params": params}, xs, sj, rj, train=False,
                            ell=ell)
            np.testing.assert_allclose(out1, out0, rtol=2e-4, atol=2e-5,
                                       err_msg=str(kwargs))

            def loss(p, m, ell=ell):
                return jnp.sum(m.apply({"params": p}, xs, sj, rj,
                                       train=False, ell=ell) ** 2)

            g0 = jax.grad(loss)(params, m0)
            g1 = jax.grad(loss)(params, m1)
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    a, b, rtol=5e-3, atol=5e-4), g0, g1)


def test_fuse_head_mean_auto_policy(rng):
    """'auto' keeps H=1 bit-identical to the unfused reference order and
    fuses at H>1."""
    import jax
    import jax.numpy as jnp

    from difformer_tpu.nn import DIFFormer

    n, e, c = 96, 700, 5
    x = rng.normal(size=(n, 16)).astype(np.float32)
    s = rng.integers(0, n, e).astype(np.int64)
    r = rng.integers(0, n, e).astype(np.int64)
    xs = jnp.asarray(x)
    sj, rj = jnp.asarray(s, jnp.int32), jnp.asarray(r, jnp.int32)

    def build(h, fuse):
        return DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                         num_heads=h, dropout=0.0, fuse_head_mean=fuse)

    # H=1: auto == off bitwise
    m_auto, m_off = build(1, "auto"), build(1, False)
    params = m_auto.init(jax.random.PRNGKey(0), xs, sj, rj,
                         train=False)["params"]
    a = np.asarray(m_auto.apply({"params": params}, xs, sj, rj, train=False))
    b = np.asarray(m_off.apply({"params": params}, xs, sj, rj, train=False))
    assert (a == b).all()

    # H=4: auto == on bitwise
    m_auto, m_on = build(4, "auto"), build(4, True)
    params = m_auto.init(jax.random.PRNGKey(0), xs, sj, rj,
                         train=False)["params"]
    a = np.asarray(m_auto.apply({"params": params}, xs, sj, rj, train=False))
    b = np.asarray(m_on.apply({"params": params}, xs, sj, rj, train=False))
    assert (a == b).all()
