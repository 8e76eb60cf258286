"""Baseline zoo tests: forward shapes, finite outputs, end-to-end learning
for a representative subset, and gcn_norm parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difformer_tpu.data.graph import GraphData
from difformer_tpu.data.splits import rand_train_test_idx
from difformer_tpu.data.synthetic import random_graph
from difformer_tpu.data.transforms import standard_preprocess
from difformer_tpu.nn.gnns import (
    APPNPNet,
    GAT,
    GATJK,
    GCN,
    GCNJK,
    GPRGNN,
    H2GCN,
    LINK,
    MLP,
    MixHop,
    SGC,
    multi_lp,
)
from difformer_tpu.ops.graph_ops import gcn_norm
from difformer_tpu.train import FullBatchTrainer

N, E, F, C = 60, 240, 12, 3


def _graph():
    x, ei, y = random_graph(N, E, F, C, seed=11, homophily=0.8)
    ei = standard_preprocess(ei, N)
    return (
        jnp.asarray(x),
        jnp.asarray(ei[0], jnp.int32),
        jnp.asarray(ei[1], jnp.int32),
        y,
        ei,
        x,
    )


MODELS = [
    ("link", lambda: LINK(num_nodes=N, out_channels=C)),
    ("mlp", lambda: MLP(hidden_channels=16, out_channels=C)),
    ("mlp1", lambda: MLP(hidden_channels=16, out_channels=C, num_layers=1)),
    ("sgc", lambda: SGC(out_channels=C, hops=2)),
    ("gcn", lambda: GCN(hidden_channels=16, out_channels=C)),
    ("gat", lambda: GAT(hidden_channels=8, out_channels=C, heads=2)),
    ("mixhop", lambda: MixHop(hidden_channels=8, out_channels=C, hops=2)),
    ("gcnjk_max", lambda: GCNJK(hidden_channels=16, out_channels=C)),
    ("gcnjk_cat", lambda: GCNJK(hidden_channels=16, out_channels=C,
                                jk_type="cat")),
    ("gatjk", lambda: GATJK(hidden_channels=8, out_channels=C)),
    ("h2gcn", lambda: H2GCN(hidden_channels=8, out_channels=C)),
    ("appnp", lambda: APPNPNet(hidden_channels=16, out_channels=C)),
    ("gprgnn", lambda: GPRGNN(hidden_channels=16, out_channels=C)),
]


@pytest.mark.parametrize("name,ctor", MODELS, ids=[m[0] for m in MODELS])
def test_zoo_forward(name, ctor):
    x, s, r, y, _, _ = _graph()
    model = ctor()
    variables = model.init(jax.random.PRNGKey(0), x, s, r, train=False)
    out = model.apply(variables, x, s, r, train=False)
    assert out.shape == (N, C)
    assert np.isfinite(np.asarray(out)).all()
    # train mode with mutable batch stats runs too
    mutable = [k for k in variables if k != "params"]
    out2, _ = model.apply(
        variables, x, s, r, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=mutable,
    )
    assert np.isfinite(np.asarray(out2)).all()


def test_gcn_norm_matches_pyg_formula(rng):
    n, e = 20, 60
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    sj, rj, w = gcn_norm(
        jnp.asarray(s, jnp.int32), jnp.asarray(r, jnp.int32), n,
        add_self_loops=True,
    )
    # numpy reference: append loops, weighted degree over receivers
    s2 = np.concatenate([s, np.arange(n)])
    r2 = np.concatenate([r, np.arange(n)])
    deg = np.zeros(n)
    np.add.at(deg, r2, 1.0)
    inv = np.where(deg > 0, 1 / np.sqrt(deg), 0.0)
    expect = inv[s2] * inv[r2]
    np.testing.assert_allclose(np.asarray(w), expect, rtol=1e-6)


def test_multi_lp_propagates_labels():
    x, s, r, y, ei, xh = _graph()
    train_idx = np.arange(N // 2)
    out = multi_lp(ei[0], ei[1], y, train_idx, N, C, alpha=0.9, hops=1,
                   num_iters=20)
    out = np.asarray(out)
    assert out.shape == (N, C)
    test_idx = np.arange(N // 2, N)
    acc = (out[test_idx].argmax(1) == y[test_idx]).mean()
    assert acc > 1.0 / C  # better than chance on homophilous graph


def test_gcn_learns_end_to_end():
    x, s, r, y, ei, xh = _graph()
    graph = GraphData.from_numpy(xh, ei)
    model = GCN(hidden_channels=16, out_channels=C, dropout=0.0)
    trainer = FullBatchTrainer(model, graph, y, lr=1e-2, loss="nll")
    res = trainer.fit(rand_train_test_idx(y, 0.5, 0.25, rng=0), epochs=40,
                      runs=1)
    assert res[0]["test"] > 0.5, res
