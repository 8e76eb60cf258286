"""Mini-batch and graph-level engine tests."""

import numpy as np

from difformer_tpu.data.splits import get_random_idx_split, rand_train_test_idx
from difformer_tpu.data.synthetic import random_graph, random_small_graphs
from difformer_tpu.data.transforms import standard_preprocess
from difformer_tpu.nn import DIFFormer, DIFFormerV2, GraphLevelModel
from difformer_tpu.train.graph_level import GraphLevelTrainer
from difformer_tpu.train.minibatch import MiniBatchTrainer


def test_minibatch_trainer_learns():
    n, c = 300, 3
    x, ei, y = random_graph(n, 1500, 10, c, seed=9, homophily=0.85)
    ei = standard_preprocess(ei, n)
    model = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                      dropout=0.0)
    tr = MiniBatchTrainer(model, x, ei, y, batch_size=100, lr=1e-2,
                          loss="nll", metric="acc")
    split = rand_train_test_idx(y, 0.5, 0.25, rng=0)
    res = tr.fit(split, epochs=20, runs=1, eval_step=5)
    assert res[0]["test"] > 0.5, res


def test_graph_level_trainer_learns():
    graphs = random_small_graphs(120, seed=4)
    enc = DIFFormerV2(hidden_channels=16, out_channels=16, num_layers=2,
                      dropout=0.0)
    model = GraphLevelModel(encoder=enc, out_channels=1, graph_pooling="mean")
    tr = GraphLevelTrainer(model, graphs, batch_size=16, lr=5e-3,
                           metric="rocauc")
    split = get_random_idx_split(len(graphs), 0.6, 0.2, rng=0)
    res = tr.fit(split, epochs=10, runs=1)
    assert res[0]["test"] > 0.7, res
    assert "seconds" in res[0]


def test_minibatch_scan_matches_loop():
    """The one-dispatch-per-epoch scan engine (device-resident features,
    host-shipped chunk plans) reproduces the per-chunk loop exactly: same
    rng stream, same induced subgraphs, same best-val selection."""
    n, c = 300, 3
    x, ei, y = random_graph(n, 1500, 10, c, seed=11, homophily=0.85)
    ei = standard_preprocess(ei, n)
    split = rand_train_test_idx(y, 0.5, 0.25, rng=0)

    def run(use_scan):
        model = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                          dropout=0.3)
        tr = MiniBatchTrainer(model, x, ei, y, batch_size=100, lr=1e-2,
                              loss="nll", metric="acc", use_scan=use_scan)
        return tr.fit(split, epochs=8, runs=1, eval_step=2)[0]

    a, b = run(False), run(True)
    assert a["epoch"] == b["epoch"], (a, b)
    for k in ("train", "valid", "test"):
        np.testing.assert_allclose(a[k], b[k], atol=1e-6)
