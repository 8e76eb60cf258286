"""Training-engine tests: full-batch training learns on synthetic data."""

import numpy as np

from difformer_tpu.data.graph import GraphData
from difformer_tpu.data.splits import class_rand_splits, rand_train_test_idx
from difformer_tpu.data.synthetic import random_graph
from difformer_tpu.data.transforms import standard_preprocess
from difformer_tpu.nn import DIFFormer
from difformer_tpu.train import FullBatchTrainer
from difformer_tpu.utils.logger import RunLogger


def test_full_batch_training_beats_chance():
    n, c = 200, 4
    x, ei, y = random_graph(n, 800, 12, c, seed=1, homophily=0.8)
    ei = standard_preprocess(ei, n)
    graph = GraphData.from_numpy(x, ei)
    model = DIFFormer(hidden_channels=32, out_channels=c, num_layers=2,
                      dropout=0.2)
    trainer = FullBatchTrainer(
        model, graph, y, lr=1e-2, weight_decay=5e-4, loss="nll", metric="acc",
    )
    split = rand_train_test_idx(y, 0.5, 0.25, rng=0)
    logger = RunLogger(runs=1)
    res = trainer.fit(split, epochs=60, runs=1, logger=logger)
    assert res[0]["test"] > 0.5, res  # chance = 0.25
    stats = logger.print_statistics()
    assert stats["runs"] == 1


def test_full_batch_bce_multilabel():
    n = 120
    x, ei, y = random_graph(n, 500, 10, 2, seed=2, homophily=0.7)
    ei = standard_preprocess(ei, n)
    graph = GraphData.from_numpy(x, ei)
    model = DIFFormer(hidden_channels=16, out_channels=2, num_layers=2,
                      dropout=0.0)
    trainer = FullBatchTrainer(
        model, graph, y, lr=1e-2, weight_decay=0.0, loss="bce",
        metric="rocauc",
    )
    split = rand_train_test_idx(y, 0.5, 0.25, rng=1)
    res = trainer.fit(split, epochs=40, runs=1)
    assert res[0]["test"] > 0.6, res


def test_class_rand_splits_shapes():
    y = np.repeat(np.arange(4), 100)
    s = class_rand_splits(y, label_num_per_class=5, valid_num=50, test_num=100,
                          rng=0)
    assert s["train"].shape[0] == 20
    assert s["valid"].shape[0] == 50
    assert s["test"].shape[0] == 100
    all_idx = np.concatenate([s["train"], s["valid"], s["test"]])
    assert np.unique(all_idx).shape[0] == all_idx.shape[0]


def test_set_encoder_mode_use_graph_false():
    """image/text track: kNN-free pure set encoder (use_graph=False)."""
    n, c = 150, 3
    x, ei, y = random_graph(n, 10, 10, c, seed=3)
    graph = GraphData.from_numpy(x, ei)
    model = DIFFormer(hidden_channels=24, out_channels=c, num_layers=2,
                      use_graph=False, dropout=0.0)
    trainer = FullBatchTrainer(model, graph, y, lr=1e-2, loss="nll")
    split = class_rand_splits(y, 10, valid_num=30, test_num=60, rng=2)
    res = trainer.fit(split, epochs=50, runs=1)
    assert res[0]["test"] > 0.5, res
