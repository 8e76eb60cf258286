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


def _small_task(seed=5, n=140, c=3):
    x, ei, y = random_graph(n, 650, 12, c, seed=seed, homophily=0.85)
    g = GraphData.from_numpy(x, standard_preprocess(ei, n))
    split = rand_train_test_idx(y, 0.5, 0.25, rng=0)
    return g, y, split


def test_scanned_fit_matches_per_epoch_loop():
    """fit(epoch_block=N) — one jitted lax.scan per N epochs with on-device
    eval — reproduces the per-epoch loop: same best-val selection, same
    logged per-epoch metrics (incl. eval_step gating and the forced
    final-epoch eval), with a non-divisor block length (trailing overshoot
    discarded host-side)."""
    g, y, split = _small_task()

    def run(epoch_block):
        m = DIFFormer(hidden_channels=16, out_channels=3, num_layers=2,
                      dropout=0.0)
        t = FullBatchTrainer(m, g, y, lr=1e-2, weight_decay=5e-4, seed=7)
        logger = RunLogger(1)
        res = t.fit(split, epochs=23, runs=1, eval_step=3, logger=logger,
                    epoch_block=epoch_block)
        return res[0], logger.results[0]

    best_loop, log_loop = run(0)
    best_scan, log_scan = run(8)
    assert len(log_scan) == len(log_loop)
    np.testing.assert_allclose(np.asarray(log_scan), np.asarray(log_loop),
                               rtol=0, atol=1e-6)
    assert best_scan["epoch"] == best_loop["epoch"]
    for k in ("train", "valid", "test"):
        np.testing.assert_allclose(best_scan[k], best_loop[k], atol=1e-6)


def test_scanned_fit_bce_path_matches():
    """bce loss with 1-D int labels (one-hot labels_train): device argmax
    acc == host eval_acc on the original labels."""
    g, y, split = _small_task(seed=9)

    def run(epoch_block):
        m = DIFFormer(hidden_channels=16, out_channels=3, num_layers=2,
                      dropout=0.0)
        t = FullBatchTrainer(m, g, y, lr=1e-2, weight_decay=0.0, loss="bce",
                             seed=3)
        return t.fit(split, epochs=12, runs=1, eval_step=1,
                     epoch_block=epoch_block)[0]

    a, b = run(0), run(4)
    assert a["epoch"] == b["epoch"]
    for k in ("train", "valid", "test"):
        np.testing.assert_allclose(a[k], b[k], atol=1e-6)


def test_device_split_metrics_match_host():
    """_device_split_metrics == METRICS host functions for the eligible
    cases (acc on int labels, acc on one-hot, mse)."""
    import jax.numpy as jnp

    from difformer_tpu.utils.metrics import METRICS

    rng = np.random.default_rng(0)
    n, c, s = 64, 5, 3
    out = rng.normal(size=(n, c)).astype(np.float32)
    labels_int = rng.integers(0, c, n)
    masks = rng.random((s, n)) < 0.5
    masks[:, 0] = True  # no empty split

    g, y, split = _small_task()
    m = DIFFormer(hidden_channels=8, out_channels=c, num_layers=1,
                  dropout=0.0)

    t = FullBatchTrainer(m, g, y[:140], metric="acc")
    got = np.asarray(t._device_split_metrics(
        jnp.asarray(out), jnp.asarray(labels_int), jnp.asarray(masks)))
    want = [METRICS["acc"](labels_int[mk], out[mk]) for mk in masks]
    np.testing.assert_allclose(got, want, atol=1e-6)

    onehot = np.eye(c, dtype=np.float32)[labels_int]
    got_oh = np.asarray(t._device_split_metrics(
        jnp.asarray(out), jnp.asarray(onehot), jnp.asarray(masks)))
    np.testing.assert_allclose(got_oh, want, atol=1e-6)

    t_mse = FullBatchTrainer(m, g, y[:140], metric="mse", loss="mse")
    targets = rng.normal(size=(n, c)).astype(np.float32)
    got_mse = np.asarray(t_mse._device_split_metrics(
        jnp.asarray(out), jnp.asarray(targets), jnp.asarray(masks)))
    want_mse = [METRICS["mse"](targets[mk], out[mk]) for mk in masks]
    np.testing.assert_allclose(got_mse, want_mse, rtol=1e-5)


def test_scanned_fit_fallback_conditions():
    """Host-metric / per-epoch-host-access configs fall back to the loop."""
    g, y, split = _small_task()
    m = DIFFormer(hidden_channels=8, out_channels=3, num_layers=1,
                  dropout=0.0)
    t = FullBatchTrainer(m, g, y, metric="rocauc", loss="bce")
    assert not t._scan_eligible(8, 1, False, False, "", 0, False)
    t2 = FullBatchTrainer(m, g, y, metric="acc")
    assert t2._scan_eligible(8, 1, False, False, "", 0, False)
    assert not t2._scan_eligible(8, 1, True, False, "", 0, False)   # save_best
    assert not t2._scan_eligible(8, 1, False, True, "", 0, False)   # print_prop
    assert not t2._scan_eligible(8, 1, False, False, "d", 3, False)  # ckpt
    assert not t2._scan_eligible(1, 1, False, False, "", 0, False)  # block<=1


def test_scanned_fit_rocauc_device_path():
    """Multilabel rocauc (the proteins shape) is now scan-eligible: device
    AUC == host eval_rocauc, scanned fit == per-epoch loop."""
    rng = np.random.default_rng(3)
    n, t = 150, 6
    x, ei, _ = random_graph(n, 650, 12, 3, seed=5, homophily=0.85)
    y = (rng.random((n, t)) < 0.4).astype(np.float32)
    g = GraphData.from_numpy(x, standard_preprocess(ei, n))
    split = {"train": np.arange(0, 70), "valid": np.arange(70, 110),
             "test": np.arange(110, 150)}

    def run(epoch_block):
        m = DIFFormer(hidden_channels=16, out_channels=t, num_layers=2,
                      dropout=0.0)
        tr = FullBatchTrainer(m, g, y, lr=1e-2, weight_decay=0.0,
                              loss="bce", metric="rocauc", seed=4)
        assert tr._scan_eligible(8, 1, False, False, "", 0, False)
        return tr.fit(split, epochs=10, runs=1, eval_step=2,
                      epoch_block=epoch_block)[0]

    a, b = run(0), run(8)
    assert a["epoch"] == b["epoch"], (a, b)
    for k in ("train", "valid", "test"):
        np.testing.assert_allclose(a[k], b[k], atol=2e-5)


def test_minibatch_rocauc_device_eval_matches_host():
    """MiniBatchTrainer multilabel eval: device AUC path == host metric."""
    import jax.numpy as jnp

    from difformer_tpu.train.minibatch import MiniBatchTrainer
    from difformer_tpu.utils.metrics import eval_rocauc

    rng = np.random.default_rng(6)
    n, t = 200, 5
    x, ei, _ = random_graph(n, 900, 10, 3, seed=6, homophily=0.85)
    ei = standard_preprocess(ei, n)
    y = (rng.random((n, t)) < 0.35).astype(np.float32)
    model = DIFFormer(hidden_channels=16, out_channels=t, num_layers=2,
                      dropout=0.0)
    tr = MiniBatchTrainer(model, x, ei, y, batch_size=80, loss="bce",
                          metric="rocauc")
    params, _ = tr.init_state(0)
    split = {"train": np.arange(0, 100), "valid": np.arange(100, 150),
             "test": np.arange(150, 200)}
    res, out = tr.evaluate(params, split)
    assert out is None            # device path taken
    logits = np.asarray(tr._full_forward(params))
    for name, idx in split.items():
        want = eval_rocauc(y[idx], logits[idx])
        np.testing.assert_allclose(res[name], want, atol=2e-5)


def test_scanned_fit_mse_float_targets():
    """Regression (r4 review): loss='mse' must keep FLOAT targets (the
    generic path int32-cast them), and the no-eval scanned branch must
    still eval at epoch 0 like the per-epoch loop."""
    rng = np.random.default_rng(11)
    n = 140
    x, ei, _ = random_graph(n, 650, 12, 3, seed=5, homophily=0.85)
    y = rng.normal(size=(n,)).astype(np.float32) * 0.3
    g = GraphData.from_numpy(x, standard_preprocess(ei, n))
    split = {"train": np.arange(0, 70), "valid": np.arange(70, 105),
             "test": np.arange(105, 140)}

    def run(epoch_block, eval_step):
        m = DIFFormer(hidden_channels=16, out_channels=1, num_layers=2,
                      dropout=0.0)
        t = FullBatchTrainer(m, g, y, lr=1e-2, weight_decay=0.0,
                             loss="mse", metric="mse", seed=2)
        # float targets preserved (the bug truncated them to int)
        assert np.asarray(t.labels_train).dtype == np.float32
        logger = RunLogger(1)
        res = t.fit(split, epochs=12, runs=1, eval_step=eval_step,
                    epoch_block=epoch_block, logger=logger)
        return res[0], logger.results[0]

    # NOTE best-val tracking maximizes; for mse the reference's loggers use
    # a val-loss mode — here we only check scanned == loop consistency
    for eval_step in (1, 100):   # 100 > epochs exercises the no-eval branch
        a, la = run(0, eval_step)
        b, lb = run(8, eval_step)
        assert len(la) == len(lb), (eval_step, la, lb)
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   rtol=1e-5, atol=1e-6)
        assert a["epoch"] == b["epoch"]
