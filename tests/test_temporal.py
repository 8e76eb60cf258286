"""Temporal models + training engine tests."""

import jax
import jax.numpy as jnp
import numpy as np

from difformer_tpu.data.synthetic import random_temporal_sequence
from difformer_tpu.nn import DIFFormer
from difformer_tpu.nn.temporal import DCRNN, DConv, MPNNLSTM
from difformer_tpu.train.temporal import (
    TemporalTrainer,
    temporal_signal_split,
)

N, T, F = 24, 12, 4


def test_dconv_shapes(rng):
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    s = jnp.asarray(rng.integers(0, N, 100), jnp.int32)
    r = jnp.asarray(rng.integers(0, N, 100), jnp.int32)
    m = DConv(out_channels=8, K=3)
    v = m.init(jax.random.PRNGKey(0), x, s, r)
    out = m.apply(v, x, s, r)
    assert out.shape == (N, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_dcrnn_state_recurrence(rng):
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    s = jnp.asarray(rng.integers(0, N, 80), jnp.int32)
    r = jnp.asarray(rng.integers(0, N, 80), jnp.int32)
    m = DCRNN(hidden_channels=8, out_channels=1)
    v = m.init(jax.random.PRNGKey(0), x, s, r)
    out1, h1 = m.apply(v, x, s, r, return_state=True)
    out2, h2 = m.apply(v, x, s, r, h=h1, return_state=True)
    assert out1.shape == (N, 1)
    assert np.abs(np.asarray(h2 - h1)).max() > 0  # state evolves


def test_mpnn_lstm_window(rng):
    W = 3
    x = jnp.asarray(rng.normal(size=(W * N, F)).astype(np.float32))
    s = jnp.asarray(rng.integers(0, W * N, 60), jnp.int32)
    r = jnp.asarray(rng.integers(0, W * N, 60), jnp.int32)
    m = MPNNLSTM(hidden_channels=8, out_channels=1, num_nodes=N, window=W,
                 dropout=0.0)
    v = m.init(jax.random.PRNGKey(0), x, s, r, train=False)
    out = m.apply(v, x, s, r, train=False)
    assert out.shape == (N,)


def test_temporal_trainer_cumulative_learns():
    snaps = random_temporal_sequence(N, 20, F, seed=0)
    train, valtest = temporal_signal_split(snaps, 0.6)
    val, test = temporal_signal_split(valtest, 0.5)
    model = DIFFormer(hidden_channels=8, out_channels=1, num_layers=2,
                      dropout=0.0, kernel="simple")
    tr = TemporalTrainer(model, lr=1e-2, weight_decay=0.0, mode="cumulative")
    res = tr.fit(train, val, test, epochs=30, early_stopping=30)
    assert np.isfinite(res["test"])
    # AR(1) target: predicting ~0.9x of first feature should beat variance
    base = np.mean([np.var(s.target) for s in test])
    assert res["test"] < base * 1.5


def test_temporal_trainer_incremental_mode():
    snaps = random_temporal_sequence(N, 10, F, seed=1)
    train, valtest = temporal_signal_split(snaps, 0.6)
    val, test = temporal_signal_split(valtest, 0.5)
    model = DIFFormer(hidden_channels=8, out_channels=1, num_layers=1,
                      dropout=0.0)
    tr = TemporalTrainer(model, lr=5e-3, mode="incremental")
    res = tr.fit(train, val, test, epochs=10, early_stopping=10)
    assert np.isfinite(res["test"])


def test_rebuild_knn_mode():
    snaps = random_temporal_sequence(N, 8, F, seed=2)
    train, valtest = temporal_signal_split(snaps, 0.6)
    val, test = temporal_signal_split(valtest, 0.5)
    model = DIFFormer(hidden_channels=8, out_channels=1, num_layers=1,
                      dropout=0.0)
    tr = TemporalTrainer(model, lr=5e-3, rebuild="knn")
    res = tr.fit(train, val, test, epochs=5, early_stopping=5)
    assert np.isfinite(res["test"])


def test_scan_epoch_matches_python_loop():
    """The one-dispatch lax.scan epoch (use_scan=True, default) produces the
    same losses and trained params as the per-snapshot python loop, for both
    optimization modes and with dropout active (same rng split sequence)."""
    snaps = random_temporal_sequence(N, 10, F, seed=3)
    for mode in ("cumulative", "incremental"):
        model = DIFFormer(hidden_channels=8, out_channels=1, num_layers=2,
                          dropout=0.3, kernel="simple")
        results = {}
        for use_scan in (True, False):
            tr = TemporalTrainer(model, lr=1e-2, weight_decay=5e-4,
                                 mode=mode, use_scan=use_scan)
            data = tr._prep(snaps)
            params = tr.init_params(snaps[0])
            opt_state = tr.tx.init(params)
            rng = jax.random.PRNGKey(7)
            costs = []
            for _ in range(3):
                rng, sk = jax.random.split(rng)
                params, opt_state, c = tr.epoch_train(
                    params, opt_state, data, sk)
                costs.append(c)
            results[use_scan] = (costs, params, tr.evaluate(params, data))
        c_scan, p_scan, e_scan = results[True]
        c_loop, p_loop, e_loop = results[False]
        np.testing.assert_allclose(c_scan, c_loop, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(e_scan, e_loop, rtol=1e-6, atol=1e-7)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            p_scan, p_loop)
