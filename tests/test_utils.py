"""Utility-module tests: debug hardening, profiling, logger, sweep grid."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difformer_tpu.sweep import parse_grid
from difformer_tpu.utils.debug import assert_all_finite, checkify_step
from difformer_tpu.utils.logger import RunLogger, save_result
from difformer_tpu.utils.metrics import eval_f1, eval_rocauc, roc_auc_score


def test_assert_all_finite():
    assert_all_finite({"a": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError):
        assert_all_finite({"a": jnp.asarray([1.0, np.nan])}, "bad")


def test_checkify_step_catches_nan():
    @jax.jit
    def step(x):
        return jnp.log(x)  # nan for negative input

    checked = checkify_step(step)
    err, out = checked(jnp.asarray(-1.0))
    with pytest.raises(Exception):
        err.throw()


def test_roc_auc_matches_sklearn(rng):
    from sklearn.metrics import roc_auc_score as sk_auc

    y = rng.integers(0, 2, 200)
    s = rng.normal(size=200)
    np.testing.assert_allclose(roc_auc_score(y, s), sk_auc(y, s), rtol=1e-10)
    # with ties
    s_t = np.round(s, 1)
    np.testing.assert_allclose(roc_auc_score(y, s_t), sk_auc(y, s_t),
                               rtol=1e-10)


def test_eval_rocauc_multitask(rng):
    y = rng.integers(0, 2, (100, 3))
    scores = rng.normal(size=(100, 3))
    v = eval_rocauc(y, scores)
    assert 0.0 <= v <= 1.0


def test_eval_f1_micro_equals_acc(rng):
    y = rng.integers(0, 4, 100)
    logits = rng.normal(size=(100, 4))
    acc = (logits.argmax(1) == y).mean()
    np.testing.assert_allclose(eval_f1(y, logits), acc, rtol=1e-9)


def test_logger_jsonl(tmp_path):
    p = tmp_path / "log.jsonl"
    lg = RunLogger(1, jsonl_path=str(p))
    lg.add_result(0, (0.5, 0.6, 0.55, 1.2))
    lg.add_result(0, (0.7, 0.8, 0.75, 0.9))
    rows = [json.loads(l) for l in p.read_text().splitlines()]
    assert rows[1]["valid"] == 0.8 and rows[1]["valid_loss"] == 0.9
    s = lg.run_summary(0)
    assert s["best_epoch"] == 1


def test_logger_loss_selection():
    lg = RunLogger(1, select_by="loss")
    lg.add_result(0, (0.5, 0.9, 0.5, 2.0))
    lg.add_result(0, (0.6, 0.3, 0.9, 0.5))   # lower loss wins despite valid
    assert lg.best_epoch(0) == 1


def test_save_result_csv(tmp_path):
    p = tmp_path / "res.csv"
    save_result(str(p), {"lr": 0.01}, {"test_mean": 0.9, "test_std": 0.01})
    save_result(str(p), {"lr": 0.02}, {"test_mean": 0.8, "test_std": 0.02})
    lines = p.read_text().splitlines()
    assert len(lines) == 3 and lines[0].startswith("lr")


def test_parse_grid():
    g = parse_grid(["lr=0.1,0.01", "hidden_channels=32,64", "kernel=simple"])
    assert g["lr"] == [0.1, 0.01]
    assert g["hidden_channels"] == [32, 64]
    assert g["kernel"] == ["simple"]


def test_simple_logger_aggregation(capsys):
    from difformer_tpu.utils.logger import SimpleLogger

    lg = SimpleLogger("sweep", ("lr", "wd"), num_values=2)
    lg.add_result(0, (0.01, 0.0), (0.5, 0.7))
    lg.add_result(1, (0.01, 0.0), (0.6, 0.9))
    lg.add_result(0, (0.1, 0.0), (0.4, 0.5))
    # best setting by mean of the LAST value column
    assert lg.get_best() == [(0.01, 0.0)]
    out = lg.display()
    mean, std = out[(0.01, 0.0)]
    np.testing.assert_allclose(mean, [55.0, 80.0])
    # sample std (ddof=1) over the two runs, x100 scale
    np.testing.assert_allclose(std, [np.std([50, 60], ddof=1),
                                     np.std([70, 90], ddof=1)])
    assert "Args" in capsys.readouterr().out
