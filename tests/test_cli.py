"""CLI smoke tests + fixed-seed golden regression (guards numeric drift —
the reference's de-facto test strategy is rerun-and-compare printed accuracy,
SURVEY.md §4; here it is automated)."""

import numpy as np
import pytest

from difformer_tpu.cli import main, parse_method
from difformer_tpu.utils.config import Config, make_config


def test_presets_applied():
    cfg = make_config("cora")
    assert cfg.num_layers == 8 and cfg.hidden_channels == 64
    assert cfg.rand_split_class
    cfg2 = make_config("cora", num_layers=2)
    assert cfg2.num_layers == 2  # override wins


def test_parse_method_full_zoo():
    cfg = Config()
    for m in ["difformer", "mlp", "gcn", "gat", "sgc", "link", "mixhop",
              "gcnjk", "gatjk", "h2gcn", "appnp", "gprgnn", "dcrnn",
              "mpnn_lstm"]:
        model = parse_method(cfg.replace(method=m), 100, 3)
        assert model is not None
    with pytest.raises(ValueError):
        parse_method(cfg.replace(method="nope"), 100, 3)


def test_cli_node_synthetic():
    res = main([
        "--dataset", "synthetic-200-800-8-3", "--epochs", "15", "--runs",
        "1", "--rand_split", "true", "--hidden_channels", "8",
        "--dropout", "0.0", "--display_step", "100",
    ])
    assert res[0]["test"] > 0.4


def test_cli_temporal_synthetic():
    res = main([
        "--dataset", "chickenpox", "--epochs", "3", "--runs", "1",
        "--hidden_channels", "4", "--display_step", "100",
    ])  # falls back to synthetic temporal data with a warning
    assert np.isfinite(res).all()


def test_golden_fixed_seed_accuracy():
    """Fixed seed + fixed synthetic graph must stay above a floor; catches
    silent numeric regressions in ops/model/optimizer."""
    res = main([
        "--dataset", "synthetic-500-2000-16-3", "--epochs", "40", "--runs",
        "1", "--rand_split", "true", "--hidden_channels", "16", "--seed",
        "123", "--dropout", "0.0", "--display_step", "100",
    ])
    assert res[0]["test"] >= 0.9, res


def test_cli_reorder_and_bsr_spmm():
    """--reorder rcm + --spmm bsr: locality renumbering plus the MXU
    block-sparse hybrid reach the same training quality as default ELL."""
    common = ["--dataset", "synthetic-300-2400-8-3", "--epochs", "20",
              "--runs", "1", "--rand_split", "true", "--hidden_channels",
              "8", "--dropout", "0.0", "--display_step", "100",
              "--seed", "7"]
    base = main(common)
    res = main(common + ["--reorder", "rcm", "--spmm", "bsr",
                         "--bsr_tile", "64"])
    assert res[0]["test"] > 0.4
    assert abs(res[0]["test"] - base[0]["test"]) < 0.25


def test_cli_bsr_sorted_bucketed_spmm():
    """--spmm bsr-sorted: hub-clustering relabel + the Kb-bucketed
    block-sparse hybrid trains to the same quality as default ELL."""
    common = ["--dataset", "synthetic-300-2400-8-3", "--epochs", "20",
              "--runs", "1", "--rand_split", "true", "--hidden_channels",
              "8", "--dropout", "0.0", "--display_step", "100",
              "--seed", "7"]
    base = main(common)
    res = main(common + ["--spmm", "bsr-sorted", "--bsr_tile", "64"])
    assert res[0]["test"] > 0.4
    assert abs(res[0]["test"] - base[0]["test"]) < 0.25


def test_cli_label_propagation():
    """--method lp: parameterless MultiLP propagation scored per run
    (reference gnns.py:203-253 wired through the method factory)."""
    res = main([
        "--dataset", "synthetic-500-3000-16-3", "--method", "lp",
        "--runs", "2", "--rand_split", "true", "--hops", "1",
        "--lp_alpha", "0.9",
    ])
    assert len(res) == 2
    assert res[0]["test"] > 0.4, res


def test_cli_graph_task_synthetic():
    """task=graph falls back to synthetic small graphs; the DIFFormerV2 +
    pooling head pipeline trains end-to-end."""
    res = main([
        "--dataset", "actstrack", "--task", "graph", "--epochs", "2",
        "--runs", "1", "--hidden_channels", "8", "--num_layers", "2",
        "--batch_size", "16", "--metric", "acc", "--dropout", "0.0",
    ])
    assert np.isfinite(res[0]["test"])


def test_golden_sigmoid_kernel_accuracy():
    """DIFFormer-a (O(N^2) sigmoid kernel) end-to-end floor on the fixed
    synthetic graph — covers the blockwise XLA dispatch in training."""
    res = main([
        "--dataset", "synthetic-400-1600-16-3", "--epochs", "40", "--runs",
        "1", "--rand_split", "true", "--kernel", "sigmoid",
        "--hidden_channels", "16", "--seed", "123", "--dropout", "0.0",
        "--display_step", "100",
    ])
    assert res[0]["test"] >= 0.85, res
