"""Temporal JSON loaders parse the torch_geometric_temporal formats
(exercised with generated files — zero-egress env)."""

import json

import numpy as np

from difformer_tpu.data.temporal_loaders import (
    load_chickenpox,
    load_england_covid,
    load_wikimath,
)


def test_chickenpox_format(tmp_path):
    T, N = 20, 5
    data = {
        "edges": [[i, (i + 1) % N] for i in range(N)],
        "FX": np.random.default_rng(0).normal(size=(T, N)).tolist(),
    }
    (tmp_path / "chickenpox.json").write_text(json.dumps(data))
    snaps = load_chickenpox(str(tmp_path), lags=4)
    assert len(snaps) == T - 5
    assert snaps[0].node_feat.shape == (N, 4)
    assert snaps[0].edge_index.shape == (2, N)
    assert snaps[0].target.shape == (N,)


def test_wikimath_format(tmp_path):
    T, N = 16, 4
    rng = np.random.default_rng(1)
    data = {
        "edges": [[i, (i + 1) % N] for i in range(N)],
        "weights": [1.0] * N,
        "time_periods": T,
    }
    for t in range(T):
        data[str(t)] = {"y": rng.poisson(5, N).tolist()}
    (tmp_path / "wikivital_mathematics.json").write_text(json.dumps(data))
    snaps = load_wikimath(str(tmp_path), lags=3)
    assert len(snaps) == T - 3
    assert snaps[0].node_feat.shape == (N, 3)


def test_covid_format(tmp_path):
    T, N = 12, 6
    rng = np.random.default_rng(2)
    data = {
        "time_periods": T,
        "y": rng.normal(size=(T, N)).tolist(),
        "edge_mapping": {
            "edge_index": {
                str(t): [[i, (i + 1) % N] for i in range(N)]
                for t in range(T)
            },
            "edge_weight": {str(t): [1.0] * N for t in range(T)},
        },
    }
    (tmp_path / "england_covid.json").write_text(json.dumps(data))
    snaps = load_england_covid(str(tmp_path), lags=2)
    assert len(snaps) == T - 3
    assert snaps[0].edge_index.shape == (2, N)
