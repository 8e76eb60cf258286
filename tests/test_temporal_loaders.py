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


def _tennis_payload(T, N, nested):
    rng = np.random.default_rng(3)
    data = {"time_periods": T}
    per_t = {}
    for t in range(T):
        e = [[int(rng.integers(0, N)), int(rng.integers(0, N))]
             for _ in range(2 * N)]
        payload = {
            "edges": e,
            "weights": rng.random(2 * N).tolist(),
            # raw features: [degree, transitivity]
            "X": np.stack([rng.integers(0, 200, N),
                           rng.random(N)], axis=1).tolist(),
            "y": rng.integers(0, 50, N).tolist(),
        }
        per_t[str(t)] = payload
    if nested:
        data.update(per_t)
    else:
        for key in ("edges", "weights", "X", "y"):
            data[key] = {t: v[key] for t, v in per_t.items()}
    return data


def test_twitter_tennis_both_layouts(tmp_path):
    from difformer_tpu.data.temporal_loaders import load_twitter_tennis

    T, N = 6, 8
    for nested in (True, False):
        data = _tennis_payload(T, N, nested)
        (tmp_path / "twitter_tennis_rg17.json").write_text(json.dumps(data))
        snaps = load_twitter_tennis(str(tmp_path), "rg17")
        assert len(snaps) == T - 1
        s = snaps[0]
        assert s.node_feat.shape == (N, 16)           # encoded 5+11 dims
        np.testing.assert_allclose(s.node_feat.sum(axis=1), 2.0)  # two one-hots
        assert s.edge_index.shape[0] == 2
        assert s.target.shape == (N,)
        assert (s.target >= 0).all()                   # log1p of counts
        # offset: target at t comes from y[t+1]
        y1 = np.asarray(data["1"]["y"] if nested else data["y"]["1"],
                        np.float32)
        np.testing.assert_allclose(s.target, np.log(1.0 + y1), rtol=1e-6)


def test_twitter_tennis_dispatch(tmp_path):
    from difformer_tpu.data.temporal_loaders import load_temporal_dataset

    data = _tennis_payload(4, 5, nested=True)
    (tmp_path / "twitter_tennis_uo17.json").write_text(json.dumps(data))
    snaps = load_temporal_dataset("twitter_uo", str(tmp_path))
    assert len(snaps) == 3
