"""Temporal graph dataset loaders (spatial-temporal track).

The reference uses torch_geometric_temporal's loaders
(``spatial-temporal/main.py:39-63``: chickenpox / wikimath / covid /
twitter-tennis), which download JSON files. These parsers read the same JSON
formats from disk (zero-egress) and emit ``TemporalSnapshot`` sequences with
lagged node features — matching torch_geometric_temporal's
``StaticGraphTemporalSignal``/``DynamicGraphTemporalSignal`` semantics.
"""

from __future__ import annotations

import json
import os
from typing import List

import numpy as np

from difformer_tpu.data.graph import TemporalSnapshot


def _need(path, what):
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{what} not found at {path} (zero-egress env: place the "
            f"torch_geometric_temporal JSON there, or use synthetic data)"
        )
    return path


def load_chickenpox(data_dir, lags=4) -> List[TemporalSnapshot]:
    """Hungary chickenpox (static graph, weekly county counts): features =
    last ``lags`` standardized counts, target = next count."""
    path = _need(os.path.join(data_dir, "chickenpox.json"), "chickenpox")
    with open(path) as f:
        data = json.load(f)
    edges = np.asarray(data["edges"], np.int64).T               # [2, E]
    fx = np.asarray(data["FX"], np.float32)                     # [T, N]
    stacked = fx
    snaps = []
    for t in range(lags, stacked.shape[0] - 1):
        feat = stacked[t - lags:t].T                            # [N, lags]
        target = stacked[t + 1] if False else stacked[t]
        snaps.append(TemporalSnapshot(
            node_feat=feat.copy(),
            edge_index=edges,
            edge_weight=np.ones(edges.shape[1], np.float32),
            target=stacked[t].copy(),
        ))
    return snaps


def load_wikimath(data_dir, lags=14) -> List[TemporalSnapshot]:
    """Wikipedia math visits (static weighted graph, daily)."""
    path = _need(os.path.join(data_dir, "wikivital_mathematics.json"),
                 "wikimath")
    with open(path) as f:
        data = json.load(f)
    edges = np.asarray(data["edges"], np.int64).T
    weights = np.asarray(data["weights"], np.float32)
    T = data["time_periods"]
    n = max(int(e) for pair in data["edges"] for e in pair) + 1
    y = np.zeros((T, n), np.float32)
    for t in range(T):
        y[t] = np.asarray(data[str(t)]["y"], np.float32)
    mu, sigma = y.mean(), y.std()
    y_std = (y - mu) / max(sigma, 1e-9)
    snaps = []
    for t in range(lags, T):
        feat = y_std[t - lags:t].T                              # [N, lags]
        snaps.append(TemporalSnapshot(
            node_feat=feat.copy(),
            edge_index=edges,
            edge_weight=weights,
            target=y_std[t].copy(),
        ))
    return snaps


def load_england_covid(data_dir, lags=8) -> List[TemporalSnapshot]:
    """England covid cases (dynamic graph: per-step edge lists/weights)."""
    path = _need(os.path.join(data_dir, "england_covid.json"),
                 "england covid")
    with open(path) as f:
        data = json.load(f)
    T = data["time_periods"]
    fx = np.asarray(data["y"], np.float32)                      # [T, N]
    mu, sigma = fx.mean(), fx.std()
    fx = (fx - mu) / max(sigma, 1e-9)
    snaps = []
    for t in range(lags, T - 1):
        edges = np.asarray(data[f"edge_mapping"]["edge_index"][str(t)],
                           np.int64).T
        w = np.asarray(data["edge_mapping"]["edge_weight"][str(t)],
                       np.float32)
        feat = fx[t - lags:t].T
        snaps.append(TemporalSnapshot(
            node_feat=feat.copy(),
            edge_index=edges,
            edge_weight=w,
            target=fx[t].copy(),
        ))
    return snaps


LOADERS = {
    "chickenpox": load_chickenpox,
    "wikimath": load_wikimath,
    "covid": load_england_covid,
}


def load_temporal_dataset(name, data_dir, **kw):
    if name not in LOADERS:
        raise ValueError(f"unknown temporal dataset {name!r}")
    return LOADERS[name](data_dir, **kw)
