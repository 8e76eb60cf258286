"""Dataset loader tests against generated fixture files in the reference
layouts (zero-egress: real files absent, formats exercised)."""

import json
import os
import pickle

import numpy as np
import pytest
import scipy.sparse as sp

from difformer_tpu.data.loaders import (
    load_amazon_coauthor,
    load_dataset,
    load_fb100,
    load_geom_gcn,
    load_heterophilous,
    load_planetoid,
    load_twitch,
    load_yelpchi,
)


def test_missing_file_error_names_path(tmp_path):
    with pytest.raises(FileNotFoundError) as e:
        load_dataset(str(tmp_path), "pokec")
    assert "pokec" in str(e.value)


def test_synthetic_dispatch():
    ds = load_dataset("", "synthetic-100-400-8-3")
    assert ds.graph["num_nodes"] == 100
    assert ds.label.shape == (100,)
    s = ds.get_idx_split("random", rng=0)
    assert set(s) == {"train", "valid", "test"}


def test_planetoid_raw_format(tmp_path):
    n_train, n_test, n_allx, f, c = 20, 10, 40, 6, 3
    rng = np.random.default_rng(0)
    raw = tmp_path / "Planetoid" / "toy" / "raw"
    raw.mkdir(parents=True)

    x = sp.csr_matrix(rng.random((n_train, f)))
    allx = sp.csr_matrix(rng.random((n_allx, f)))
    tx = sp.csr_matrix(rng.random((n_test, f)))
    y = np.eye(c)[rng.integers(0, c, n_train)]
    ally = np.eye(c)[rng.integers(0, c, n_allx)]
    ty = np.eye(c)[rng.integers(0, c, n_test)]
    n = n_allx + n_test
    graph = {i: [int(j) for j in rng.integers(0, n, 3)] for i in range(n)}
    test_idx = np.arange(n_allx, n_allx + n_test)

    for name, obj in [("x", x), ("y", y), ("tx", tx), ("ty", ty),
                      ("allx", allx), ("ally", ally), ("graph", graph)]:
        with open(raw / f"ind.toy.{name}", "wb") as fh:
            pickle.dump(obj, fh)
    np.savetxt(raw / "ind.toy.test.index", test_idx, fmt="%d")

    ds = load_planetoid(str(tmp_path), "toy")
    assert ds.graph["num_nodes"] == n
    assert ds.graph["node_feat"].shape == (n, f)
    fixed = ds.get_idx_split("fixed")
    assert fixed["train"].shape[0] == n_train
    # row-normalized features
    sums = ds.graph["node_feat"].sum(1)
    np.testing.assert_allclose(sums[sums > 0], 1.0, rtol=1e-5)


def test_amazon_npz_format(tmp_path):
    n, f, c = 30, 5, 3
    rng = np.random.default_rng(1)
    adj = sp.random(n, n, density=0.1, format="csr")
    attr = sp.random(n, f, density=0.5, format="csr")
    d = tmp_path / "Amazon"
    d.mkdir()
    np.savez(
        d / "amazon_electronics_photo.npz",
        adj_data=adj.data, adj_indices=adj.indices, adj_indptr=adj.indptr,
        adj_shape=adj.shape,
        attr_data=attr.data, attr_indices=attr.indices,
        attr_indptr=attr.indptr, attr_shape=attr.shape,
        labels=rng.integers(0, c, n),
    )
    ds = load_amazon_coauthor(str(tmp_path), "amazon-photo")
    assert ds.graph["node_feat"].shape == (n, f)
    assert ds.graph["edge_index"].shape[0] == 2


def test_heterophilous_npz_format(tmp_path):
    n, f = 25, 4
    rng = np.random.default_rng(2)
    d = tmp_path / "heterophilous"
    d.mkdir()
    masks = np.zeros((10, n), bool)
    masks[:, :10] = True
    np.savez(
        d / "roman_empire.npz",
        edges=rng.integers(0, n, (60, 2)),
        node_features=rng.random((n, f)).astype(np.float32),
        node_labels=rng.integers(0, 3, n),
        train_masks=masks, val_masks=masks, test_masks=masks,
    )
    ds = load_heterophilous(str(tmp_path), "roman-empire")
    assert len(ds._fixed_splits) == 10
    assert ds.graph["edge_index"].shape == (2, 60)


def test_geom_gcn_format(tmp_path):
    n = 12
    rng = np.random.default_rng(3)
    d = tmp_path / "geom-gcn" / "cornell"
    d.mkdir(parents=True)
    edges = rng.integers(0, n, (30, 2))
    with open(d / "out1_graph_edges.txt", "w") as f:
        f.write("src\tdst\n")
        for a, b in edges:
            f.write(f"{a}\t{b}\n")
    with open(d / "out1_node_feature_label.txt", "w") as f:
        f.write("id\tfeat\tlabel\n")
        for i in range(n):
            feats = ",".join(str(v) for v in rng.integers(0, 2, 5))
            f.write(f"{i}\t{feats}\t{rng.integers(0, 3)}\n")
    ds = load_geom_gcn(str(tmp_path), "cornell")
    assert ds.graph["node_feat"].shape == (n, 5)
    assert ds.label.shape == (n,)


def test_fb100_mat_format(tmp_path):
    from scipy.io import savemat

    n = 20
    rng = np.random.default_rng(4)
    d = tmp_path / "facebook100"
    d.mkdir()
    A = sp.random(n, n, density=0.2, format="csc")
    local_info = np.column_stack([
        rng.integers(1, 3, n),       # status
        rng.integers(1, 3, n),       # gender (target)
        rng.integers(1, 5, n),       # major
        rng.integers(1, 4, n),
        rng.integers(1, 6, n),
        rng.integers(2000, 2010, n),
        rng.integers(1, 30, n),
    ])
    savemat(d / "Penn94.mat", {"A": A, "local_info": local_info})
    ds = load_fb100(str(tmp_path), "Penn94")
    assert ds.graph["num_nodes"] == n
    assert set(np.unique(ds.label)).issubset({-1, 0, 1})


def test_yelpchi_mat_format(tmp_path):
    from scipy.io import savemat

    n = 15
    rng = np.random.default_rng(5)
    A = sp.random(n, n, density=0.2, format="csc")
    savemat(tmp_path / "YelpChi.mat", {
        "homo": A,
        "features": sp.csr_matrix(rng.random((n, 4))),
        "label": rng.integers(0, 2, (1, n)),
    })
    ds = load_yelpchi(str(tmp_path))
    assert ds.graph["node_feat"].shape == (n, 4)


def test_twitch_raw_format(tmp_path):
    import pandas as pd

    n = 10
    d = tmp_path / "twitch" / "DE"
    d.mkdir(parents=True)
    pd.DataFrame({"from": [0, 1, 2], "to": [1, 2, 3]}).to_csv(
        d / "musae_DE_edges.csv", index=False
    )
    pd.DataFrame({
        "id": range(n), "mature": np.arange(n) % 2,
    }).to_csv(d / "musae_DE_target.csv", index=False)
    feats = {str(i): [int(i), int(i) + 1] for i in range(n)}
    (d / "musae_DE_features.json").write_text(json.dumps(feats))
    ds = load_twitch(str(tmp_path), "DE")
    assert ds.graph["num_nodes"] == n
    assert ds.label.sum() == 5


# --------------------------------------------------------------------------
# OGB raw csv.gz layout (parsed without the ogb package)
# --------------------------------------------------------------------------

def _write_csv_gz(path, arr, fmt):
    import gzip

    with gzip.open(path, "wt") as f:
        for row in np.atleast_2d(arr):
            f.write(",".join(fmt % v for v in np.atleast_1d(row)) + "\n")


def _fake_ogb(tmp_path, name, n=20, e=60, f=8, labels=None, node_feat=True,
              edge_feat=False, extras=(), split="time"):
    rng = np.random.default_rng(0)
    root = tmp_path / name.replace("-", "_")
    raw = root / "raw"
    raw.mkdir(parents=True)
    ei = rng.integers(0, n, (e, 2))
    _write_csv_gz(raw / "edge.csv.gz", ei, "%d")
    _write_csv_gz(raw / "num-node-list.csv.gz", np.array([[n]]), "%d")
    _write_csv_gz(raw / "num-edge-list.csv.gz", np.array([[e]]), "%d")
    if node_feat:
        _write_csv_gz(raw / "node-feat.csv.gz",
                      rng.normal(size=(n, f)), "%.6f")
    if edge_feat:
        _write_csv_gz(raw / "edge-feat.csv.gz",
                      rng.uniform(size=(e, f)), "%.6f")
    if labels is None:
        labels = rng.integers(0, 4, (n, 1))
    _write_csv_gz(raw / "node-label.csv.gz", labels, "%d")
    for ex, vals in extras:
        _write_csv_gz(raw / f"{ex}.csv.gz", vals.reshape(-1, 1), "%d")
    sd = root / "split" / split
    sd.mkdir(parents=True)
    idx = rng.permutation(n)
    for k, part in zip(("train", "valid", "test"),
                       np.array_split(idx, 3)):
        _write_csv_gz(sd / f"{k}.csv.gz", part.reshape(-1, 1), "%d")
    return ei


def test_ogb_raw_arxiv_layout(tmp_path):
    from difformer_tpu.data.loaders import load_ogb_raw

    years = np.random.default_rng(1).integers(2005, 2020, 20)
    ei = _fake_ogb(tmp_path, "ogbn-arxiv",
                   extras=[("node_year", years)], split="time")
    ds = load_ogb_raw(str(tmp_path), "ogbn-arxiv")
    assert ds.graph["num_nodes"] == 20
    assert ds.graph["edge_index"].shape == (2, 60)
    np.testing.assert_array_equal(ds.graph["edge_index"], ei.T)
    assert ds.graph["node_feat"].shape == (20, 8)
    assert ds.label.shape == (20,) and ds.label.dtype == np.int64
    sp = ds.get_idx_split("fixed")
    all_idx = np.sort(np.concatenate(
        [sp["train"], sp["valid"], sp["test"]]))
    np.testing.assert_array_equal(all_idx, np.arange(20))
    np.testing.assert_array_equal(ds.node_year, years)
    # second load comes from the npz cache and must be identical
    assert (tmp_path / "ogbn_arxiv" / "processed_difformer_tpu.npz").exists()
    ds2 = load_ogb_raw(str(tmp_path), "ogbn-arxiv")
    np.testing.assert_array_equal(ds2.graph["edge_index"],
                                  ds.graph["edge_index"])
    np.testing.assert_array_equal(ds2.graph["node_feat"],
                                  ds.graph["node_feat"])
    np.testing.assert_array_equal(
        ds2.get_idx_split("fixed")["test"], sp["test"])


def test_ogb_raw_proteins_inverse_edges_and_edge_feat_means(tmp_path):
    from difformer_tpu.data.loaders import load_dataset

    labels = np.random.default_rng(2).integers(0, 2, (20, 5))
    ei = _fake_ogb(tmp_path, "ogbn-proteins", labels=labels,
                   node_feat=False, edge_feat=True,
                   extras=[("node_species", np.arange(20))],
                   split="species")
    ds = load_dataset(str(tmp_path), "ogbn-proteins")
    # inverse edges appended (ogb add_inverse_edge)
    assert ds.graph["edge_index"].shape == (2, 120)
    np.testing.assert_array_equal(ds.graph["edge_index"][:, :60], ei.T)
    np.testing.assert_array_equal(ds.graph["edge_index"][0, 60:], ei.T[1])
    # node feats = mean of incident edge feats over the symmetrized edges
    ef = ds.graph["edge_feat"]
    s = ds.graph["edge_index"][0]
    node0 = ef[s == 0].mean(0)
    np.testing.assert_allclose(ds.graph["node_feat"][0], node0, rtol=1e-5)
    assert ds.label.shape == (20, 5)  # multilabel stays 2-D


def test_arxiv_year_quantile_labels(tmp_path):
    from difformer_tpu.data.loaders import load_dataset

    years = np.random.default_rng(3).integers(2000, 2020, 20)
    _fake_ogb(tmp_path, "ogbn-arxiv",
              extras=[("node_year", years)], split="time")
    ds = load_dataset(str(tmp_path), "arxiv-year")
    assert ds.name == "arxiv-year"
    assert set(np.unique(ds.label)) <= set(range(5))
    # quantile buckets are monotone in year
    for k in range(4):
        assert years[ds.label == k].max() <= years[ds.label == k + 1].min()
    # random splits (no fixed split carried over from arxiv)
    sp = ds.get_idx_split()
    assert len(sp["train"]) + len(sp["valid"]) + len(sp["test"]) <= 20


def test_prefetch_matches_and_propagates_errors():
    from difformer_tpu.data.batching import prefetch

    assert list(prefetch(iter(range(10)), depth=3)) == list(range(10))

    def boom():
        yield 1
        raise ValueError("producer failed")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    import pytest as _pytest
    with _pytest.raises(ValueError, match="producer failed"):
        list(it)
