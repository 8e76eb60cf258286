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
