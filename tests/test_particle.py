"""Particle dataset pipeline tests with generated fake raw data (the real
raw files need network; the processing logic is exercised end-to-end)."""

import os
import pickle

import numpy as np
import pandas as pd
import pytest

from difformer_tpu.data.particle import (
    GraphListDataset,
    apply_filter,
    build_actstrack,
    build_tau3mu,
    get_signal_particles,
    invariant_mass,
    load_data_config,
)


def test_apply_filter_parses_reference_exprs():
    v = np.array([0, 1, 2, 3])
    np.testing.assert_array_equal(apply_filter(v, "==1"), v == 1)
    np.testing.assert_array_equal(apply_filter(v, "!=0"), v != 0)
    np.testing.assert_array_equal(apply_filter(v, ">=3"), v >= 3)
    with pytest.raises(ValueError):
        apply_filter(v, "__import__('os')")


def test_load_data_config_handles_commented_header(tmp_path):
    p = tmp_path / "cfg.yml"
    p.write_text("# data:\n  data_name: actstrack\n  im_thres: 2\n")
    cfg = load_data_config(str(p))
    assert cfg["data_name"] == "actstrack"
    assert cfg["im_thres"] == 2


def test_invariant_mass_z_pair():
    """Back-to-back massless-ish pair with E≈45.6 each → m_inv ≈ 91.19."""
    p = 45.5938  # half the Z mass
    im = invariant_mass(0.000511, p, 0, 0, -p, 0, 0)
    assert abs(im - 91.1876) < 0.01


def _fake_hits(particle_ids, rng):
    rows = []
    for pid in particle_ids:
        for _ in range(rng.integers(3, 6)):
            rows.append({
                "particle_id": pid,
                "tx": rng.normal() * 100, "ty": rng.normal() * 100,
                "tz": rng.normal() * 100,
                "tt": rng.normal(), "tpx": rng.normal(),
                "tpy": rng.normal(), "tpz": rng.normal(),
                "te": rng.normal(), "deltapx": rng.normal(),
                "deltapy": rng.normal(), "deltapz": rng.normal(),
                "deltae": rng.normal(),
            })
    return pd.DataFrame(rows)


def _fake_event(rng, signal):
    p = 45.5938
    rows = []
    if signal:
        rows.append(dict(particle_id=1, particle_type=13, q=1, m=0.105,
                         px=p, py=0.0, pz=0.0))
        rows.append(dict(particle_id=2, particle_type=-13, q=-1, m=0.105,
                         px=-p, py=0.0, pz=0.0))
    for pid in range(3, 8):
        rows.append(dict(particle_id=pid, particle_type=211, q=1, m=0.14,
                         px=rng.normal(), py=rng.normal(), pz=rng.normal()))
    initial = pd.DataFrame(rows)
    hits = _fake_hits(initial["particle_id"].tolist(), rng)
    return (initial, None, hits)


def test_actstrack_pipeline(tmp_path):
    rng = np.random.default_rng(0)
    signal = [_fake_event(rng, True) for _ in range(4)]
    bkg = [_fake_event(rng, False) for _ in range(4)]
    raw = tmp_path / "raw"
    raw.mkdir()
    with open(raw / "signal_events_2T.pkl", "wb") as f:
        pickle.dump(signal, f)
    with open(raw / "bkg_events_2T.pkl", "wb") as f:
        pickle.dump(bkg, f)

    ds = build_actstrack(str(tmp_path), {"im_thres": 2, "sample_tracks": 4},
                         tesla="2T", seed=0)
    assert len(ds) == 8
    labels = [g[2] for g in ds.graphs]
    assert sum(labels) == 4  # 4 signal events
    x, ei, y = ds.graphs[0]
    assert x.shape[1] == 12  # 9 other + 3 pos
    assert ei.shape[0] == 2
    assert set(ds.idx_split) == {"train", "valid", "test"}
    # cache roundtrip
    ds2 = build_actstrack(str(tmp_path), {}, tesla="2T")
    assert len(ds2) == 8
    np.testing.assert_array_equal(ds2.graphs[0][0], x)


class _Entry:
    pass


def test_tau3mu_pipeline(tmp_path):
    rng = np.random.default_rng(1)
    rows = []
    for i in range(6):
        n = int(rng.integers(5, 10))
        y = i % 2
        rows.append({
            "n_mu_hit": n,
            "y": y,
            "node_label": (np.arange(n) < 4).astype(np.int64) * y,
            "mu_hit_station": np.ones(n, np.int64),
            "mu_hit_neighbor": np.zeros(n, np.int64),
            "mu_hit_type": np.ones(n, np.int64),
            "mu_hit_sim_eta": rng.normal(size=n),
            "mu_hit_sim_phi": rng.uniform(-180, 180, size=n),
            "mu_hit_bend": rng.normal(size=n),
        })
    df = pd.DataFrame(rows)
    raw = tmp_path / "raw"
    raw.mkdir()
    df.to_pickle(raw / "tau3mu_mixed.pkl")

    ds = build_tau3mu(str(tmp_path), {}, seed=0)
    assert len(ds) == 6
    x, ei, y = ds.graphs[0]
    assert x.shape[1] == 3  # mu_hit_bend + eta + phi
    assert ei.shape[0] == 2


def test_build_synmol_raw_with_positions_file(tmp_path):
    """SynMol raw pipeline without RDKit: one-hot -> categorical features,
    attribution labels, reference split protocol, positions from a
    user-provided npz (synmol.py:72-125 minus the conformer embed)."""
    import pandas as pd

    from difformer_tpu.data.particle import BUILDERS, SYNMOL_ATOM_TYPES

    raw = tmp_path / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n_mol, n_types = 1010, len(SYNMOL_ATOM_TYPES)
    sizes = rng.integers(4, 9, n_mol)
    datadicts, exp, ys, poses = [], [], [], []
    for n in sizes:
        onehot = np.zeros((n, n_types))
        onehot[np.arange(n), rng.integers(0, 4, n)] = 1
        datadicts.append({"nodes": onehot})
        lab = (rng.random(n) < 0.3).astype(np.float64)
        exp.append([{"nodes": lab[:, None]}])
        ys.append(float(rng.integers(0, 2)))
        poses.append(rng.normal(size=(n, 3)))
    np.savez(raw / "y_true.npz", y=np.asarray(ys))
    np.savez(raw / "x_true.npz",
             datadict_list=np.asarray([datadicts], dtype=object))
    np.savez(raw / "true_raw_attribution_datadicts.npz",
             datadict_list=np.asarray(exp, dtype=object))
    pd.DataFrame({"smiles": ["C"] * n_mol}).to_csv(
        raw / "logic8_smiles.csv", index=False)
    idx = rng.permutation(n_mol)
    np.savez(raw / "logic8_traintest_indices.npz",
             train_index=idx[:1005], test_index=idx[1005:])
    np.savez(raw / "positions.npz",
             pos=np.asarray(poses, dtype=object))

    ds = BUILDERS["synmol"](str(tmp_path), {})
    assert len(ds) == n_mol
    x, ei, y = ds[0]
    assert x.shape == (sizes[0], 4)            # atom idx + 3 pos cols
    assert x[:, 0].max() < 4
    np.testing.assert_allclose(ds.extras[0]["pos"], poses[0] * 5.0,
                               rtol=1e-6)      # synmol.py:116 scaling
    split = ds.get_idx_split()
    assert len(split["valid"]) == 1000          # reference protocol
    assert len(split["train"]) == 5
    assert len(split["test"]) == 5
    # cached reload keeps extras
    ds2 = BUILDERS["synmol"](str(tmp_path), {})
    np.testing.assert_allclose(ds2.extras[3]["node_label"],
                               ds.extras[3]["node_label"])
