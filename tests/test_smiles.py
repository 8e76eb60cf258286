"""SMILES parser + numpy conformer fallback (data/smiles.py, round 5).

Replaces the RDKit gate in the SynMol pipeline (reference
``physical particle/datasets/synmol.py:96-107``) when neither RDKit nor a
positions.npz is available.
"""

import numpy as np
import pytest

from difformer_tpu.data.smiles import (
    SmilesError,
    _bond_length,
    embed_conformer,
    parse_smiles,
    smiles_conformer,
)


def test_parse_basics():
    sym, arom, bonds = parse_smiles("CCO")
    assert sym == ["C", "C", "O"]
    assert bonds == [(0, 1, 1.0), (1, 2, 1.0)]

    sym, arom, bonds = parse_smiles("C#N")
    assert bonds == [(0, 1, 3.0)]

    # branch + double bond (acetic acid)
    sym, _, bonds = parse_smiles("CC(=O)O")
    assert sym == ["C", "C", "O", "O"]
    assert (1, 2, 2.0) in bonds and (1, 3, 1.0) in bonds


def test_parse_aromatic_ring():
    sym, arom, bonds = parse_smiles("c1ccccc1")
    assert sym == ["C"] * 6 and all(arom)
    assert len(bonds) == 6                      # ring closure adds the 6th
    assert all(o == 1.5 for _, _, o in bonds)   # aromatic order

    # fused rings (naphthalene): 10 atoms, 11 bonds
    sym, _, bonds = parse_smiles("c1ccc2ccccc2c1")
    assert len(sym) == 10 and len(bonds) == 11


def test_parse_brackets_and_fragments():
    # charges parsed, explicit-H bracket atoms dropped (RemoveHs parity)
    sym, _, bonds = parse_smiles("[NH4+].[Cl-]")
    assert sym == ["N", "Cl"] and bonds == []

    sym, _, bonds = parse_smiles("N[C@@H](C)C(=O)O")   # alanine w/ stereo
    assert sym == ["N", "C", "C", "C", "O", "O"]
    assert len(bonds) == 5

    # two-letter organic-subset atoms
    sym, _, _ = parse_smiles("ClCCl")
    assert sym == ["Cl", "C", "Cl"]


def test_parse_errors():
    with pytest.raises(SmilesError):
        parse_smiles("C(C")          # unbalanced branch
    with pytest.raises(SmilesError):
        parse_smiles("C1CC")         # unclosed ring
    with pytest.raises(SmilesError):
        parse_smiles("CXC")          # unknown token


@pytest.mark.parametrize("smi", [
    "CCO", "c1ccccc1", "CC(=O)O", "O=C(O)c1ccccc1OC(C)=O",
    "CC(C)(C)c1ccc(O)cc1",
])
def test_conformer_geometry(smi):
    sym, _, bonds = parse_smiles(smi)
    pos = smiles_conformer(smi, seed=3)
    assert pos.shape == (len(sym), 3) and pos.dtype == np.float32
    # bond lengths within 10% of the covalent-radius targets
    for a, b, o in bonds:
        L = np.linalg.norm(pos[a] - pos[b])
        L0 = _bond_length(sym[a], sym[b], o)
        assert abs(L - L0) / L0 < 0.10, (smi, a, b, L, L0)
    # no overlapping atoms
    if len(sym) > 1:
        D = np.linalg.norm(pos[:, None] - pos[None, :], axis=2)
        np.fill_diagonal(D, np.inf)
        assert D.min() > 1.0


def test_conformer_deterministic_per_seed():
    p1 = smiles_conformer("CC(=O)O", seed=5)
    p2 = smiles_conformer("CC(=O)O", seed=5)
    np.testing.assert_allclose(p1, p2)


def test_single_atom_and_disconnected():
    assert embed_conformer(["C"], []).shape == (1, 3)
    pos = smiles_conformer("[Na+].[Cl-]", seed=0)
    assert np.linalg.norm(pos[0] - pos[1]) > 2.0   # fragments kept apart


def test_synmol_fallback_without_positions_file(tmp_path):
    """build_synmol_raw runs with NO RDKit and NO positions.npz — the
    numpy conformer fallback supplies coordinates (the last SURVEY §2
    partial closed)."""
    import pandas as pd

    from difformer_tpu.data.particle import BUILDERS, SYNMOL_ATOM_TYPES

    raw = tmp_path / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(1)
    smiles = ["CCO", "c1ccccc1", "CC(=O)O", "CC(C)O", "C1CCCCC1",
              "OCC(O)CO", "CC(=O)N", "c1ccncc1", "CCS", "ClCCCl"] * 4
    n_mol, n_types = len(smiles), len(SYNMOL_ATOM_TYPES)
    datadicts, exp, ys = [], [], []
    from difformer_tpu.data.smiles import parse_smiles as ps

    for smi in smiles:
        n = len(ps(smi)[0])
        onehot = np.zeros((n, n_types))
        onehot[np.arange(n), rng.integers(0, 4, n)] = 1
        datadicts.append({"nodes": onehot})
        exp.append([{"nodes": (rng.random(n) < 0.3)[:, None].astype(
            np.float64)}])
        ys.append(float(rng.integers(0, 2)))
    np.savez(raw / "y_true.npz", y=np.asarray(ys))
    np.savez(raw / "x_true.npz",
             datadict_list=np.asarray([datadicts], dtype=object))
    np.savez(raw / "true_raw_attribution_datadicts.npz",
             datadict_list=np.asarray(exp, dtype=object))
    pd.DataFrame({"smiles": smiles}).to_csv(
        raw / "logic8_smiles.csv", index=False)
    idx = rng.permutation(n_mol)
    # tiny valid split (the reference's fixed 1000 only applies at scale;
    # build_synmol_raw's protocol shuffles then takes the last 1000 —
    # with 40 molecules valid swallows the whole train pool minus none,
    # so just assert the pipeline runs and produces geometry)
    np.savez(raw / "logic8_traintest_indices.npz",
             train_index=idx[:30], test_index=idx[30:])

    ds = BUILDERS["synmol"](str(tmp_path), {})
    assert len(ds) == n_mol
    for i in (0, 1, 4):
        x, ei, y = ds[i]
        pos = ds.extras[i]["pos"]
        n = len(ps(smiles[i])[0])
        assert pos.shape == (n, 3)
        # scaled ×5 (synmol.py:116): typical C-C bond ~1.5 Å → ~7.5
        if n > 1:
            D = np.linalg.norm(pos[:, None] - pos[None, :], axis=2)
            np.fill_diagonal(D, np.inf)
            assert 4.0 < D.min() < 12.0
        assert ei.shape[0] == 2 and ei.shape[1] > 0   # kNN graph built
