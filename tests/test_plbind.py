"""PLBind raw pipeline tests on hand-written fixtures (no BioPython/RDKit/
pint/network). Covers every stage of ``difformer_tpu/data/plbind.py``
against the reference semantics (``physical particle/datasets/plbind.py``).
"""

import os

import numpy as np
import pytest

from difformer_tpu.data.plbind import (
    POSSIBLE_AMINO_ACIDS,
    binary_affinity,
    build_plbind_raw,
    kabsch,
    load_index,
    load_time_splits,
    parse_affinity,
    parse_pdb_residues,
    parse_sdf_coords,
    parse_mol2_coords,
    pocket_node_labels,
    receptor_features,
    select_receptor_residues,
    shrake_rupley_sasa,
)

# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

def _pdb_atom(serial, name, resname, chain, resno, x, y, z, bfac=10.0,
              element=None):
    element = element or name[0]
    return (f"ATOM  {serial:>5} {name:<4}{resname:>4} {chain}{resno:>4}    "
            f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{bfac:6.2f}          "
            f"{element:>2}\n")


def _residue_lines(serial0, resname, chain, resno, origin, bfac=10.0):
    """A minimal complete amino residue: N, CA, C at/near ``origin``."""
    ox, oy, oz = origin
    return [
        _pdb_atom(serial0, "N", resname, chain, resno, ox - 1.0, oy, oz,
                  bfac, "N"),
        _pdb_atom(serial0 + 1, "CA", resname, chain, resno, ox, oy, oz,
                  bfac, "C"),
        _pdb_atom(serial0 + 2, "C", resname, chain, resno, ox + 1.0, oy, oz,
                  bfac, "C"),
    ]


def _write_fixture_complex(root, name, *, far_chain_offset=50.0,
                           kd="Kd=49uM", n_res=4):
    """Complex layout: chain A = n_res residues near the ligand, chain B =
    one residue far away, chain W = a water. Ligand = 2 atoms at origin."""
    d = os.path.join(root, "raw", "pdb", name)
    os.makedirs(d, exist_ok=True)
    lines = ["HEADER    FIXTURE\n"]
    serial = 1
    for i in range(n_res):
        resname = POSSIBLE_AMINO_ACIDS[i % 20]
        lines += _residue_lines(serial, resname, "A", i + 1,
                                (3.0 + 2.5 * i, 0.0, 0.0), bfac=10.0 + i)
        serial += 3
    lines += _residue_lines(serial, "GLY", "B", 1,
                            (far_chain_offset, 0.0, 0.0))
    serial += 3
    lines.append(_pdb_atom(serial, "O", "HOH", "W", 1, 8.0, 0.0, 0.0,
                           element="O"))
    with open(os.path.join(d, f"{name}_protein_processed.pdb"), "w") as f:
        f.writelines(lines)

    sdf = (
        "lig\n  fixture\n\n"
        "  2  1  0  0  0  0  0  0  0  0999 V2000\n"
        "    0.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0\n"
        "    1.0000    0.0000    0.0000 O   0  0  0  0  0  0  0  0  0  0  0  0\n"
        "  1  2  1  0\n"
        "M  END\n$$$$\n"
    )
    with open(os.path.join(d, f"{name}_ligand.sdf"), "w") as f:
        f.write(sdf)
    return kd


def _write_fixture_dataset(root):
    names_kd = {"1abc": "Kd=49uM", "2xyz": "Ki=3nM", "3bad": "IC50=5uM",
                "4gt": "Kd>100uM"}
    os.makedirs(os.path.join(root, "raw", "index"), exist_ok=True)
    os.makedirs(os.path.join(root, "raw", "split"), exist_ok=True)
    with open(os.path.join(root, "raw", "index",
                           "INDEX_general_PL_data.2020"), "w") as f:
        f.write("# comment line\n# another\n")
        for name, kd in names_kd.items():
            f.write(f"{name}  2.00  2020  5.00  {kd}  // {name}.pdf (LIG)\n")
    for name, kd in names_kd.items():
        _write_fixture_complex(root, name, kd=kd)
    splits = {"timesplit_no_lig_overlap_train": ["1abc"],
              "timesplit_no_lig_overlap_val": ["2xyz"],
              "timesplit_test": []}
    for fname, members in splits.items():
        with open(os.path.join(root, "raw", "split", fname), "w") as f:
            f.write("\n".join(members) + "\n")


# ---------------------------------------------------------------------------
# unit stages
# ---------------------------------------------------------------------------

def test_parse_affinity_reference_semantics():
    assert parse_affinity("Kd=49uM") == pytest.approx(49e-6)
    assert parse_affinity("Ki=3nM") == pytest.approx(3e-9)
    assert parse_affinity("Kd~0.5mM") == pytest.approx(0.5e-3)
    assert parse_affinity("Kd=2pM") == pytest.approx(2e-12)
    assert parse_affinity("IC50=5uM") is None           # plbind.py:237
    assert parse_affinity("Kd>100uM") is None           # bounds rejected
    assert parse_affinity("Ki<1nM") is None
    with pytest.raises(ValueError, match="correct format"):
        parse_affinity("Kd 49uM")


def test_binary_affinity_threshold():
    # < 100 nM binds (plbind.py:42-44)
    assert binary_affinity(3e-9, 100) == 1.0
    assert binary_affinity(49e-6, 100) == 0.0
    assert binary_affinity(99e-9, 100) == 1.0
    assert binary_affinity(100e-9, 100) == 0.0


def test_sdf_and_mol2_coords(tmp_path):
    _write_fixture_complex(str(tmp_path), "1abc")
    sdf = tmp_path / "raw" / "pdb" / "1abc" / "1abc_ligand.sdf"
    coords = parse_sdf_coords(str(sdf))
    np.testing.assert_allclose(coords, [[0, 0, 0], [1, 0, 0]])

    mol2 = tmp_path / "lig.mol2"
    mol2.write_text(
        "@<TRIPOS>MOLECULE\nlig\n 2 1\nSMALL\nNO_CHARGES\n"
        "@<TRIPOS>ATOM\n"
        "  1 C1  0.5 1.5 2.5 C.3\n"
        "  2 O1  3.0 4.0 5.0 O.3\n"
        "@<TRIPOS>BOND\n  1 1 2 1\n")
    np.testing.assert_allclose(parse_mol2_coords(str(mol2)),
                               [[0.5, 1.5, 2.5], [3.0, 4.0, 5.0]])


def test_pdb_parse_and_chain_selection(tmp_path):
    _write_fixture_complex(str(tmp_path), "1abc", n_res=4)
    pdb = tmp_path / "raw" / "pdb" / "1abc" / "1abc_protein_processed.pdb"
    residues = parse_pdb_residues(str(pdb))
    # 4 amino in A, 1 in B, water in W
    assert len(residues) == 6
    aminos = [r for r in residues if r.is_amino]
    assert len(aminos) == 5
    water = [r for r in residues if r.resname == "HOH"]
    assert len(water) == 1 and not water[0].is_amino

    lig = parse_sdf_coords(
        str(tmp_path / "raw" / "pdb" / "1abc" / "1abc_ligand.sdf"))
    sel = select_receptor_residues(residues, lig, cutoff=10.0)
    # only chain A within 10A (B is at 50A, W is water)
    assert {r.chain for r in sel} == {"A"}
    assert len(sel) == 4
    assert [r.ca_bfactor for r in sel] == [10.0, 11.0, 12.0, 13.0]


def test_chain_selection_fallback_closest(tmp_path):
    """No chain within cutoff -> closest non-water chain (the reference's
    intent; its own fallback crashes — documented deviation)."""
    _write_fixture_complex(str(tmp_path), "1abc", n_res=2)
    pdb = tmp_path / "raw" / "pdb" / "1abc" / "1abc_protein_processed.pdb"
    residues = parse_pdb_residues(str(pdb))
    lig = np.array([[0.0, 0.0, 0.0]])
    sel = select_receptor_residues(residues, lig, cutoff=0.5)
    assert {r.chain for r in sel} == {"A"}


def test_shrake_rupley_isolated_and_buried():
    # isolated atom: SASA = full probe-expanded sphere area
    r_c = 1.7 + 1.4
    sasa = shrake_rupley_sasa(np.zeros((1, 3)), ["C"])
    np.testing.assert_allclose(sasa[0], 4 * np.pi * r_c ** 2, rtol=1e-6)
    # two touching atoms shadow each other
    two = shrake_rupley_sasa(np.array([[0., 0, 0], [1.5, 0, 0]]), ["C", "C"])
    assert (two < 4 * np.pi * r_c ** 2 - 1e-6).all()
    # an atom fully inside a big cluster is ~buried
    grid = np.stack(np.meshgrid(*[np.arange(-1, 2) * 1.8] * 3),
                    -1).reshape(-1, 3)
    sasa = shrake_rupley_sasa(grid, ["C"] * len(grid))
    center = np.where((grid == 0).all(1))[0][0]
    assert sasa[center] < 0.05 * 4 * np.pi * r_c ** 2


def test_kabsch_recovers_rigid_transform(rng):
    A = rng.normal(size=(3, 30))
    theta = 0.7
    R_true = np.array([[np.cos(theta), -np.sin(theta), 0],
                       [np.sin(theta), np.cos(theta), 0],
                       [0, 0, 1.0]])
    t_true = np.array([[1.0], [-2.0], [0.5]])
    B = R_true @ A + t_true
    R, t = kabsch(A, B)
    np.testing.assert_allclose(R, R_true, atol=1e-8)
    np.testing.assert_allclose(t, t_true, atol=1e-8)
    np.testing.assert_allclose(R @ A + t, B, atol=1e-8)


def test_kabsch_reflection_correction(rng):
    """Planar points (rank-2 H) can produce det=-1 — must be corrected."""
    A = rng.normal(size=(3, 20))
    A[2] = 0.0
    B = A[:, ::-1].copy() * 0 + A  # identity mapping, degenerate z
    R, t = kabsch(A, B)
    assert abs(np.linalg.det(R) - 1.0) < 1e-5


def test_pocket_node_labels():
    lig = np.array([[0.0, 0, 0]])
    rec = np.array([[1.0, 0, 0], [5.0, 0, 0], [20.0, 0, 0]])
    np.testing.assert_array_equal(
        pocket_node_labels(lig, rec, cutoff=8.0), [1, 1, 0])


def test_receptor_features_layout(tmp_path):
    _write_fixture_complex(str(tmp_path), "1abc", n_res=3)
    pdb = tmp_path / "raw" / "pdb" / "1abc" / "1abc_protein_processed.pdb"
    lig = np.array([[0.0, 0, 0]])
    sel = select_receptor_residues(parse_pdb_residues(str(pdb)), lig,
                                   cutoff=10.0)
    feats = receptor_features(sel)
    assert feats.shape == (3, 3)
    # aa indices of ALA, ARG, ASN
    np.testing.assert_array_equal(feats[:, 0], [0, 1, 2])
    assert (feats[:, 1] > 0).all()          # SASA positive
    np.testing.assert_allclose(feats[:, 2], [10.0, 11.0, 12.0])  # bfactors


# ---------------------------------------------------------------------------
# end-to-end
# ---------------------------------------------------------------------------

def test_build_plbind_raw_end_to_end(tmp_path):
    _write_fixture_dataset(str(tmp_path))
    ds = build_plbind_raw(str(tmp_path), {"pocket_cutoff": 8,
                                          "bin_thres": 100})
    # 3bad (IC50) and 4gt (bound) rejected by unit_check
    assert len(ds) == 2
    names = ["1abc", "2xyz"]                  # sorted listing order
    ys = {n: ds.graphs[i][2] for i, n in enumerate(names)}
    assert ys["1abc"] == 0.0                  # 49 uM not < 100 nM
    assert ys["2xyz"] == 1.0                  # 3 nM binds
    x, ei, _ = ds.graphs[0]
    assert x.shape == (4, 3)
    assert ei.shape[0] == 2 and ei.shape[1] == 4 * 4   # k=min(5,4) w/ loops
    # pos centered, true_pos raw (plbind.py:216 rebinding quirk)
    ex = ds.extras[0]
    np.testing.assert_allclose(ex["pos"].mean(axis=0), 0.0, atol=1e-5)
    assert np.abs(ex["true_pos"].mean(axis=0)).max() > 1.0
    assert ex["node_label"].shape == (4,)
    assert ex["node_label"][0] == 1.0         # residue 3A from ligand
    # time splits by membership, others unused
    np.testing.assert_array_equal(ds.idx_split["train"], [0])
    np.testing.assert_array_equal(ds.idx_split["valid"], [1])
    assert ds.idx_split["test"].size == 0


def test_build_plbind_via_builder_gate_and_cache(tmp_path):
    from difformer_tpu.data.particle import BUILDERS, GraphListDataset

    _write_fixture_dataset(str(tmp_path))
    ds = BUILDERS["plbind"](str(tmp_path), {"pocket_cutoff": 8,
                                            "bin_thres": 100})
    assert len(ds) == 2
    npz = tmp_path / "processed" / "plbind_processed.npz"
    assert npz.exists()
    ds2 = GraphListDataset.load_cache("plbind", str(npz))
    np.testing.assert_allclose(ds2.extras[0]["node_label"],
                               ds.extras[0]["node_label"])


def test_build_plbind_raises_without_any_source(tmp_path):
    from difformer_tpu.data.particle import BUILDERS

    with pytest.raises(FileNotFoundError, match="PLBind"):
        BUILDERS["plbind"](str(tmp_path), {})
