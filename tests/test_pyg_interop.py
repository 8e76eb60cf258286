"""PyG processed-cache interop: read the reference's collated
``(data, slices, idx_split)`` torch artifacts without torch_geometric.

The test fabricates the artifact exactly as PyG's InMemoryDataset.collate
lays it out (concatenated tensors + slice boundaries, edge_index offset by
cumulative node counts, Data objects pickled under the torch_geometric
module path) using a throwaway module injected into sys.modules, then
verifies our stub-unpickler round-trips it with no PyG installed.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from difformer_tpu.data.particle import BUILDERS, GraphListDataset
from difformer_tpu.data.pyg_interop import (
    decollate,
    graph_list_from_pyg,
    load_pyg_processed,
)

# two tiny "molecules": 3 and 2 nodes, self-loop kNN-style edges
G0 = dict(
    x=np.array([[0, 0.1, 0.2, 0.3], [1, 1.1, 1.2, 1.3], [2, 2.1, 2.2, 2.3]],
               np.float32),
    ei=np.array([[0, 1, 2, 1], [0, 1, 2, 2]], np.int64),
    y=1.0,
    node_label=np.array([1.0, 0.0, 1.0], np.float32),
)
G1 = dict(
    x=np.array([[3, 3.1, 3.2, 3.3], [4, 4.1, 4.2, 4.3]], np.float32),
    ei=np.array([[0, 1], [1, 0]], np.int64),
    y=0.0,
    node_label=np.array([0.0, 0.0], np.float32),
)


def _write_fake_pyg_cache(path):
    """torch.save a collated tuple whose Data class lives under the
    torch_geometric module path (as the reference's artifacts do)."""
    mod = types.ModuleType("torch_geometric")
    data_mod = types.ModuleType("torch_geometric.data")
    data_data_mod = types.ModuleType("torch_geometric.data.data")

    class Data:  # minimal PyG-1.x-shaped Data: tensors in __dict__
        pass

    Data.__module__ = "torch_geometric.data.data"
    Data.__qualname__ = "Data"
    data_data_mod.Data = Data
    data_mod.Data = Data
    mod.data = data_mod
    sys.modules["torch_geometric"] = mod
    sys.modules["torch_geometric.data"] = data_mod
    sys.modules["torch_geometric.data.data"] = data_data_mod
    try:
        big = Data()
        # collate: cat along node/edge dims; edge_index += node offset
        big.x = torch.tensor(np.concatenate([G0["x"], G1["x"]]))
        big.edge_index = torch.tensor(
            np.concatenate([G0["ei"], G1["ei"] + len(G0["x"])], axis=1))
        big.y = torch.tensor([[G0["y"]], [G1["y"]]])
        big.node_label = torch.tensor(
            np.concatenate([G0["node_label"], G1["node_label"]]))
        slices = {
            "x": torch.tensor([0, 3, 5]),
            "edge_index": torch.tensor([0, 4, 6]),
            "y": torch.tensor([0, 1, 2]),
            "node_label": torch.tensor([0, 3, 5]),
        }
        idx_split = {"train": [0], "valid": [1], "test": [1]}
        os.makedirs(os.path.dirname(path), exist_ok=True)
        torch.save((big, slices, idx_split), path)
    finally:
        for k in ("torch_geometric", "torch_geometric.data",
                  "torch_geometric.data.data"):
            sys.modules.pop(k, None)


def test_load_and_decollate(tmp_path):
    path = str(tmp_path / "processed" / "data.pt")
    _write_fake_pyg_cache(path)
    assert "torch_geometric" not in sys.modules

    attrs, slices, idx_split = load_pyg_processed(path)
    assert attrs["x"].shape == (5, 4)
    np.testing.assert_array_equal(idx_split["train"], [0])

    for i, g in enumerate((G0, G1)):
        got = decollate(attrs, slices, i)
        np.testing.assert_allclose(got["x"], g["x"])
        np.testing.assert_array_equal(got["edge_index"], g["ei"])  # de-offset
        np.testing.assert_allclose(got["node_label"], g["node_label"])
        assert float(np.asarray(got["y"]).reshape(-1)[0]) == g["y"]


def test_graph_list_from_pyg_and_builder_gate(tmp_path):
    path = str(tmp_path / "processed" / "data.pt")
    _write_fake_pyg_cache(path)

    ds = graph_list_from_pyg("synmol", path)
    assert len(ds) == 2
    x, ei, y = ds[0]
    np.testing.assert_allclose(x, G0["x"])
    assert y == 1.0
    assert "node_label" in ds.extras[0]
    assert set(ds.get_idx_split()) == {"train", "valid", "test"}

    # the gated builder converts the PyG artifact and re-caches as npz
    ds2 = BUILDERS["synmol"](str(tmp_path), {})
    assert len(ds2) == 2
    npz = tmp_path / "processed" / "synmol_processed.npz"
    assert npz.exists()
    ds3 = GraphListDataset.load_cache("synmol", str(npz))
    np.testing.assert_array_equal(ds3[1][1], G1["ei"])
    # extras survive the npz round-trip: cached loads match the fresh
    # conversion (ADVICE r1: save_cache used to drop them)
    for fresh, cached in zip(ds2.extras, ds3.extras):
        assert set(fresh) == set(cached)
        for k in fresh:
            np.testing.assert_allclose(fresh[k], cached[k])
    np.testing.assert_allclose(ds3.extras[0]["node_label"],
                               G0["node_label"])


def test_builder_raises_without_any_cache(tmp_path):
    with pytest.raises(ImportError, match="RDKit"):
        BUILDERS["synmol"](str(tmp_path), {})


def test_unpickler_refuses_unsafe_globals(tmp_path):
    """A cache file whose pickle stream references a non-allowlisted global
    (e.g. an os.system reducer) must be refused, not executed."""
    import pickle

    from difformer_tpu.data.pyg_interop import _StubUnpickler

    class Evil:
        def __reduce__(self):
            import os

            return (os.system, ("true",))

    payload = pickle.dumps(Evil())
    import io

    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        _StubUnpickler(io.BytesIO(payload)).load()

    # posix.system also blocked (os.system pickles under the posix module)
    safe = pickle.dumps({"a": np.arange(3)})
    out = _StubUnpickler(io.BytesIO(safe)).load()
    np.testing.assert_array_equal(out["a"], np.arange(3))
