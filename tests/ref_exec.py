"""Execute the ACTUAL reference PyTorch model code for parity testing.

The reference model files (``node classification/difformer.py``,
``physical particle/difformer-v2.py``) depend on exactly two symbols from
packages not installed here: ``torch_sparse.SparseTensor``/``matmul`` and
``torch_geometric.utils.degree``. Both are trivially expressible with plain
torch (``index_add_`` / ``bincount``), so we stub just those, import the real
reference files with importlib, and run them. This closes the round-1
parity gap: the parity tests compare against *reference-executed* outputs,
not a transcription (VERDICT.md "What's missing" #1; BASELINE.md
"per-layer activations vs PyTorch reference: allclose").

The stubs are installed only for the duration of the import and then removed
from ``sys.modules`` (the loaded module keeps its bound references), so other
tests that inspect ``sys.modules`` are unaffected.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"

_cache = {}


def _make_stub_modules():
    """Minimal torch_sparse / torch_geometric.utils stubs.

    ``SparseTensor(row=, col=, value=, sparse_sizes=)`` + ``matmul(adj, x)``
    reproduce torch_sparse's CSR SpMM semantics with a scatter-add:
    ``out[r] = sum_{e: row[e]==r} value[e] * x[col[e]]`` — exactly what the
    reference's ``gcn_conv`` needs (difformer.py:75-77). ``degree`` is
    PyG's scatter-of-ones (difformer.py:66).
    """
    import torch

    ts = types.ModuleType("torch_sparse")

    class SparseTensor:
        def __init__(self, row=None, col=None, value=None, sparse_sizes=None):
            self.row_idx = row
            self.col_idx = col
            self.value = value
            self.sparse_sizes_ = sparse_sizes

    def matmul(adj: SparseTensor, dense: "torch.Tensor"):
        n = adj.sparse_sizes_[0]
        out = torch.zeros((n,) + tuple(dense.shape[1:]), dtype=dense.dtype)
        val = adj.value.to(dense.dtype)
        src = val.reshape(-1, *([1] * (dense.dim() - 1))) * dense[adj.col_idx]
        out.index_add_(0, adj.row_idx, src)
        return out

    ts.SparseTensor = SparseTensor
    ts.matmul = matmul

    tg = types.ModuleType("torch_geometric")
    tgu = types.ModuleType("torch_geometric.utils")

    def degree(index, num_nodes=None, dtype=None):
        n = int(num_nodes) if num_nodes is not None else int(index.max()) + 1
        out = torch.bincount(index, minlength=n)
        return out.to(dtype) if dtype is not None else out

    tgu.degree = degree
    tg.utils = tgu
    return {"torch_sparse": ts, "torch_geometric": tg,
            "torch_geometric.utils": tgu}


def load_reference_module(relpath: str, modname: str):
    """Import a reference .py file by path with the stubs installed."""
    if modname in _cache:
        return _cache[modname]
    path = os.path.join(REFERENCE_ROOT, relpath)
    stubs = _make_stub_modules()
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(modname, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, old in saved.items():
            if old is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = old
    _cache[modname] = mod
    return mod


def reference_difformer_v1():
    return load_reference_module("node classification/difformer.py",
                                 "_ref_difformer_v1")


def reference_difformer_v2():
    return load_reference_module("physical particle/difformer-v2.py",
                                 "_ref_difformer_v2")
