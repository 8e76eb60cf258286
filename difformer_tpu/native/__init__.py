"""ctypes bindings for the native graphprep library.

Compiled lazily on first use (cached as ``libgraphprep.so`` next to the
source); every entry point has a numpy fallback so the framework works even
without a C++ toolchain. See ``graphprep.cpp`` for the rationale (replaces
the torch_sparse/torch_cluster C++ kernels the reference leans on).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "graphprep.cpp")
_LIB = os.path.join(_HERE, "libgraphprep.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB,
           "-pthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            i64p = ctypes.POINTER(ctypes.c_int64)
            i32p = ctypes.POINTER(ctypes.c_int32)
            f32p = ctypes.POINTER(ctypes.c_float)
            f64p = ctypes.POINTER(ctypes.c_double)
            lib.sort_edges_by_receiver.argtypes = [
                i32p, ctypes.c_int64, ctypes.c_int64, i64p, i64p]
            lib.degree_count.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64,
                                         f64p]
            lib.gcn_norm_values.argtypes = [i32p, i32p, f32p, ctypes.c_int64,
                                            ctypes.c_int64, f32p]
            lib.ell_fill.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64,
                                     i64p, i32p, f32p, i32p, f32p]
            lib.induced_subgraph.argtypes = [i32p, i32p, ctypes.c_int64, i64p,
                                             i32p, i32p]
            lib.induced_subgraph.restype = ctypes.c_int64
            lib.knn_graph.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_int,
                                      i64p]
            lib.label_propagation.argtypes = [
                i32p, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
                i64p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _p(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def available() -> bool:
    return get_lib() is not None


def sort_edges_by_receiver(receivers: np.ndarray, num_nodes: int):
    """Returns (order [E] int64, indptr [N+1] int64); O(E) counting sort."""
    lib = get_lib()
    receivers = np.ascontiguousarray(receivers, np.int32)
    e = receivers.shape[0]
    if lib is None:
        order = np.argsort(receivers, kind="stable").astype(np.int64)
        counts = np.zeros(num_nodes + 1, np.int64)
        np.add.at(counts, receivers + 1, 1)
        return order, np.cumsum(counts)
    order = np.empty(e, np.int64)
    indptr = np.empty(num_nodes + 1, np.int64)
    lib.sort_edges_by_receiver(
        _p(receivers, ctypes.c_int32), e, num_nodes,
        _p(order, ctypes.c_int64), _p(indptr, ctypes.c_int64),
    )
    return order, indptr


def gcn_norm_values(senders, receivers, num_nodes, edge_weight=None):
    lib = get_lib()
    senders = np.ascontiguousarray(senders, np.int32)
    receivers = np.ascontiguousarray(receivers, np.int32)
    e = senders.shape[0]
    if lib is None:
        from difformer_tpu.ops.ell import _gcn_values

        return _gcn_values(senders, receivers, num_nodes, edge_weight)
    out = np.empty(e, np.float32)
    ew = (np.ascontiguousarray(edge_weight, np.float32)
          if edge_weight is not None else None)
    lib.gcn_norm_values(
        _p(senders, ctypes.c_int32), _p(receivers, ctypes.c_int32),
        _p(ew, ctypes.c_float) if ew is not None else None,
        e, num_nodes, _p(out, ctypes.c_float),
    )
    return out


def ell_fill(nodes, k, indptr, point_s, val_s):
    """Fill an ELL bucket natively; returns (idx [nb,k] i32, w [nb,k] f32)."""
    lib = get_lib()
    nodes = np.ascontiguousarray(nodes, np.int64)
    nb = nodes.shape[0]
    idx = np.empty((nb, k), np.int32)
    w = np.empty((nb, k), np.float32)
    if lib is None:
        raise RuntimeError("native lib unavailable")
    lib.ell_fill(
        _p(nodes, ctypes.c_int64), nb, k,
        _p(np.ascontiguousarray(indptr, np.int64), ctypes.c_int64),
        _p(np.ascontiguousarray(point_s, np.int32), ctypes.c_int32),
        _p(np.ascontiguousarray(val_s, np.float32), ctypes.c_float),
        _p(idx, ctypes.c_int32), _p(w, ctypes.c_float),
    )
    return idx, w


def induced_subgraph(senders, receivers, chunk, num_nodes):
    """Native induced-subgraph with relabeling; returns [2, kept] int32."""
    lib = get_lib()
    senders = np.ascontiguousarray(senders, np.int32)
    receivers = np.ascontiguousarray(receivers, np.int32)
    remap = -np.ones(num_nodes, np.int64)
    remap[np.asarray(chunk)] = np.arange(len(chunk))
    if lib is None:
        mask = (remap[senders] >= 0) & (remap[receivers] >= 0)
        return np.stack([remap[senders[mask]], remap[receivers[mask]]]).astype(
            np.int32
        )
    e = senders.shape[0]
    out_s = np.empty(e, np.int32)
    out_r = np.empty(e, np.int32)
    kept = lib.induced_subgraph(
        _p(senders, ctypes.c_int32), _p(receivers, ctypes.c_int32), e,
        _p(remap, ctypes.c_int64), _p(out_s, ctypes.c_int32),
        _p(out_r, ctypes.c_int32),
    )
    return np.stack([out_s[:kept], out_r[:kept]])


def label_propagation(senders, receivers, num_nodes, iters=10):
    """Native multithreaded synchronous label propagation (community
    detection for the locality shard layout). Returns int64 labels [N]
    compacted to [0, n_communities). Raises if the native lib is absent —
    callers fall back to the numpy implementation in data/transforms."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native lib unavailable")
    senders = np.ascontiguousarray(senders, np.int32)
    receivers = np.ascontiguousarray(receivers, np.int32)
    labels = np.empty(num_nodes, np.int64)
    lib.label_propagation(
        _p(senders, ctypes.c_int32), _p(receivers, ctypes.c_int32),
        senders.shape[0], num_nodes, int(iters),
        _p(labels, ctypes.c_int64),
    )
    return labels


def knn_neighbors(x, k, *, include_self=True):
    """Native brute-force kNN; returns [N, k] neighbor indices."""
    lib = get_lib()
    x = np.ascontiguousarray(x, np.float32)
    n, d = x.shape
    kk = min(k, n)
    if lib is None:
        raise RuntimeError("native lib unavailable")
    nbr = np.empty((n, kk), np.int64)
    lib.knn_graph(_p(x, ctypes.c_float), n, d, kk, int(include_self),
                  _p(nbr, ctypes.c_int64))
    return nbr
