"""Host-side graph preprocessing (numpy).

Replaces the PyG utils the reference calls in every trainer before the single
host→device transfer: ``to_undirected`` + ``remove_self_loops`` +
``add_self_loops`` (``node classification/main.py:72-76``), row feature
normalization (``data_utils.py:229-236``), induced subgraph extraction for
mini-batching (``main-batch.py:131``), and kNN graph construction from
features (``image and text/main.py:51-54``). All static-shape friendly: edge
lists can be padded to buckets for jit stability.

A C++ fast path for the heavy routines lives in ``difformer_tpu/native`` and
is used automatically when built (see ``difformer_tpu.native``).
"""

from __future__ import annotations

import numpy as np


def to_undirected(edge_index):
    """Symmetrize + dedupe: both directions of every edge, unique pairs."""
    ei = np.asarray(edge_index)
    both = np.concatenate([ei, ei[::-1]], axis=1)
    # unique columns
    flat = both[0].astype(np.int64) * (both.max() + 1) + both[1]
    _, keep = np.unique(flat, return_index=True)
    return both[:, np.sort(keep)]


def remove_self_loops(edge_index, edge_weight=None):
    ei = np.asarray(edge_index)
    mask = ei[0] != ei[1]
    if edge_weight is not None:
        return ei[:, mask], edge_weight[mask]
    return ei[:, mask], None


def add_self_loops(edge_index, num_nodes, edge_weight=None, fill_value=1.0):
    ei = np.asarray(edge_index)
    loops = np.tile(np.arange(num_nodes, dtype=ei.dtype), (2, 1))
    out = np.concatenate([ei, loops], axis=1)
    if edge_weight is not None:
        w = np.concatenate(
            [edge_weight, np.full(num_nodes, fill_value, dtype=edge_weight.dtype)]
        )
        return out, w
    return out, None


def standard_preprocess(edge_index, num_nodes):
    """The reference's canonical prep (``main.py:72-76``): symmetrize,
    drop self loops, add self loops."""
    ei = to_undirected(edge_index)
    ei, _ = remove_self_loops(ei)
    ei, _ = add_self_loops(ei, num_nodes)
    return ei


def sort_edges_by_receiver(edge_index, edge_weight=None):
    """CSR order (sorted by destination) → unlocks XLA's sorted-scatter."""
    ei = np.asarray(edge_index)
    order = np.argsort(ei[1], kind="stable")
    ei = ei[:, order]
    if edge_weight is not None:
        return ei, edge_weight[order]
    return ei, None


def normalize_feat(feat):
    """Row-normalize features (``data_utils.py:229-236``)."""
    feat = np.asarray(feat, dtype=np.float32)
    rowsum = feat.sum(axis=1, keepdims=True)
    rowsum[rowsum == 0] = 1.0
    return feat / rowsum


def subgraph(node_idx, edge_index, num_nodes, relabel_nodes=True):
    """Induced subgraph on ``node_idx`` (PyG ``subgraph`` parity — the
    mini-batch trainer's chunking drops cross-chunk edges by design,
    ``main-batch.py:131``; SURVEY.md §7.3 item 5)."""
    node_idx = np.asarray(node_idx)
    mask = np.zeros(num_nodes, dtype=bool)
    mask[node_idx] = True
    ei = np.asarray(edge_index)
    emask = mask[ei[0]] & mask[ei[1]]
    sub = ei[:, emask]
    if relabel_nodes:
        remap = -np.ones(num_nodes, dtype=np.int64)
        remap[node_idx] = np.arange(node_idx.shape[0])
        sub = remap[sub]
    return sub, emask


def pad_edges(edge_index, edge_weight, target_e, *, pad_index=0):
    """Pad an edge list to a static bucket size; returns (ei, w, mask).

    Padded edges point at ``pad_index`` and carry mask=False; downstream
    ``gcn_conv(..., edge_mask=...)`` excludes them from degrees and messages.
    """
    ei = np.asarray(edge_index)
    e = ei.shape[1]
    if e > target_e:
        raise ValueError(f"edge count {e} exceeds bucket {target_e}")
    mask = np.zeros(target_e, dtype=bool)
    mask[:e] = True
    out = np.full((2, target_e), pad_index, dtype=ei.dtype)
    out[:, :e] = ei
    w = None
    if edge_weight is not None:
        w = np.zeros(target_e, dtype=np.float32)
        w[:e] = edge_weight
    return out, w, mask


def edge_bucket(e, buckets=None, *, growth=1.3, minimum=128):
    """Pick a static padding bucket for ``e`` edges (geometric buckets keep
    the number of distinct compiled shapes logarithmic)."""
    if buckets is not None:
        for b in buckets:
            if e <= b:
                return b
        raise ValueError(f"{e} edges exceed largest bucket {buckets[-1]}")
    b = minimum
    while b < e:
        b = int(np.ceil(b * growth / minimum) * minimum)
    return b


def convert_to_adj(edge_index, n_node):
    """Dense adjacency from edge_index (``data_utils.py:287-292``)."""
    adj = np.zeros((n_node, n_node), np.float32)
    ei = np.asarray(edge_index)
    adj[ei[0], ei[1]] = 1.0
    return adj


def adj_mul(adj_i, adj, n):
    """Sparse boolean product: edge_index of A_i @ A (``data_utils.py:
    294-299``) — used for multi-hop adjacency construction."""
    import scipy.sparse as sp

    ai = sp.coo_matrix(
        (np.ones(adj_i.shape[1]), (adj_i[0], adj_i[1])), shape=(n, n)
    ).tocsr()
    a = sp.coo_matrix(
        (np.ones(adj.shape[1]), (adj[0], adj[1])), shape=(n, n)
    ).tocsr()
    prod = (ai @ a).tocoo()
    return np.stack([prod.row, prod.col]).astype(np.int64)


def knn_graph(features, k, *, include_self=True, loop=False, metric="euclidean"):
    """kNN graph from feature/coordinate rows (numpy, blocked O(N·B) memory).

    Replaces sklearn ``kneighbors_graph(..., include_self=True)`` in the
    image-text track (``image and text/main.py:51-54``) and PyG
    ``knn_graph(pos, k, loop=True)`` in the particle datasets
    (``physical particle/datasets/actstrack.py:178``). Returns edge_index
    [2, N*k] with edges src=neighbor → dst=node (directed, PyG convention).

    include_self: the node itself counts as one of its k neighbors (sklearn
    ``include_self=True`` semantics used by the image-text track).
    loop: alias for include_self (PyG naming).
    """
    x = np.asarray(features, dtype=np.float32)
    n = x.shape[0]
    include_self = include_self or loop
    kk = min(k, n)
    block = max(1, min(n, int(2**22 // max(n, 1)) or 1))
    nbrs = np.empty((n, kk), dtype=np.int64)
    sq = (x * x).sum(axis=1)
    for start in range(0, n, block):
        stop = min(n, start + block)
        if metric == "euclidean":
            d = sq[start:stop, None] - 2.0 * (x[start:stop] @ x.T) + sq[None, :]
        elif metric == "cosine":
            xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            d = 1.0 - xn[start:stop] @ xn.T
        else:
            raise ValueError(metric)
        if not include_self:
            rows = np.arange(start, stop)
            d[np.arange(stop - start), rows] = np.inf
        part = np.argpartition(d, kk - 1, axis=1)[:, :kk]
        # sort the k selected by distance for determinism
        order = np.argsort(np.take_along_axis(d, part, axis=1), axis=1)
        nbrs[start:stop] = np.take_along_axis(part, order, axis=1)
    dst = np.repeat(np.arange(n, dtype=np.int64), kk)
    src = nbrs.reshape(-1)
    return np.stack([src, dst], axis=0)


def radius_graph(pos, r, *, loop=True, max_num_neighbors=None):
    """All pairs within radius ``r`` (PyG ``radius_graph`` parity,
    ``physical particle/datasets/tau3mu.py:95``)."""
    x = np.asarray(pos, dtype=np.float32)
    n = x.shape[0]
    sq = (x * x).sum(axis=1)
    d2 = sq[:, None] - 2.0 * (x @ x.T) + sq[None, :]
    mask = d2 <= r * r
    if not loop:
        np.fill_diagonal(mask, False)
    dst, src = np.where(mask)  # row = center, col = neighbor
    if max_num_neighbors is not None:
        keep = []
        for i in range(n):
            sel = np.where(dst == i)[0]
            if sel.shape[0] > max_num_neighbors:
                order = np.argsort(d2[i, src[sel]])[:max_num_neighbors]
                sel = sel[order]
            keep.append(sel)
        keep = np.concatenate(keep)
        src, dst = src[keep], dst[keep]
    return np.stack([src, dst], axis=0)


def locality_reorder(edge_index, num_nodes, method="rcm"):
    """Node permutation that clusters connected nodes into nearby ids.

    TPU SpMM is HBM-gather-bound (see BENCH_NOTES.md): random 128–256 B row
    gathers achieve a small fraction of streaming bandwidth. Renumbering
    nodes so neighbors sit close in memory turns those gathers into
    near-sequential accesses. The reference has no equivalent — its CUDA
    SpMM tolerates random access better — so this is a TPU-first
    preprocessing stage, applied once on the host.

    method='rcm'    reverse Cuthill–McKee over the symmetrized adjacency
                    (scipy.sparse.csgraph), the classic bandwidth-minimizer.
    method='bfs'    plain BFS order from the max-degree node (no scipy).
    method='degree' sort by degree (groups hubs; helps ELL bucketing).
    method='community'
                    synchronous label propagation (vectorized numpy, a few
                    passes) → nodes grouped by detected community, community
                    blocks chained by inter-community edge weight. Unlike
                    RCM (a bandwidth minimizer that noise edges derail),
                    this recovers SBM-style block structure even at 10-20%%
                    cross-community edges — the right preprocessing for the
                    halo-minimizing shard layout
                    (``parallel.partition.locality_layout``).

    Returns ``perm`` with ``new_id = perm[old_id]``; apply with
    :func:`permute_graph`.
    """
    ei = np.asarray(edge_index)
    if method == "rcm":
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        a = sp.coo_matrix(
            (np.ones(ei.shape[1], np.float32), (ei[0], ei[1])),
            shape=(num_nodes, num_nodes),
        ).tocsr()
        a = a + a.T
        order = np.asarray(reverse_cuthill_mckee(a, symmetric_mode=True))
    elif method == "bfs":
        deg = np.bincount(ei[0], minlength=num_nodes)
        adj_r, adj_c = ei[0], ei[1]
        srt = np.argsort(adj_r, kind="stable")
        adj_r, adj_c = adj_r[srt], adj_c[srt]
        starts = np.searchsorted(adj_r, np.arange(num_nodes + 1))
        seen = np.zeros(num_nodes, bool)
        order = np.empty(num_nodes, np.int64)
        pos = 0
        for root in np.argsort(-deg):
            if seen[root]:
                continue
            seen[root] = True
            order[pos] = root
            pos += 1
            head = pos - 1
            while head < pos:
                u = order[head]
                head += 1
                nbrs = adj_c[starts[u]:starts[u + 1]]
                new = nbrs[~seen[nbrs]]
                if new.size:
                    new = np.unique(new)
                    seen[new] = True
                    order[pos:pos + new.size] = new
                    pos += new.size
        order = order[:pos]
        rest = np.flatnonzero(~seen)
        order = np.concatenate([order, rest])
    elif method == "degree":
        # total (in+out) degree so hubs cluster in BOTH SpMM directions
        # (the BSR hybrid builds fwd and rev operators)
        deg = (np.bincount(ei[0], minlength=num_nodes)
               + np.bincount(ei[1], minlength=num_nodes))
        order = np.argsort(-deg, kind="stable")
    elif method == "community":
        labels = label_propagation(ei, num_nodes)
        order = _community_chain_order(ei, labels, num_nodes)
    else:
        raise ValueError(f"unknown reorder method {method!r}")
    perm = np.empty(num_nodes, np.int64)
    perm[order] = np.arange(num_nodes)
    return perm


def label_propagation(edge_index, num_nodes, iters=10, seed=0,
                      use_native=None):
    """Community detection by synchronous label propagation: each pass
    assigns every node the most frequent label among its (symmetrized)
    neighbors, ties broken by a deterministic per-label priority (plain
    synchronous LP oscillates on symmetric ties). Converges in a handful of
    passes on block-structured graphs. Returns int labels [num_nodes]
    (community ids are arbitrary; relabelled compactly).

    Dispatches to the multithreaded C++ implementation
    (``native.label_propagation``) when available — ~10x the numpy path at
    bench scale (N=131k, E=4.2M) — with this vectorized numpy version
    (O(E log E) lexsort per pass) as the always-available fallback;
    ``use_native=False`` forces the fallback."""
    ei = np.asarray(edge_index)
    if use_native is not False:
        try:
            from difformer_tpu import native

            return native.label_propagation(ei[0], ei[1], num_nodes,
                                            iters=iters)
        except Exception:
            if use_native:
                raise
    # symmetrize so direction doesn't bias propagation
    src = np.concatenate([ei[0], ei[1]])
    dst = np.concatenate([ei[1], ei[0]])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    if src.size == 0:       # empty / self-loop-only graph: every node its
        # own community (native path agrees); int64 like the main path
        return np.arange(num_nodes, dtype=np.int64)
    labels = np.arange(num_nodes, dtype=np.int64)
    rng = np.random.default_rng(seed)
    # tiny random tie-break priority so symmetric ties don't oscillate
    prio = rng.random(num_nodes)
    for _ in range(iters):
        lab_src = labels[src]
        order = np.lexsort((lab_src, dst))
        d, l = dst[order], lab_src[order]
        # run-length encode (dst, label) pairs
        new_run = np.empty(d.shape[0], bool)
        new_run[0] = True
        new_run[1:] = (d[1:] != d[:-1]) | (l[1:] != l[:-1])
        starts = np.flatnonzero(new_run)
        counts = np.diff(np.append(starts, d.shape[0]))
        run_dst, run_lab = d[starts], l[starts]
        # per dst: label with max count (break ties by label priority)
        score = counts.astype(np.float64) + prio[run_lab] * 0.5
        best = np.zeros(num_nodes, np.float64)
        np.maximum.at(best, run_dst, score)
        is_best = score >= best[run_dst]
        new_labels = labels.copy()
        # later writes win; order within dst is label-sorted → deterministic
        new_labels[run_dst[is_best]] = run_lab[is_best]
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels
    _, compact = np.unique(labels, return_inverse=True)
    return compact


def _community_chain_order(edge_index, labels, num_nodes):
    """Order nodes by community blocks, chaining communities greedily by
    inter-community edge weight (each next block is the one most connected
    to the previously placed one) so that related communities sit adjacent
    — shard cuts then fall between weakly-coupled blocks."""
    ei = np.asarray(edge_index)
    c = int(labels.max()) + 1 if num_nodes else 0
    a, b = labels[ei[0]], labels[ei[1]]
    off = a != b
    pair = np.minimum(a[off], b[off]) * c + np.maximum(a[off], b[off])
    uniq, w = np.unique(pair, return_counts=True)
    import collections

    nbrs = collections.defaultdict(list)
    for p, ww in zip(uniq, w):
        i, j = int(p // c), int(p % c)
        nbrs[i].append((j, int(ww)))
        nbrs[j].append((i, int(ww)))
    sizes = np.bincount(labels, minlength=c)
    placed = np.zeros(c, bool)
    chain = []
    cur = int(np.argmax(sizes))
    while True:
        placed[cur] = True
        chain.append(cur)
        cand = [(ww, j) for j, ww in nbrs[cur] if not placed[j]]
        if cand:
            cur = max(cand)[1]
        else:
            rest = np.flatnonzero(~placed)
            if rest.size == 0:
                break
            cur = int(rest[np.argmax(sizes[rest])])
    rank = np.empty(c, np.int64)
    rank[chain] = np.arange(c)
    return np.argsort(rank[labels], kind="stable")


def permute_graph(perm, edge_index, *arrays):
    """Apply a node permutation: relabel edges and reorder node-indexed
    arrays (features, labels, masks). Returns ``(edge_index, *arrays)``."""
    perm = np.asarray(perm)
    ei = perm[np.asarray(edge_index)]
    inv = np.argsort(perm)
    out = tuple(np.asarray(a)[inv] for a in arrays)
    return (ei,) + out
