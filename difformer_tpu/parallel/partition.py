"""Host-side graph partitioning for node/edge-sharded execution.

Nodes are split into ``n_shards`` contiguous equal blocks (node count padded
up); each shard owns every edge whose **receiver** is local (so the scatter
in the conv is purely local), with sender indices kept **global** — remote
sender features arrive via the collective inside
``difformer_tpu.parallel.sharded_ops.gcn_conv_sharded``. Per-shard edge
lists are padded to a common bucket so the shard_map body is static-shaped.

This is the distributed design the reference lacks entirely (SURVEY.md §2.6):
the edge partition + boundary feature exchange plan from BASELINE.json's
north star.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from flax import struct


@struct.dataclass
class ShardedGraph:
    """Stacked per-shard arrays; leading dim = n_shards (maps onto the mesh
    axis via shard_map)."""

    node_feat: Any          # [S, N_loc, F]
    node_mask: Any          # bool [S, N_loc]
    senders: Any            # int32 [S, E_loc]  — GLOBAL padded-node indices
    receivers: Any          # int32 [S, E_loc]  — LOCAL indices
    edge_mask: Any          # bool [S, E_loc]
    edge_weight: Optional[Any] = None   # [S, E_loc]
    labels: Optional[Any] = None        # [S, N_loc, ...]
    label_mask: Optional[Any] = None    # bool [S, N_loc] — valid-label mask
    # --- boundary-exchange (halo) extension: set by build_halo=True ---
    # senders_table: [S, E_loc] indices into [own (N_loc) || halo (S·B)]
    # send_idx:      [S, S, B] local rows shard s sends to each dest shard
    # send_mask:     [S, S, B] False on padding slots
    # edge_value:    [S, E_loc] host-precomputed normalized conv weights
    senders_table: Optional[Any] = None
    send_idx: Optional[Any] = None
    send_mask: Optional[Any] = None
    edge_value: Optional[Any] = None
    # overlap split: internal edges (sender local) vs boundary edges (sender
    # in the halo buffer) — lets XLA hide the all_to_all behind the
    # internal-edge aggregation (no data dependency between them)
    int_senders: Optional[Any] = None    # [S, E_int] local sender idx
    int_receivers: Optional[Any] = None  # [S, E_int] local receiver idx
    int_value: Optional[Any] = None      # [S, E_int]
    bnd_senders: Optional[Any] = None    # [S, E_bnd] idx into halo buffer
    bnd_receivers: Optional[Any] = None  # [S, E_bnd]
    bnd_value: Optional[Any] = None      # [S, E_bnd]
    num_nodes_global: int = struct.field(pytree_node=False, default=0)
    nodes_per_shard: int = struct.field(pytree_node=False, default=0)
    halo_width: int = struct.field(pytree_node=False, default=0)

    @property
    def n_shards(self):
        return self.node_feat.shape[0]


def edge_balanced_layout(edge_index, num_nodes: int, n_shards: int,
                         node_align: int = 1):
    """Contiguous shard boundaries placed at equal *cumulative receiver
    degree* instead of equal node count (SURVEY.md §7.3 risk 4:
    degree-balanced shards). On skewed graphs the slowest shard gates every
    collective, so balancing edges (the SpMM work) beats balancing nodes.

    Returns ``(node_perm, nodes_per_shard)``: ``node_perm[g]`` is node g's
    position in the padded ``[n_shards * nodes_per_shard]`` layout (each
    shard's nodes packed at its block start; per-block tail padding). Node
    order inside a shard is preserved, so locality reorders compose."""
    ei = np.asarray(edge_index)
    deg = np.bincount(ei[1], minlength=num_nodes).astype(np.int64)
    c = np.cumsum(deg)
    total = max(int(c[-1]), 1)
    targets = (np.arange(1, n_shards) * total) / n_shards
    cuts = np.searchsorted(c, targets, side="left") + 1
    bounds = np.concatenate([[0], np.clip(cuts, 0, num_nodes), [num_nodes]])
    bounds = np.maximum.accumulate(bounds)
    counts = np.diff(bounds)
    n_loc = max(int(counts.max()), 1)
    n_loc = -(-n_loc // node_align) * node_align
    node_perm = np.empty(num_nodes, np.int64)
    for s in range(n_shards):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        node_perm[lo:hi] = s * n_loc + np.arange(hi - lo)
    return node_perm, n_loc


def crossing_counts(edge_index, num_nodes: int):
    """``cross[b]`` = number of edges crossing a cut between node ``b-1``
    and node ``b`` of the current order (an edge with endpoint positions
    lo < hi crosses every boundary b in (lo, hi]). O(E + N) via a diff
    array; used to snap shard cuts to low-connectivity boundaries."""
    ei = np.asarray(edge_index)
    lo = np.minimum(ei[0], ei[1]).astype(np.int64)
    hi = np.maximum(ei[0], ei[1]).astype(np.int64)
    d = np.zeros(num_nodes + 1, np.int64)
    np.add.at(d, lo + 1, 1)
    np.add.at(d, hi + 1, -1)
    return np.cumsum(d)[: num_nodes + 1]


def locality_layout(edge_index, num_nodes: int, n_shards: int, *,
                    method: str = "community", node_align: int = 1,
                    balance_tol: float = 0.05):
    """Locality-aware partition layout (VERDICT round-2 item 4).

    Three host-side stages, composing with :func:`partition_graph` via its
    ``node_perm`` argument:

    1. **community reorder** — :func:`data.transforms.locality_reorder`
       (label-propagation communities by default; 'rcm'/'bfs' also
       accepted) renumbers nodes so communities become contiguous id
       ranges regardless of the input labelling.
    2. **degree-balanced cut targets** — same cumulative-receiver-degree
       targets as :func:`edge_balanced_layout`, so per-shard SpMM work
       stays balanced.
    3. **min-cut snap** — each cut slides within the window where the
       per-shard edge count stays within ``balance_tol`` of its target, to
       the position with the fewest crossing edges (:func:`crossing_counts`)
       — cuts land between communities instead of through them.

    On community-structured graphs this cuts halo (boundary-row) traffic by
    multiples vs the contiguous layout; the contiguous cut only matches it
    when node ids already happen to be community-sorted. Returns
    ``(node_perm, nodes_per_shard)``.

    ``balance_tol`` trades padding inflation (under shard_map every shard
    runs the max shard's padded shapes — see :func:`shard_balance_stats`)
    against halo bytes. Measured on the shuffled-SBM scaling graph at 8
    shards (round 4): tol 0.05 → edge_pad 1.012 / halo 11.4 MB; tol 0.15
    → edge_pad 1.250 / halo 13.6 MB — the looser window is strictly worse
    (wide cut windows start slicing through neighboring communities), so
    0.05 is the default.
    """
    from difformer_tpu.data.transforms import locality_reorder

    ei = np.asarray(edge_index)
    perm0 = locality_reorder(ei, num_nodes, method=method)  # new = perm0[old]
    ei_r = perm0[ei]

    deg = np.bincount(ei_r[1], minlength=num_nodes).astype(np.int64)
    c = np.cumsum(deg)
    total = max(int(c[-1]), 1)
    cross = crossing_counts(ei_r, num_nodes)

    tol = balance_tol * total / n_shards
    cuts = []
    prev = 0
    for k in range(1, n_shards):
        target = k * total / n_shards
        lo = int(np.searchsorted(c, target - tol, side="left")) + 1
        hi = int(np.searchsorted(c, target + tol, side="right")) + 1
        # hub-dominated graphs can push the whole degree mass past the
        # target (lo lands at/after num_nodes) — clamp so the window is
        # never empty (a star graph previously crashed argmin here)
        lo = min(max(lo, prev + 1), num_nodes - 1)
        hi = min(max(hi, lo + 1), num_nodes)
        b = lo + int(np.argmin(cross[lo:hi]))
        cuts.append(b)
        prev = b
    bounds = np.concatenate([[0], cuts, [num_nodes]])
    bounds = np.maximum.accumulate(bounds)

    counts = np.diff(bounds)
    n_loc = max(int(counts.max()), 1)
    if n_loc * n_shards > 2 * num_nodes:
        # degenerate degree distribution (e.g. a few hubs carry most of the
        # receiver mass): the degree-balanced cut would give one shard
        # nearly all nodes, and padding every shard to that size blows
        # memory n_shards-fold. Fall back to the contiguous equal-node cut
        # of the (still locality-reordered) graph — balanced memory, and
        # community locality is preserved.
        import warnings

        warnings.warn(
            f"locality_layout: degree-balanced cuts degenerate "
            f"(max shard {n_loc} of {num_nodes} nodes); falling back to "
            f"equal-node cuts on the reordered graph", stacklevel=2)
        base = -(-num_nodes // n_shards)
        n_loc = -(-base // node_align) * node_align
        shard = perm0 // base
        return shard * n_loc + (perm0 - shard * base), n_loc
    n_loc = -(-n_loc // node_align) * node_align
    pos_of_new = np.empty(num_nodes, np.int64)
    for s in range(n_shards):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        pos_of_new[lo:hi] = s * n_loc + np.arange(hi - lo)
    return pos_of_new[perm0], n_loc


def boundary_rows(edge_index, node_perm, nodes_per_shard: int) -> int:
    """Number of (owner, destination)-distinct boundary rows a layout ships
    per conv layer — the halo payload in feature rows (= ``send_mask.sum()``
    of the built plan, but computable without building it). Regression
    metric for layout quality."""
    ei = np.asarray(node_perm)[np.asarray(edge_index)]
    src_shard = ei[0] // nodes_per_shard
    dst_shard = ei[1] // nodes_per_shard
    remote = src_shard != dst_shard
    pairs = np.stack([ei[0][remote], dst_shard[remote]])
    return int(np.unique(pairs, axis=1).shape[1])


def partition_graph(
    node_feat: np.ndarray,
    edge_index: np.ndarray,
    n_shards: int,
    *,
    edge_weight: Optional[np.ndarray] = None,
    labels: Optional[np.ndarray] = None,
    label_mask: Optional[np.ndarray] = None,
    edge_pad_multiple: int = 128,
    build_halo: bool = False,
    node_align: int = 1,
    node_perm: Optional[np.ndarray] = None,
    nodes_per_shard: Optional[int] = None,
) -> ShardedGraph:
    """Contiguous node partition + receiver-owned edge partition.

    ``build_halo=True`` additionally precomputes the boundary-exchange plan:
    per-pair send lists (who ships which owned rows to whom), a remapped
    sender table into the ``[own || halo]`` feature table, and host-side
    normalized conv weights — so the distributed conv's communication is
    exactly the boundary features over an ``all_to_all`` instead of a full
    ``all_gather`` (BASELINE.json north star: edge-partitioned training with
    boundary exchange over ICI)."""
    n = int(node_feat.shape[0])
    if node_perm is not None:
        # caller-provided layout (e.g. edge_balanced_layout): node g lives at
        # padded position node_perm[g]; per-block tail padding
        pos = np.asarray(node_perm, np.int64)
        n_loc = int(nodes_per_shard)
    else:
        n_loc = -(-n // n_shards)  # ceil
        n_loc = -(-n_loc // node_align) * node_align  # BSR tile alignment
        pos = np.arange(n, dtype=np.int64)  # identity: padding at the tail
    n_pad = n_loc * n_shards

    x = np.zeros((n_pad,) + node_feat.shape[1:], dtype=np.float32)
    x[pos] = node_feat
    node_mask = np.zeros(n_pad, dtype=bool)
    node_mask[pos] = True

    ei = pos[np.asarray(edge_index)]
    shard_of_edge = ei[1] // n_loc

    per_shard = []
    max_e = 1
    for s in range(n_shards):
        sel = np.where(shard_of_edge == s)[0]
        # sort by local receiver for the sorted-scatter fast path
        order = np.argsort(ei[1, sel], kind="stable")
        sel = sel[order]
        per_shard.append(sel)
        max_e = max(max_e, sel.shape[0])
    e_loc = -(-max_e // edge_pad_multiple) * edge_pad_multiple

    senders = np.zeros((n_shards, e_loc), dtype=np.int32)
    receivers = np.zeros((n_shards, e_loc), dtype=np.int32)
    edge_mask = np.zeros((n_shards, e_loc), dtype=bool)
    ew = None if edge_weight is None else np.zeros((n_shards, e_loc), np.float32)
    for s, sel in enumerate(per_shard):
        e = sel.shape[0]
        senders[s, :e] = ei[0, sel]
        receivers[s, :e] = ei[1, sel] - s * n_loc
        edge_mask[s, :e] = True
        if ew is not None:
            ew[s, :e] = edge_weight[sel]

    def shard_nodes(arr):
        return arr.reshape((n_shards, n_loc) + arr.shape[1:])

    lab = None
    lmask = None
    if labels is not None:
        labels = np.asarray(labels)
        pad_lab = np.zeros((n_pad,) + labels.shape[1:], dtype=labels.dtype)
        pad_lab[pos] = labels
        lab = shard_nodes(pad_lab)
        lm = np.zeros(n_pad, dtype=bool)
        lm[pos] = True if label_mask is None else np.asarray(label_mask)
        lmask = shard_nodes(lm)

    halo = {}
    if build_halo:
        halo = _build_halo_plan(
            ei, per_shard, senders, receivers, edge_mask, edge_weight,
            n_shards, n_loc, n_pad,
        )

    return ShardedGraph(
        node_feat=shard_nodes(x),
        node_mask=shard_nodes(node_mask),
        senders=senders,
        receivers=receivers,
        edge_mask=edge_mask,
        edge_weight=ew,
        labels=lab,
        label_mask=lmask,
        num_nodes_global=n,
        nodes_per_shard=n_loc,
        **halo,
    )


def _build_halo_plan(ei, per_shard, senders, receivers, edge_mask,
                     edge_weight, n_shards, n_loc, n_pad):
    """Host-side boundary-exchange plan (see partition_graph docstring)."""
    # global receiver-degree (reference normalization, difformer.py:66-74)
    deg = np.zeros(n_pad, np.float64)
    np.add.at(deg, ei[1], 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.sqrt(1.0 / deg)

    e_loc = senders.shape[1]
    # per ordered pair (src j -> dst s): owned rows of j needed by s
    need = [[None] * n_shards for _ in range(n_shards)]
    B = 1
    for s in range(n_shards):
        em = edge_mask[s]
        glob = senders[s][em].astype(np.int64)
        owners = glob // n_loc
        for j in range(n_shards):
            if j == s:
                continue
            ids = np.unique(glob[owners == j])
            need[j][s] = ids
            B = max(B, ids.shape[0])
    B = -(-B // 8) * 8

    send_idx = np.zeros((n_shards, n_shards, B), np.int32)
    send_mask = np.zeros((n_shards, n_shards, B), bool)
    # position map: for dst shard s, global id -> halo slot
    slot_of = [dict() for _ in range(n_shards)]
    for j in range(n_shards):
        for s in range(n_shards):
            ids = need[j][s]
            if ids is None or ids.shape[0] == 0:
                continue
            send_idx[j, s, : ids.shape[0]] = ids - j * n_loc
            send_mask[j, s, : ids.shape[0]] = True
            for b, g in enumerate(ids):
                slot_of[s][int(g)] = n_loc + j * B + b

    senders_table = np.zeros((n_shards, e_loc), np.int32)
    edge_value = np.zeros((n_shards, e_loc), np.float32)
    for s in range(n_shards):
        em = edge_mask[s]
        glob = senders[s].astype(np.int64)
        recv_glob = receivers[s].astype(np.int64) + s * n_loc
        own = (glob // n_loc) == s
        tab = np.zeros(e_loc, np.int64)
        tab[own] = glob[own] - s * n_loc
        for e in np.where(em & ~own)[0]:
            tab[e] = slot_of[s][int(glob[e])]
        senders_table[s] = tab
        w = np.ones(e_loc) if edge_weight is None else edge_weight[s]
        val = w * inv[recv_glob] * inv[glob]
        edge_value[s] = np.where(
            em, np.nan_to_num(val, nan=0.0, posinf=0.0, neginf=0.0), 0.0
        ).astype(np.float32)

    # --- overlap split: internal (sender local) vs boundary edges ---------
    int_lists, bnd_lists = [], []
    for s in range(n_shards):
        em = edge_mask[s]
        glob = senders[s].astype(np.int64)
        own = (glob // n_loc) == s
        sel_int = np.where(em & own)[0]
        sel_bnd = np.where(em & ~own)[0]
        int_lists.append((
            senders_table[s][sel_int], receivers[s][sel_int],
            edge_value[s][sel_int],
        ))
        bnd_lists.append((
            senders_table[s][sel_bnd] - n_loc, receivers[s][sel_bnd],
            edge_value[s][sel_bnd],
        ))

    def pad_split(lists):
        e_max = max(max(l[0].shape[0] for l in lists), 1)
        e_pad = -(-e_max // 128) * 128
        S = len(lists)
        si = np.zeros((S, e_pad), np.int32)
        # pad receivers with the LAST local node id so receiver-sorted order
        # survives padding (padding values are 0, so they contribute nothing)
        ri = np.full((S, e_pad), n_loc - 1, np.int32)
        vv = np.zeros((S, e_pad), np.float32)
        for s, (a, b, v) in enumerate(lists):
            e = a.shape[0]
            si[s, :e] = a
            ri[s, :e] = b
            vv[s, :e] = v  # padding keeps value 0 → contributes nothing
        return si, ri, vv

    int_s, int_r, int_v = pad_split(int_lists)
    bnd_s, bnd_r, bnd_v = pad_split(bnd_lists)

    return dict(
        senders_table=senders_table,
        send_idx=send_idx,
        send_mask=send_mask,
        edge_value=edge_value,
        int_senders=int_s, int_receivers=int_r, int_value=int_v,
        bnd_senders=bnd_s, bnd_receivers=bnd_r, bnd_value=bnd_v,
        halo_width=B,
    )


def shard_balance_stats(sg: ShardedGraph):
    """Per-shard load/padding skew of a partition (VERDICT r3 item 7).

    Under shard_map every shard executes the SAME padded shapes, so
    imbalance does not show up as shard-vs-shard time skew — it shows up as
    **padding overhead vs the single-chip run**: the common edge bucket
    E_loc is the max over shards, and node blocks are padded to N_loc.

    Returns a dict:
      * ``edges_per_shard`` — real (non-padding) edges per shard
      * ``edge_skew``       — max/mean of real edges (load imbalance)
      * ``edge_pad_factor`` — S*E_loc / total real edges (compute inflation
        the padded layout pays vs a perfectly balanced, unpadded split)
      * ``nodes_per_shard`` / ``node_skew`` / ``node_pad_factor`` — same
        for node blocks
      * ``halo_rows_per_shard`` / ``halo_pad_factor`` — real boundary rows
        each shard ships vs its padded send buffer (when a halo plan
        exists)
    """
    em = np.asarray(sg.edge_mask)
    nm = np.asarray(sg.node_mask)
    S = em.shape[0]
    e_real = em.sum(axis=1).astype(np.int64)
    n_real = nm.sum(axis=1).astype(np.int64)
    out = {
        "edges_per_shard": e_real.tolist(),
        "edge_skew": float(e_real.max() / max(e_real.mean(), 1.0)),
        "edge_pad_factor": float(S * em.shape[1] / max(e_real.sum(), 1)),
        "nodes_per_shard": n_real.tolist(),
        "node_skew": float(n_real.max() / max(n_real.mean(), 1.0)),
        "node_pad_factor": float(S * nm.shape[1] / max(n_real.sum(), 1)),
    }
    if sg.send_mask is not None:
        sm = np.asarray(sg.send_mask)
        rows = sm.reshape(S, -1).sum(axis=1).astype(np.int64)
        slots = int(np.prod(sm.shape[1:]))
        out["halo_rows_per_shard"] = rows.tolist()
        out["halo_pad_factor"] = float(
            S * slots / max(rows.sum(), 1)) if rows.sum() else None
    return out
