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
    num_nodes_global: int = struct.field(pytree_node=False, default=0)
    nodes_per_shard: int = struct.field(pytree_node=False, default=0)

    @property
    def n_shards(self):
        return self.node_feat.shape[0]


def partition_graph(
    node_feat: np.ndarray,
    edge_index: np.ndarray,
    n_shards: int,
    *,
    edge_weight: Optional[np.ndarray] = None,
    labels: Optional[np.ndarray] = None,
    label_mask: Optional[np.ndarray] = None,
    edge_pad_multiple: int = 128,
) -> ShardedGraph:
    """Contiguous node partition + receiver-owned edge partition."""
    n = int(node_feat.shape[0])
    n_loc = -(-n // n_shards)  # ceil
    n_pad = n_loc * n_shards

    x = np.zeros((n_pad,) + node_feat.shape[1:], dtype=np.float32)
    x[:n] = node_feat
    node_mask = np.zeros(n_pad, dtype=bool)
    node_mask[:n] = True

    ei = np.asarray(edge_index)
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
        pad_lab[:n] = labels
        lab = shard_nodes(pad_lab)
        lm = np.zeros(n_pad, dtype=bool)
        lm[:n] = True if label_mask is None else np.asarray(label_mask)
        lmask = shard_nodes(lm)

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
    )
