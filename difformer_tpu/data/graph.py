"""Graph containers.

``GraphData`` is the framework's single-graph pytree (senders/receivers COO,
CSR-sorted by receiver for the fast scatter path). ``NodeDataset`` mirrors
the reference's ``NCDataset`` surface (``node classification/dataset.py:25-83``:
``.graph = {edge_index, node_feat, edge_feat, num_nodes}``, ``.label``,
``get_idx_split``) so reference users find the same API, but holds numpy on
host — device placement happens once at train-engine boundary (the reference
likewise has a single host→device transfer, ``main.py:78-79``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from flax import struct


@struct.dataclass
class GraphData:
    """Device-side graph pytree with static node/edge counts."""

    node_feat: Any                       # [N, F]
    senders: Any                         # int32 [E]  (reference 'row')
    receivers: Any                       # int32 [E]  (reference 'col')
    edge_weight: Optional[Any] = None    # [E]
    edge_mask: Optional[Any] = None      # bool [E], False on padding
    node_mask: Optional[Any] = None      # bool [N], False on padding
    num_nodes: int = struct.field(pytree_node=False, default=0)
    edges_sorted: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_edges(self):
        return self.senders.shape[0]

    @classmethod
    def from_numpy(cls, node_feat, edge_index, edge_weight=None, *,
                   sort_edges=True):
        """Build from an [2, E] edge_index (reference layout)."""
        senders = np.asarray(edge_index[0], dtype=np.int32)
        receivers = np.asarray(edge_index[1], dtype=np.int32)
        if edge_weight is not None:
            edge_weight = np.asarray(edge_weight, dtype=np.float32)
        if sort_edges and senders.size:
            order = np.argsort(receivers, kind="stable")
            senders, receivers = senders[order], receivers[order]
            if edge_weight is not None:
                edge_weight = edge_weight[order]
        return cls(
            node_feat=jnp.asarray(node_feat),
            senders=jnp.asarray(senders),
            receivers=jnp.asarray(receivers),
            edge_weight=None if edge_weight is None else jnp.asarray(edge_weight),
            num_nodes=int(node_feat.shape[0]),
            edges_sorted=bool(sort_edges),
        )


class NodeDataset:
    """Host-side dataset container (NCDataset-equivalent).

    graph: dict with 'edge_index' int64/int32 [2, E] numpy, 'node_feat'
    [N, F] numpy, 'edge_feat' (optional), 'num_nodes'. label: [N] or [N, T].
    """

    def __init__(self, name: str):
        self.name = name
        self.graph: Dict[str, Any] = {
            "edge_index": None,
            "node_feat": None,
            "edge_feat": None,
            "num_nodes": 0,
        }
        self.label = None
        self._fixed_splits = None

    def __len__(self):
        return 1

    def __repr__(self):
        return f"{self.__class__.__name__}({self.name}, N={self.graph['num_nodes']})"

    def get_idx_split(self, split_type="random", train_prop=0.5,
                      valid_prop=0.25, label_num_per_class=20, rng=None):
        """Reference parity: 'random' proportional split ignoring label −1
        (``data_utils.py:13-42``), 'class' balanced per-class split
        (``data_utils.py:75-107``), or fixed splits loaded by the dataset."""
        from difformer_tpu.data import splits as S

        label = np.asarray(self.label)
        if split_type == "random":
            return S.rand_train_test_idx(
                label, train_prop=train_prop, valid_prop=valid_prop, rng=rng
            )
        if split_type == "class":
            return S.class_rand_splits(
                label, label_num_per_class=label_num_per_class, rng=rng
            )
        if split_type == "fixed":
            if self._fixed_splits is None:
                raise ValueError(f"{self.name} has no fixed splits loaded")
            return self._fixed_splits
        raise ValueError(split_type)

    def to_graph_data(self, *, sort_edges=True) -> GraphData:
        return GraphData.from_numpy(
            self.graph["node_feat"],
            self.graph["edge_index"],
            sort_edges=sort_edges,
        )


@dataclasses.dataclass
class TemporalSnapshot:
    """One timestep of a temporal graph sequence (host numpy)."""

    node_feat: np.ndarray       # [N, F]
    edge_index: np.ndarray      # [2, E]
    edge_weight: Optional[np.ndarray]
    target: np.ndarray          # [N]
