"""Device-mesh helpers.

The reference has no distributed layer at all (single ``cuda:N`` device,
``node classification/main.py:37-40``; SURVEY.md §2.6). Here scale-out is
mesh-first: a 1-D ``graph`` axis shards nodes/edges of one large graph
(sequence-parallel analog), and a ``data`` axis shards batches of small
graphs (DP for the particle track). Multi-host: the same meshes span hosts
via ``jax.distributed.initialize`` — collectives ride ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


GRAPH_AXIS = "graph"
DATA_AXIS = "data"


def make_mesh(axis_sizes: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = (GRAPH_AXIS,),
              devices=None) -> Mesh:
    """Build a mesh over all (or given) devices. Default: 1-D node-sharding
    axis over every device."""
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    devs = np.asarray(devices[: int(np.prod(axis_sizes))]).reshape(axis_sizes)
    return Mesh(devs, axis_names)


def node_sharding(mesh: Mesh, axis: str = GRAPH_AXIS) -> NamedSharding:
    """Shard the leading (node) dimension."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
