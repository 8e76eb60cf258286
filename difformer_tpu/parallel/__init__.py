from difformer_tpu.parallel.mesh import make_mesh  # noqa: F401
from difformer_tpu.parallel.partition import ShardedGraph, partition_graph  # noqa: F401
