from difformer_tpu.parallel.mesh import make_mesh  # noqa: F401
from difformer_tpu.parallel.partition import ShardedGraph, partition_graph  # noqa: F401
from difformer_tpu.parallel.tensor_parallel import (  # noqa: F401
    make_tp_train_step,
    tp_apply,
    tp_param_specs,
    tp_shard_params,
)
