from difformer_tpu.parallel.mesh import make_mesh  # noqa: F401
from difformer_tpu.parallel.partition import (  # noqa: F401
    ShardedGraph,
    boundary_rows,
    edge_balanced_layout,
    locality_layout,
    partition_graph,
)
from difformer_tpu.parallel.tensor_parallel import (  # noqa: F401
    make_tp_train_step,
    tp_apply,
    tp_param_specs,
    tp_shard_params,
)
