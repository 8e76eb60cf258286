from difformer_tpu.ops.segment import (  # noqa: F401
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
)
from difformer_tpu.ops.graph_ops import (  # noqa: F401
    degree,
    gcn_norm_weights,
    gcn_conv,
)
from difformer_tpu.ops.linear_attention import (  # noqa: F401
    simple_attention,
    simple_attention_padded,
)
from difformer_tpu.ops.sigmoid_attention import (  # noqa: F401
    sigmoid_attention,
    sigmoid_attention_dense,
)
from difformer_tpu.ops.ell import (  # noqa: F401
    build_ell_gcn,
    ell_spmm,
    gcn_conv_ell,
)
from difformer_tpu.ops.bsr import (  # noqa: F401
    bsr_bucketed_spmm,
    bsr_spmm,
    bsr_spmm_sharded,
    build_bsr_bucketed_gcn,
    build_bsr_gcn,
    build_bsr_gcn_sharded,
)
