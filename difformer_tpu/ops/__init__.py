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
