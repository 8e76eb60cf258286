from difformer_tpu.nn.difformer import DIFFormer, DIFFormerConv  # noqa: F401
from difformer_tpu.nn.difformer_v2 import DIFFormerV2, GraphLevelModel  # noqa: F401
