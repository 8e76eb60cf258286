from difformer_tpu.data.graph import GraphData, NodeDataset  # noqa: F401
from difformer_tpu.data.batching import PaddedGraphBatch, pad_graph_batch  # noqa: F401
from difformer_tpu.data.loaders import load_dataset  # noqa: F401
