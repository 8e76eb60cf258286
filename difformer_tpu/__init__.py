"""difformer_tpu — a TPU-native framework for energy-constrained diffusion
transformers (the DIFFormer family, ICLR'23 / JMLR'25).

Built from scratch for JAX/XLA/Pallas/pjit. Capability surface mirrors the
public PyTorch reference (qitianwu/DIFFormer) — linear O(N) global attention
(DIFFormer-s), O(N^2) sigmoid pairwise attention (DIFFormer-a), a GCN branch
over ``edge_index``, residual diffusion layers — across four task shapes:
full-batch node classification, graph-free set encoding, temporal snapshot
regression, and batched disconnected graphs for graph-level prediction.

Layering (bottom-up):
  ops/       pure tensor math: segment reductions, SpMM, attention kernels
  kernels/   Pallas TPU kernels for the hot ops
  nn/        flax modules: DIFFormer, DIFFormerV2, baseline GNN zoo
  parallel/  mesh / sharding / distributed (edge-partitioned) execution
  data/      graph containers, loaders, splits, batching
  train/     training engines for the four loop shapes
  utils/     config, logging, metrics
"""

__version__ = "0.1.0"

from difformer_tpu.data.graph import GraphData  # noqa: F401
from difformer_tpu.nn.difformer import DIFFormer, DIFFormerConv  # noqa: F401
from difformer_tpu.nn.difformer_v2 import DIFFormerV2  # noqa: F401
