from difformer_tpu.train.optim import torch_adam  # noqa: F401
from difformer_tpu.train.trainer import FullBatchTrainer, TrainState  # noqa: F401
