from difformer_tpu.utils.metrics import eval_acc, eval_f1, eval_rocauc  # noqa: F401
from difformer_tpu.utils.logger import RunLogger  # noqa: F401
