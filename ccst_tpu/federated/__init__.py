from ccst_tpu.federated.aggregate import aggregate
from ccst_tpu.federated.train_ops import make_train_step, make_eval_step
