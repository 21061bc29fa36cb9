from openrec_tpu.training.trainer import Trainer
from openrec_tpu.training.optim import lazy_adagrad, lazy_adam
