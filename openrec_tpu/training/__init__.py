from openrec_tpu.training.trainer import Trainer
from openrec_tpu.training.parallel_trainer import ParallelTrainer
from openrec_tpu.training.optim import keras_adam, lazy_adagrad, lazy_adam
