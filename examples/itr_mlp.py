"""ItrMLP — temporal embedding forward-propagation training.

Mirror of reference tf1_examples/legacy_examples/exp_itr_mlp.py +
ItrMLPModelTrainer (legacy itr_mlp_model_trainer.py:8-76), now driven
entirely through the harness:

  - identity-pretrain the transform MLPs
    (temporal_latent_factor.py:82-88);
  - chronological (epoch-sequential, unshuffled) explicit sampling
    (legacy ExplicitSampler(chronological=True));
  - Trainer.train(update_interval=...) forward-propagates the embeddings
    every `update_itr` iterations (itr_mlp_model_trainer.py:46-47);
  - regression (MSE) evaluation over held-out rating records
    (itr_mlp_model_trainer.py:50-76 + evaluators/mse.py).
"""

import jax
import numpy as np

from openrec_tpu.data import Dataset
from openrec_tpu.models import ItrMLP
from openrec_tpu.training import Trainer

import os

dim_embed = 20
batch_size = 256
update_itr = 200          # forward-propagate embeddings this often
eval_itr = 1000
total_users, total_items, n_records = 2000, 3000, 300_000
pretrain_steps = 2000
# quick-run / smoke-test overrides (tests/test_examples.py)
if os.environ.get("OPENREC_EXAMPLE_SMALL") == "1":
    total_users, total_items, n_records = 300, 500, 20_000
    update_itr, eval_itr, pretrain_steps = 10, 30, 20

# Synthetic time-ordered explicit ratings (the reference trains on
# time-formatted Netflix ratings; records must arrive in time order for
# chronological sampling to mean anything).
rng = np.random.default_rng(0)
raw = np.zeros(n_records, dtype=[("user_id", np.int32),
                                 ("item_id", np.int32),
                                 ("label", np.float32)])
raw["user_id"] = rng.integers(0, total_users, n_records)
raw["item_id"] = rng.integers(0, total_items, n_records)
affinity = rng.normal(size=(total_users, 8)) @ rng.normal(
    size=(8, total_items))
raw["label"] = 1 / (1 + np.exp(-affinity[raw["user_id"], raw["item_id"]]))

split = int(n_records * 0.9)
train_dataset = Dataset(raw[:split], total_users, total_items, seed=0)
val_dataset = Dataset(raw[split:], total_users, total_items, seed=0)

model = ItrMLP(total_users=total_users, total_items=total_items,
               dim_embed=dim_embed, user_dims=(30, 30, dim_embed),
               item_dims=(30, 30, dim_embed))
trainer = Trainer(model, lr=1e-3)

print("[pretrain MLPs toward identity]")
trainer.params = model.pretrain_identity(trainer.params,
                                         jax.random.PRNGKey(0),
                                         steps=pretrain_steps)

trainer.train(
    total_iter=int(os.environ.get("OPENREC_EXAMPLE_ITERS",
                                  split // batch_size)),
    train_batches=train_dataset.explicit(batch_size=batch_size,
                                         chronological=True),
    eval_samplers={"val": val_dataset.regression_evaluation(batch_size)},
    eval_interval=eval_itr,
    update_interval=update_itr)
