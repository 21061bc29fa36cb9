"""ItrMLP — temporal embedding forward-propagation training loop.

Mirror of reference tf1_examples/legacy_examples/exp_itr_mlp.py +
ItrMLPModelTrainer (legacy itr_mlp_model_trainer.py:8-76): identity-pretrain
the transform MLPs, then interleave training segments with
`update_embeddings` every `update_itr` iterations.
"""

import jax
import numpy as np

from openrec_tpu.data import Dataset, loaders
from openrec_tpu.models import ItrMLP
from openrec_tpu.training import Trainer

dim_embed = 20
batch_size = 256
update_itr = 100          # forward-propagate embeddings this often
segments = 20

raw = loaders.synthetic_citeulike(num_records=50000)
train_dataset = Dataset(raw["train_data"], raw["total_users"],
                        raw["total_items"])

model = ItrMLP(total_users=raw["total_users"],
               total_items=raw["total_items"], dim_embed=dim_embed)
trainer = Trainer(model, lr=1e-3)

print("[pretrain MLPs toward identity]")
trainer.params = model.pretrain_identity(trainer.params,
                                         jax.random.PRNGKey(0), steps=2000)

batches = iter(train_dataset.stratified_pointwise(batch_size=batch_size,
                                                  num_parallel_calls=2))
for seg in range(segments):
    losses = []
    for _ in range(update_itr):
        loss, _ = trainer.train_step(next(batches))
        losses.append(float(loss))
    trainer.params = model.update_embeddings(trainer.params)
    print(f"segment {seg}: loss {np.mean(losses):.4f} "
          f"(embeddings forward-propagated)", flush=True)
