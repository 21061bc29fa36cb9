"""UCML on CiteULike — mirror of reference tf1_examples/ucml_citeulike.py.

The reference runs a custom `train_iter_func` executing censor ops after
each step (ucml_citeulike.py:28-34); here the projection is the model's
post_step hook, fused into the jitted train step automatically.
"""

import os

from openrec_tpu import Dataset, Trainer
from openrec_tpu.data import loaders
from openrec_tpu.models import UCML

dim_embed = 50
total_iter = int(1e5)
batch_size = 1000
eval_interval = 1000

# quick-run / smoke-test overrides (tests/test_examples.py)
total_iter = int(os.environ.get("OPENREC_EXAMPLE_ITERS", total_iter))
eval_interval = int(os.environ.get("OPENREC_EXAMPLE_EVAL_INTERVAL",
                                   eval_interval))

if os.path.isdir("dataset/citeulike"):
    raw_data = loaders.load_citeulike("dataset/")
else:
    raw_data = loaders.synthetic_citeulike()

train_dataset = Dataset(raw_data["train_data"], raw_data["total_users"],
                        raw_data["total_items"])
val_dataset = Dataset(raw_data["val_data"], raw_data["total_users"],
                      raw_data["total_items"])

model = UCML(total_users=raw_data["total_users"],
             total_items=raw_data["total_items"],
             dim_user_embed=dim_embed, dim_item_embed=dim_embed,
             margin=0.5)

trainer = Trainer(model, lr=1e-3)
trainer.train(
    total_iter=total_iter,
    train_batches=train_dataset.pairwise(batch_size=batch_size,
                                         num_parallel_calls=4),
    eval_samplers={"val": val_dataset.evaluation(
        batch_size=batch_size, excl_datasets=[train_dataset])},
    eval_interval=eval_interval, at=(50, 100), steps_per_call=100)
