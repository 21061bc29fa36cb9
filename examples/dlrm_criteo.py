"""DLRM on Criteo Kaggle — mirror of reference tf2_examples/dlrm_criteo.py.

Real data: put kaggle_processed.npz under dataset/criteo/ (see the
reference's data_utils pipeline). Otherwise a synthetic long-tail stand-in
is generated.
"""

import os

import numpy as np

from openrec_tpu.data import ShuffledArrayLoader, loaders
from openrec_tpu.models import criteo_dlrm
from openrec_tpu.training import Trainer

dim_embed = 4
bottom_mlp = (8, 4)
top_mlp = (128, 64, 1)
total_iter = int(1e5)
batch_size = 1024
eval_interval = 100

# quick-run / smoke-test overrides (tests/test_examples.py)
total_iter = int(os.environ.get("OPENREC_EXAMPLE_ITERS", total_iter))
eval_interval = int(os.environ.get("OPENREC_EXAMPLE_EVAL_INTERVAL",
                                   eval_interval))

if os.path.isfile("dataset/criteo/kaggle_processed.npz"):
    raw_data = loaders.load_criteo("dataset/")
else:
    print("dataset/criteo not found — using synthetic data")
    n_rec = (20000 if os.environ.get("OPENREC_EXAMPLE_SMALL") == "1"
             else 300000)
    raw_data = loaders.synthetic_criteo(num_records=n_rec)

model = criteo_dlrm(raw_data["counts"], dim_embed=dim_embed,
                    ln_bot=bottom_mlp, ln_top=top_mlp)
trainer = Trainer(model, lr=1e-3)

train_loader = ShuffledArrayLoader(
    {"dense_features": raw_data["X_int_train"],
     "sparse_features": raw_data["X_cat_train"],
     "label": raw_data["y_train"]},
    batch_size=batch_size, seed=0)

val_batch = {"dense_features": raw_data["X_int_val"][:8192],
             "sparse_features": raw_data["X_cat_val"][:8192],
             "label": raw_data["y_val"][:8192]}


def roc_auc(labels, scores):
    order = np.argsort(scores)
    ranks = np.empty(len(scores))
    ranks[order] = np.arange(1, len(scores) + 1)
    pos = labels > 0.5
    n_pos, n_neg = pos.sum(), (~pos).sum()
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


for it, batch in enumerate(train_loader):
    if it >= total_iter:
        break
    loss, _ = trainer.train_step(batch)
    if it % eval_interval == 0:
        pred = np.asarray(trainer._score(trainer.params, val_batch))
        auc = roc_auc(val_batch["label"], pred)
        print(f"Iter {it}  loss {float(loss):.4f}  val AUC {auc:.4f}",
              flush=True)
