"""VBPR on Tradesy with the cached-embedding fast scorer — mirror of
reference tf1_examples/vbpr_tradesy.py (FastDotProductServer wiring,
:41-60).
"""

import os

import jax.numpy as jnp
import numpy as np

from openrec_tpu import Dataset, Trainer
from openrec_tpu.data import loaders
from openrec_tpu.models import VBPR
from openrec_tpu.modules.embedding import embedding_lookup
from openrec_tpu.serving import CachedDotProductScorer

dim_user = 100
dim_item = 50
batch_size = 1000
total_iter = int(1e5)
eval_interval = 1000

# quick-run / smoke-test overrides (tests/test_examples.py)
total_iter = int(os.environ.get("OPENREC_EXAMPLE_ITERS", total_iter))
eval_interval = int(os.environ.get("OPENREC_EXAMPLE_EVAL_INTERVAL",
                                   eval_interval))

if os.path.isdir("dataset/tradesy"):
    raw_data = loaders.load_tradesy("dataset/")
else:
    print("dataset/tradesy not found — using synthetic data")
    raw_data = dict(loaders.TRADESY)
    n = 100000
    if os.environ.get("OPENREC_EXAMPLE_SMALL") == "1":   # CPU smoke test
        raw_data = {"total_users": 800, "total_items": 4000}
        n = 20000
    raw = loaders.synthetic_interactions(raw_data["total_users"],
                                         raw_data["total_items"], n)
    raw_data["train_data"], raw_data["val_data"] = raw[:n - n // 10], \
        raw[n - n // 10:]
    n_vis = 16 if os.environ.get("OPENREC_EXAMPLE_SMALL") == "1" else 128
    raw_data["item_features"] = np.random.default_rng(0).normal(
        size=(raw_data["total_items"], n_vis)).astype(np.float32)

train_dataset = Dataset(raw_data["train_data"], raw_data["total_users"],
                        raw_data["total_items"])
val_dataset = Dataset(raw_data["val_data"], raw_data["total_users"],
                      raw_data["total_items"])
features = raw_data["item_features"]

model = VBPR(total_users=raw_data["total_users"],
             total_items=raw_data["total_items"],
             dim_user_embed=dim_user, dim_item_embed=dim_item,
             item_features=features)
trainer = Trainer(model, lr=1e-3)

# Cached scorer: extract user vecs / (id-embed ‖ MLP(visual)) item vecs /
# biases once per eval — the FastDotProductServer analog.
scorer = CachedDotProductScorer(
    model, raw_data["total_users"], raw_data["total_items"],
    extract_user_vecs=lambda p, ids: embedding_lookup(p["user_embed"], ids),
    extract_item_vecs=lambda p, ids: jnp.concatenate([
        embedding_lookup(p["item_embed"], ids),
        model._visual_mlp.apply(p["visual_mlp"],
                                jnp.asarray(features)[ids])], axis=-1),
    extract_item_bias=lambda p, ids: embedding_lookup(p["item_bias"], ids),
    serve_dtype=jnp.bfloat16)   # halves table HBM traffic at 166k items

sampler = train_dataset.pairwise(
    batch_size=batch_size, num_parallel_calls=4,
    joins=[("p_item_id", features, "p_item_vfeature"),
           ("n_item_id", features, "n_item_vfeature")])

for i, batch in enumerate(sampler):
    if i >= total_iter:
        break
    loss, _ = trainer.train_step(batch)
    if i % eval_interval == 0 and i > 0:
        # Ranking eval through the cached scorer (the reference fed its
        # FastDotProductServer to an EvalManager, vbpr_tradesy.py:57-63):
        # id batches + the chunked giant-catalog metric path — the
        # [B, 166k] score rows are never materialized.
        m = trainer.evaluate(
            val_dataset.evaluation(batch_size=1000,
                                   excl_datasets=[train_dataset],
                                   device_masks=True),
            at=(50, 100), scorer=scorer)
        print(f"Iter {i}  loss {float(loss):.4f}  AUC={m['AUC']:.4f}  "
              f"Recall@[50,100]={m['Recall']}", flush=True)
