"""YouTubeRec on LastFM — mirror of reference
tf1_examples/youtube_rec_lastfm.py (user_dict/item_dict/dim dicts,
:14-19: gender + geo user features feeding the softmax MLP)."""

import os

import numpy as np

from openrec_tpu import Dataset, Trainer
from openrec_tpu.data import loaders
from openrec_tpu.models import YouTubeRec
from openrec_tpu.metrics import Mean

dim_item_embed = 50
dim_gender, dim_geo = 10, 40
max_seq_len = 20
batch_size = 256
total_iter = int(1e4)
eval_interval = 100

# quick-run / smoke-test overrides (tests/test_examples.py)
total_iter = int(os.environ.get("OPENREC_EXAMPLE_ITERS", total_iter))
eval_interval = int(os.environ.get("OPENREC_EXAMPLE_EVAL_INTERVAL",
                                   eval_interval))

if os.path.isdir("dataset/lastfm"):
    raw_data = loaders.load_lastfm("dataset/")
    user_feature = np.load("dataset/lastfm/user_feature.npy")
    gender = user_feature["user_gender"]
    geo = user_feature["user_geo"]
else:
    print("dataset/lastfm not found — using synthetic data")
    raw_data = dict(loaders.LASTFM)
    raw = loaders.synthetic_interactions(raw_data["total_users"],
                                         raw_data["total_items"], 50000,
                                         timestamps=True)
    raw_data["train_data"], raw_data["test_data"] = raw[:45000], raw[45000:]
    rng = np.random.default_rng(0)
    gender = rng.integers(0, 3, raw_data["total_users"]).astype(np.int32)
    geo = rng.integers(0, 67, raw_data["total_users"]).astype(np.int32)

train_dataset = Dataset(raw_data["train_data"], raw_data["total_users"],
                        raw_data["total_items"], sortby="ts")
# held-out next-item eval with the same user-feature joins (reference
# tf1_examples/youtube_rec_lastfm.py:28-36 wires YouTubeEvaluationSampler
# + AUC/Recall)
test_dataset = Dataset(raw_data["test_data"], raw_data["total_users"],
                       raw_data["total_items"], sortby="ts")

model = YouTubeRec(total_items=raw_data["total_items"],
                   dim_item_embed=dim_item_embed, max_seq_len=max_seq_len,
                   total_genders=3, total_geos=67,
                   dim_gender_embed=dim_gender, dim_geo_embed=dim_geo)
trainer = Trainer(model, lr=1e-3)

batches = train_dataset.temporal(
    batch_size=batch_size, max_seq_len=max_seq_len, num_parallel_calls=4,
    joins=[("user_id", gender, "user_gender"),
           ("user_id", geo, "user_geo")])

avg = Mean()
for i, batch in enumerate(batches):
    if i >= total_iter:
        break
    loss, _ = trainer.train_step(batch)
    avg.update_state(float(loss))
    if i % eval_interval == 0:
        m = trainer.evaluate_temporal(
            test_dataset.temporal_evaluation(
                batch_size=batch_size, max_seq_len=max_seq_len,
                joins=[("user_id", gender, "user_gender"),
                       ("user_id", geo, "user_geo")]),
            at=(100, 500))
        print(f"Iter {i}  loss {avg.result():.4f}  "
              f"AUC={m['AUC']:.4f}  Recall@[100,500]={m['Recall']}",
              flush=True)
        avg.reset_states()
