"""VanillaYouTubeRec on LastFM — mirror of reference
tf1_examples/vanilla_youtube_rec_lastfm.py (TemporalSampler windows into
the mean-pool + MLP softmax model, next-item AUC/Recall eval,
:10-39)."""

import os

from openrec_tpu import Dataset, Trainer
from openrec_tpu.data import loaders
from openrec_tpu.metrics import Mean
from openrec_tpu.models import VanillaYouTubeRec

dim_item_embed = 50
max_seq_len = 20
batch_size = 100
total_iter = int(1e5)
eval_interval = 100

# quick-run / smoke-test overrides (tests/test_examples.py)
total_iter = int(os.environ.get("OPENREC_EXAMPLE_ITERS", total_iter))
eval_interval = int(os.environ.get("OPENREC_EXAMPLE_EVAL_INTERVAL",
                                   eval_interval))

if os.path.isdir("dataset/lastfm"):
    raw_data = loaders.load_lastfm("dataset/")
else:
    print("dataset/lastfm not found — using synthetic data")
    raw_data = dict(loaders.LASTFM)
    raw = loaders.synthetic_interactions(raw_data["total_users"],
                                         raw_data["total_items"], 50000,
                                         timestamps=True)
    raw_data["train_data"], raw_data["test_data"] = raw[:45000], raw[45000:]

train_dataset = Dataset(raw_data["train_data"], raw_data["total_users"],
                        raw_data["total_items"], sortby="ts")
test_dataset = Dataset(raw_data["test_data"], raw_data["total_users"],
                       raw_data["total_items"], sortby="ts")

model = VanillaYouTubeRec(total_items=raw_data["total_items"],
                          dim_item_embed=dim_item_embed,
                          max_seq_len=max_seq_len)
trainer = Trainer(model, lr=1e-3)

batches = train_dataset.temporal(batch_size=batch_size,
                                 max_seq_len=max_seq_len,
                                 num_parallel_calls=4)

avg = Mean()
for i, batch in enumerate(batches):
    if i >= total_iter:
        break
    loss, _ = trainer.train_step(batch)
    avg.update_state(float(loss))
    if i % eval_interval == 0:
        m = trainer.evaluate_temporal(
            test_dataset.temporal_evaluation(batch_size=batch_size,
                                             max_seq_len=max_seq_len),
            at=(100, 500))
        print(f"Iter {i}  loss {avg.result():.4f}  "
              f"AUC={m['AUC']:.4f}  Recall@[100,500]={m['Recall']}",
              flush=True)
        avg.reset_states()
