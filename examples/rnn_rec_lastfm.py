"""RNNRec on LastFM — mirror of reference tf1_examples/rnn_rec_lastfm.py."""

import os

from openrec_tpu import Dataset, Trainer
from openrec_tpu.data import loaders
from openrec_tpu.models import RNNRec
from openrec_tpu.metrics import Mean

dim_item_embed = 50
max_seq_len = 100
num_units = 32
batch_size = 256
total_iter = int(1e4)
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
# held-out interactions for next-item evaluation (reference
# tf1_examples/rnn_rec_lastfm.py:24-28 wires a Test dataset +
# TemporalEvaluationSampler + AUC/Recall into the trainer)
test_dataset = Dataset(raw_data["test_data"], raw_data["total_users"],
                       raw_data["total_items"], sortby="ts")

model = RNNRec(total_items=raw_data["total_items"],
               dim_item_embed=dim_item_embed, max_seq_len=max_seq_len,
               num_units=num_units, softmax_samples=1000)
trainer = Trainer(model, lr=1e-3)

avg = Mean()
for i, batch in enumerate(train_dataset.temporal(
        batch_size=batch_size, max_seq_len=max_seq_len,
        num_parallel_calls=4)):
    if i >= total_iter:
        break
    loss, _ = trainer.train_step(batch)
    avg.update_state(float(loss))
    if i % eval_interval == 0:
        # next-item ranking over the full catalog (AUC, Recall@{100,500}
        # — the reference example's evaluator set)
        m = trainer.evaluate_temporal(
            test_dataset.temporal_evaluation(batch_size=batch_size,
                                             max_seq_len=max_seq_len),
            at=(100, 500))
        print(f"Iter {i}  loss {avg.result():.4f}  "
              f"AUC={m['AUC']:.4f}  Recall@[100,500]={m['Recall']}",
              flush=True)
        avg.reset_states()
