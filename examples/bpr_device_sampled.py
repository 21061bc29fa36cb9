"""BPR with ON-DEVICE sampling — the framework's fastest end-to-end
training mode (bench.py headline; fetch-synced 7.9M examples/s best
state on this environment's tunneled chip — docs/PERF_NOTES.md
"r5 headline").

Batch construction (uniform positive records + rejection-sampled
negatives against a bitmap membership index) runs as its own device
dispatch feeding the fused K-step train program; the host sends one RNG
key per `steps_per_call` steps. Same quality as the host pipeline
(benchmarks/device_sampler_quality.json: ΔAUC < 1e-4 over 30k iters).
No reference counterpart — the reference's input pipeline is 5 CPU
worker processes (openrec/tf2/data/utils.py:164-214).
"""

import os

from openrec_tpu import Trainer
from openrec_tpu.data import Dataset, loaders
from openrec_tpu.data.device_sampler import DevicePairwiseSampler
from openrec_tpu.models import BPR

dim_embed = 50
batch_size = 1000
total_iter = int(1e5)
eval_interval = 1000
steps_per_call = 200

# quick-run / smoke-test overrides (tests/test_examples.py)
total_iter = int(os.environ.get("OPENREC_EXAMPLE_ITERS", total_iter))
eval_interval = int(os.environ.get("OPENREC_EXAMPLE_EVAL_INTERVAL",
                                   eval_interval))
steps_per_call = min(steps_per_call, eval_interval)

if os.path.isdir("dataset/citeulike"):
    raw_data = loaders.load_citeulike("dataset/")
else:
    print("dataset/citeulike not found — using synthetic data")
    n = 20000 if os.environ.get("OPENREC_EXAMPLE_SMALL") == "1" else 204057
    raw_data = loaders.synthetic_citeulike(num_records=n)

train_dataset = Dataset(raw_data["train_data"], raw_data["total_users"],
                        raw_data["total_items"])
val_dataset = Dataset(raw_data["val_data"], raw_data["total_users"],
                      raw_data["total_items"])

model = BPR(total_users=raw_data["total_users"],
            total_items=raw_data["total_items"],
            dim_user_embed=dim_embed, dim_item_embed=dim_embed)
trainer = Trainer(model, lr=1e-3)

# A Device*Sampler fed to Trainer.train switches the loop to fused
# device-sampled dispatches (Trainer.train_steps_device).
sampler = DevicePairwiseSampler(train_dataset.store,
                                batch_size=batch_size)

trainer.train(
    total_iter=total_iter,
    train_batches=sampler,
    eval_samplers={"val": val_dataset.evaluation(
        batch_size=batch_size, excl_datasets=[train_dataset])},
    eval_interval=eval_interval,
    at=(50, 100),
    steps_per_call=steps_per_call,
)
