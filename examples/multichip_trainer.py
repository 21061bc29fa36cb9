"""Multi-chip training through the high-level harness: ParallelTrainer.

Same UX as the single-device Trainer (intervals, eval, checkpoints), but
batches shard over the mesh's 'data' axis and embedding tables row-shard
over 'model'. Simulate without hardware:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/multichip_trainer.py
"""

import os

import numpy as np
import jax

from openrec_tpu import Dataset, ParallelTrainer
from openrec_tpu.models import BPR
from openrec_tpu.parallel import make_mesh

total_users, total_items = 2000, 8192
rng = np.random.default_rng(0)
n = 100_000
raw = np.zeros(n, dtype=[("user_id", np.int32), ("item_id", np.int32)])
raw["user_id"] = rng.integers(0, total_users, n)
raw["item_id"] = rng.integers(0, total_items, n)
train = Dataset(raw[: int(n * 0.9)], total_users, total_items, seed=0)
val = Dataset(raw[int(n * 0.9):], total_users, total_items, seed=0)

n_dev = len(jax.devices())
model_axis = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
mesh = make_mesh(data=n_dev // model_axis, model=model_axis)
print(f"mesh: {dict(mesh.shape)}")

model = BPR(total_users=total_users, total_items=total_items,
            dim_user_embed=32, dim_item_embed=32)
trainer = ParallelTrainer(model, mesh, lr=1e-3,
                          save_model_dir="/tmp/multichip_ckpt")
trainer.train(
    total_iter=int(os.environ.get("OPENREC_EXAMPLE_ITERS", 400)),
    train_batches=train.pairwise(batch_size=1024, num_parallel_calls=2),
    eval_samplers={"val": val.evaluation(256, excl_datasets=[train])},
    eval_interval=int(os.environ.get("OPENREC_EXAMPLE_EVAL_INTERVAL",
                                     200)),
    save_interval=200)
