"""DLRM with mesh parallelism — batch over 'data', embedding rows over
'model'. No reference counterpart (the reference is single-device); run
with real chips or simulate:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/dlrm_criteo_multichip.py
"""

import os

import numpy as np
import jax

from openrec_tpu.data import ShuffledArrayLoader, loaders, to_device
from openrec_tpu.models import criteo_dlrm
from openrec_tpu.parallel import (
    batch_sharding, make_mesh, make_parallel_train_step)
from openrec_tpu.training.optim import lazy_adam

batch_size = 1024
total_iter = int(os.environ.get("OPENREC_EXAMPLE_ITERS", 500))

n_rec = (20000 if os.environ.get("OPENREC_EXAMPLE_SMALL") == "1"
         else 100000)
raw_data = loaders.synthetic_criteo(num_records=n_rec)
n_dev = len(jax.devices())
model_axis = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
mesh = make_mesh(data=n_dev // model_axis, model=model_axis)
print(f"mesh: {dict(mesh.shape)}")

# Pad tables so rows split evenly across the model axis.
counts = np.maximum(raw_data["counts"], 1)
counts = ((counts + model_axis - 1) // model_axis) * model_axis
model = criteo_dlrm(counts, dim_embed=8, ln_bot=(16, 8),
                    ln_top=(64, 32, 1))

step_fn, init_fn = make_parallel_train_step(model, lazy_adam(1e-3), mesh)
params, opt_state, _ = init_fn(jax.random.PRNGKey(0))

loader = ShuffledArrayLoader(
    {"dense_features": raw_data["X_int_train"],
     "sparse_features": raw_data["X_cat_train"],
     "label": raw_data["y_train"]},
    batch_size=batch_size, seed=0)

bs = batch_sharding(mesh)
for i, batch in enumerate(loader):
    if i >= total_iter:
        break
    batch = to_device(batch, bs)
    params, opt_state, loss, _ = step_fn(params, opt_state, batch,
                                         jax.random.PRNGKey(i))
    if i % 100 == 0:
        print(f"Iter {i}  loss {float(loss):.4f}", flush=True)
print("done")
