"""DLRM training throughput at Criteo Kaggle scale on one TPU chip.

Measures the production path (fused single table + O(batch) sparse Adam,
per-step async dispatch) and the dense baseline; writes
benchmarks/dlrm_throughput.json. Run ALONE (single TPU chip; see
docs/PERF_NOTES.md).
"""

import json
import os

# Persistent compilation cache: repeat runs skip the (minutes-long)
# remote compiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# Criteo Kaggle per-table cardinalities (facebookresearch/dlrm counts).
COUNTS = [1460, 583, 10131227, 2202608, 305, 24, 12517, 633, 3, 93145,
          5683, 8351593, 3194, 27, 14992, 5461306, 10, 5652, 2173, 4,
          7046547, 18, 15, 286181, 105, 142572]
B = 4096
STEPS = 30


def make_batch(rng):
    import jax.numpy as jnp
    return {
        "dense_features": jnp.asarray(
            rng.normal(size=(B, 13)).astype(np.float32)),
        "sparse_features": jnp.asarray(np.stack(
            [rng.integers(0, c, B) for c in COUNTS],
            axis=1).astype(np.int32)),
        "label": jnp.asarray(rng.integers(0, 2, B).astype(np.float32)),
    }


def main():
    import jax

    from openrec_tpu.models import DLRM
    from openrec_tpu.training import Trainer
    from openrec_tpu.training.sparse import (
        dlrm_fused_table_spec, make_sparse_train_step)

    kw = dict(m_spa=16, ln_emb=tuple(COUNTS), ln_bot=(512, 256, 64, 16),
              ln_top=(512, 256, 1), dim_dense=13, loss_func="bce")
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    results = {}

    # dense baseline (separate tables, lazy_adam)
    tr = Trainer(DLRM(**kw), lr=1e-3, seed=0)
    tr.train_step(batch)
    jax.block_until_ready(tr.params["mlp_top"][0]["w"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        tr.train_step(batch)
    jax.block_until_ready(tr.params["mlp_top"][0]["w"])
    dt = (time.perf_counter() - t0) / STEPS
    results["dense_lazy_adam"] = {"ms_per_step": round(dt * 1e3, 3),
                                  "examples_per_s": round(B / dt, 1)}
    del tr

    # production path: fused table + sparse Adam
    model = DLRM(fused_tables=True, **kw)
    params = model.init(jax.random.PRNGKey(0))
    init_fn, step_fn, _ = make_sparse_train_step(
        model, dlrm_fused_table_spec(model), learning_rate=1e-3)
    st = init_fn(params)
    p, st, loss = step_fn(params, st, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(p["mlp_top"][0]["w"])
    t0 = time.perf_counter()
    for i in range(STEPS):
        p, st, loss = step_fn(p, st, batch, jax.random.PRNGKey(i))
    jax.block_until_ready(p["mlp_top"][0]["w"])
    dt = (time.perf_counter() - t0) / STEPS
    results["fused_sparse_adam"] = {"ms_per_step": round(dt * 1e3, 3),
                                    "examples_per_s": round(B / dt, 1)}
    results["config"] = {"batch": B, "m_spa": 16,
                         "total_rows": int(sum(COUNTS)),
                         "table_gb": round(sum(COUNTS) * 16 * 4 / 1e9, 2)}
    print(json.dumps(results, indent=2))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "dlrm_throughput.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
