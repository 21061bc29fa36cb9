"""DLRM flagship end-to-end run at Criteo Kaggle scale on one TPU chip.

Trains the production configuration (fused single table + O(batch) sparse
Adam, per-step async dispatch — docs/PERF_NOTES.md) on planted-structure
synthetic CTR data at the full Criteo-Kaggle table layout (33.8M rows /
2.16 GB of fp32 tables), with interval validation AUC — recording the
quality trajectory AND the sustained throughput INCLUDING eval pauses in
one artifact (the reference flow: tf2_examples/dlrm_criteo.py:42-72,
which interleaves eval every eval_interval batches).

Planted structure: label = Bernoulli(sigmoid(w·dense + Σ_j a·sin(id_j·φ_j)))
— a fixed per-id affinity each embedding can learn, with no giant host
arrays. Validation uses held-out draws from the same generator, so rising
val AUC = genuine learning, not memorization.

Writes benchmarks/dlrm_training_run.json. Run ALONE on the TPU:
  python benchmarks/dlrm_training_run.py
"""

import json
import os

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
TOTAL_STEPS = 3000
EVAL_EVERY = 500
TRAIN_POOL = 512          # distinct pre-staged train batches (~2.1M ex)
VAL_BATCHES = 32
SEED = 0

_PHI = None


def _phi():
    global _PHI
    if _PHI is None:
        r = np.random.default_rng(SEED + 99)
        _PHI = (r.uniform(0.1, 3.0, len(COUNTS)).astype(np.float64),
                r.normal(size=13).astype(np.float32) * 0.5)
    return _PHI


def gen_batch(rng):
    phi, w = _phi()
    dense = rng.normal(size=(B, 13)).astype(np.float32)
    sparse = (rng.integers(0, 2 ** 62, size=(B, len(COUNTS)))
              % np.asarray(COUNTS)[None, :]).astype(np.int32)
    logit = dense @ w + 0.35 * np.sin(sparse * phi[None, :]).sum(axis=1)
    label = (rng.uniform(size=B) < 1 / (1 + np.exp(-logit))).astype(
        np.float32)
    return {"dense_features": dense, "sparse_features": sparse,
            "label": label}


def auc_np(y, s):
    order = np.argsort(s)
    ranks = np.empty(len(s))
    ranks[order] = np.arange(1, len(s) + 1)
    n_pos = y.sum()
    n_neg = len(y) - n_pos
    return float((ranks[y > 0].sum() - n_pos * (n_pos + 1) / 2)
                 / (n_pos * n_neg))


def main():
    import jax
    import jax.numpy as jnp

    from openrec_tpu.models import DLRM
    from openrec_tpu.training.sparse import (
        dlrm_fused_table_spec, make_sparse_train_step)

    model = DLRM(m_spa=16, ln_emb=tuple(COUNTS),
                 ln_bot=(512, 256, 64, 16), ln_top=(512, 256, 1),
                 dim_dense=13, loss_func="bce", fused_tables=True)
    params = model.init(jax.random.PRNGKey(SEED))
    init_fn, step_fn, _ = make_sparse_train_step(
        model, dlrm_fused_table_spec(model), learning_rate=1e-3)
    opt_state = init_fn(params)
    predict = jax.jit(model.predict)

    print(f"staging {TRAIN_POOL} train + {VAL_BATCHES} val batches",
          flush=True)
    rng = np.random.default_rng(SEED)
    t0 = time.perf_counter()
    train_pool = [{k: jnp.asarray(v) for k, v in gen_batch(rng).items()}
                  for _ in range(TRAIN_POOL)]
    val_rng = np.random.default_rng(SEED + 1)
    val = [gen_batch(val_rng) for _ in range(VAL_BATCHES)]
    val_dev = [(jnp.asarray(b["dense_features"]),
                jnp.asarray(b["sparse_features"]), b["label"])
               for b in val]
    print(f"staged in {time.perf_counter() - t0:.1f}s", flush=True)

    def val_auc():
        ys, ss = [], []
        for dense, sparse, label in val_dev:
            ss.append(np.asarray(predict(params, dense, sparse)))
            ys.append(label)
        return auc_np(np.concatenate(ys), np.concatenate(ss))

    # compile + warm
    params, opt_state, loss = step_fn(params, opt_state, train_pool[0],
                                      jax.random.PRNGKey(0))
    jax.block_until_ready(loss)
    base_auc = val_auc()
    print(f"init val AUC {base_auc:.4f}", flush=True)

    curve = []
    t_start = time.perf_counter()
    t_int = t_start
    for i in range(1, TOTAL_STEPS + 1):
        params, opt_state, loss = step_fn(
            params, opt_state, train_pool[i % TRAIN_POOL],
            jax.random.PRNGKey(i))
        if i % EVAL_EVERY == 0:
            jax.block_until_ready(loss)
            train_dt = time.perf_counter() - t_int
            a = val_auc()
            t_int = time.perf_counter()
            rec = {"step": i, "val_auc": round(a, 4),
                   "loss": round(float(loss), 4),
                   "train_ms_per_step": round(train_dt / EVAL_EVERY * 1e3,
                                              3)}
            curve.append(rec)
            print(rec, flush=True)
    jax.block_until_ready(params["mlp_top"][0]["w"])
    wall = time.perf_counter() - t_start
    sustained = TOTAL_STEPS * B / wall

    out = {
        "config": {"batch": B, "m_spa": 16, "total_rows": int(sum(COUNTS)),
                   "table_gb": round(sum(COUNTS) * 16 * 4 / 1e9, 2),
                   "steps": TOTAL_STEPS, "eval_every": EVAL_EVERY,
                   "path": "fused table + O(batch) sparse Adam, "
                           "per-step async"},
        "init_val_auc": round(base_auc, 4),
        "curve": curve,
        "wall_s": round(wall, 2),
        "sustained_examples_per_s_incl_eval": round(sustained, 1),
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "dlrm_training_run.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
