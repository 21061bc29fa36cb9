"""Full BPR training run at the reference CiteULike config on TPU:
trains 20k iterations (fused 200-step dispatches) on planted low-rank
synthetic data, evaluating AUC/Recall@{50,100} every 2k iterations.

Writes benchmarks/bpr_training_run.json (metric trajectory + wall time) —
the end-to-end "does the whole system train to quality at speed" artifact.
Run ALONE (uses the TPU).
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

USERS, ITEMS, DIM, BATCH = 5551, 16980, 50, 1000
RANK, PER_USER = 16, 60
TOTAL_ITER, EVAL_EVERY, K = 8000, 1000, 200


def make_low_rank(seed=0):
    rng = np.random.default_rng(seed)
    U = rng.normal(size=(USERS, RANK)).astype(np.float32)
    V = rng.normal(size=(ITEMS, RANK)).astype(np.float32)
    scores = U @ V.T
    top = np.argpartition(-scores, PER_USER, axis=1)[:, :PER_USER]
    rows_tr, rows_te = [], []
    for u in range(USERS):
        items = top[u].copy()
        rng.shuffle(items)
        half = PER_USER // 2
        rows_tr += [(u, i) for i in items[:half]]
        rows_te += [(u, i) for i in items[half:]]
    dtype = [("user_id", np.int32), ("item_id", np.int32)]
    return (np.array(rows_tr, dtype=dtype), np.array(rows_te, dtype=dtype))


def main():
    import jax

    from openrec_tpu.data import Dataset, Prefetcher
    from openrec_tpu.data.samplers import PairwiseSampler
    from openrec_tpu.models import BPR
    from openrec_tpu.training import Trainer

    train_data, test_data = make_low_rank()
    train_ds = Dataset(train_data, USERS, ITEMS, seed=0)
    test_ds = Dataset(test_data, USERS, ITEMS, seed=0)
    model = BPR(total_users=USERS, total_items=ITEMS, dim_user_embed=DIM,
                dim_item_embed=DIM, l2_weight=1e-4)
    tr = Trainer(model, lr=1e-3, seed=0)

    sampler = PairwiseSampler(train_ds.store, batch_size=K * BATCH, seed=0)
    feeder = Prefetcher(sampler, num_workers=2, capacity=4)
    it = iter(feeder)

    trajectory = []
    t_train = 0.0
    for start in range(0, TOTAL_ITER, EVAL_EVERY):
        t0 = time.perf_counter()
        for _ in range(EVAL_EVERY // K):
            tr.train_step_multi_flat(next(it), K)
        jax.block_until_ready(tr.params["item_embed"])
        t_train += time.perf_counter() - t0
        res = tr.evaluate(test_ds.evaluation(
            batch_size=512, excl_datasets=[train_ds]), at=(50, 100))
        point = {"iter": tr.global_step, "AUC": float(res["AUC"]),
                 "Recall@50": float(res["Recall"][0]),
                 "Recall@100": float(res["Recall"][1])}
        trajectory.append(point)
        print(point, flush=True)
    feeder.stop()

    out = {
        "config": {"users": USERS, "items": ITEMS, "dim": DIM,
                   "batch": BATCH, "total_iter": TOTAL_ITER,
                   "lr": 1e-3, "l2_weight": 1e-4, "data": "planted low-rank"},
        "train_seconds": round(t_train, 2),
        "examples_per_s": round(TOTAL_ITER * BATCH / t_train, 1),
        "trajectory": trajectory,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bpr_training_run.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
