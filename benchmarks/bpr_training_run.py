"""Full BPR training run at the reference CiteULike config on TPU, BOTH
production feed paths (host-fed C++ sampler + fused dispatches, and
on-device-sampled), one subprocess per path. Planted low-rank data,
AUC/Recall@K every EVAL_EVERY iterations with metrics kept ON DEVICE
until the end (defer_metrics) and the wall FETCH-SYNCED on the final
deferred-metrics device_get — the only execution barrier this backend
honors (docs/PERF_NOTES.md r5: block_until_ready is an enqueue-ack;
this harness's pre-r5 "train seconds" were dispatch-issue fiction).

Writes benchmarks/bpr_training_run.json (per-path trajectory +
fetch-synced wall incl. eval) — the end-to-end "does the whole system
train to quality at speed" artifact. Run ALONE (uses the TPU).
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


def run_path(path_name, train_ds, test_ds, model):
    import jax

    from openrec_tpu.data import Prefetcher
    from openrec_tpu.data.device_sampler import DevicePairwiseSampler
    from openrec_tpu.data.samplers import PairwiseSampler
    from openrec_tpu.training import Trainer

    tr = Trainer(model, lr=1e-3, seed=0)
    if path_name == "host":
        sampler = PairwiseSampler(train_ds.store, batch_size=K * BATCH,
                                  seed=0)
        feeder = Prefetcher(sampler, num_workers=2, capacity=4)
        it = iter(feeder)
    else:
        dsampler = DevicePairwiseSampler(train_ds.store, batch_size=BATCH)

    # Warm/compile OUTSIDE the timed region (axon remote compiles run
    # 1.5s-200s per program and the persistent cache does not capture
    # them — counting them in t_train is what made the r3 artifact
    # report 2M ex/s).
    if path_name == "host":
        tr.train_step_multi_flat(next(it), K)
    else:
        tr.train_steps_device(dsampler, K)
    jax.block_until_ready(tr.params["item_embed"])
    warm_steps = tr.global_step

    # metrics stay ON DEVICE until after the timed region (a fetch
    # inside the loop would flip the client into synchronous dispatch
    # and serialize the rest — PERF_NOTES r5). The wall is FETCH-SYNCED:
    # it ends after jax.device_get of the deferred metrics, the only
    # barrier this backend honors — block_until_ready is an enqueue-ack
    # and the per-interval "train seconds" this harness used to record
    # were dispatch-issue fiction (30-220x optimistic).
    time.sleep(10)               # drain the warm call without fetching
    deferred = []
    t_enq = 0.0
    t_wall0 = time.perf_counter()
    for _start in range(0, TOTAL_ITER, EVAL_EVERY):
        t0 = time.perf_counter()
        for _ in range(EVAL_EVERY // K):
            if path_name == "host":
                tr.train_step_multi_flat(next(it), K)
            else:
                tr.train_steps_device(dsampler, K)
        jax.block_until_ready(tr.params["item_embed"])  # enqueue-ack
        t_enq += time.perf_counter() - t0
        res = tr.evaluate(test_ds.evaluation(
            batch_size=512, excl_datasets=[train_ds]), at=(50, 100),
            defer_metrics=True)
        deferred.append((tr.global_step, res))
    if path_name == "host":
        feeder.stop()
    fetched = jax.device_get([r for _, r in deferred])  # TRUE barrier
    wall = time.perf_counter() - t_wall0
    trajectory = [{"iter": step, "AUC": float(r["AUC"]),
                   "Recall@50": float(np.asarray(r["Recall"])[0]),
                   "Recall@100": float(np.asarray(r["Recall"])[1])}
                  for (step, _), r in zip(deferred, fetched)]
    for point in trajectory:
        print(path_name, point, flush=True)
    return {"wall_incl_eval_s": round(wall, 3),
            "examples_per_s_incl_eval": round(
                TOTAL_ITER * BATCH / wall, 1),
            "enqueue_paced_train_seconds_DIAGNOSTIC": round(t_enq, 3),
            "warm_steps_before_timing": warm_steps,
            "trajectory": trajectory}


def _run_one(path_name):
    from openrec_tpu.data import Dataset
    from openrec_tpu.models import BPR

    train_data, test_data = make_low_rank()
    train_ds = Dataset(train_data, USERS, ITEMS, seed=0)
    test_ds = Dataset(test_data, USERS, ITEMS, seed=0)
    model = BPR(total_users=USERS, total_items=ITEMS, dim_user_embed=DIM,
                dim_item_embed=DIM, l2_weight=1e-4)
    return run_path(path_name, train_ds, test_ds, model)


def main():
    # One SUBPROCESS per feed path (the roofline benchmarks' pattern):
    # the host path's end-of-run metric fetch leaves the process in the
    # degraded donation state, which would contaminate the device path's
    # timings if they shared a process.
    import subprocess
    import sys as _sys

    out = {"config": {"users": USERS, "items": ITEMS, "dim": DIM,
                      "batch": BATCH, "total_iter": TOTAL_ITER,
                      "lr": 1e-3, "l2_weight": 1e-4,
                      "data": "planted low-rank",
                      "metrics": "device-resident, fetched at end",
                      "isolation": "one subprocess per path"}}
    for path_name in ("host", "device"):
        proc = subprocess.run(
            [_sys.executable, os.path.abspath(__file__), path_name],
            capture_output=True, text=True, timeout=1800)
        if proc.returncode != 0:
            raise RuntimeError(f"{path_name} failed:\n{proc.stdout[-2000:]}"
                               f"\n{proc.stderr[-2000:]}")
        out[path_name] = json.loads(proc.stdout.splitlines()[-1])
        print(path_name, "done:", out[path_name]["wall_incl_eval_s"],
              "s (fetch-synced)", flush=True)
    # back-compat top-level fields = the host path
    out["examples_per_s"] = out["host"]["examples_per_s_incl_eval"]
    out["trajectory"] = out["host"]["trajectory"]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bpr_training_run.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        print(json.dumps(_run_one(sys.argv[1])))
    else:
        main()
