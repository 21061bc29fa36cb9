"""Device-sampled training quality vs the host sampler (VERDICT r2 #5).

The on-device sampler (data/device_sampler.py) draws positives uniformly
WITH replacement and rejects negatives in 4 fixed rounds, where the
host/reference path (data/samplers.py PairwiseSampler) samples uniform
records with an exactly-checked rejection loop. Throughput of the device
path is measured elsewhere (bench.py `device` mode); this benchmark
answers the QUALITY question: trained to the same step count on the same
planted CiteULike-scale data, does the device-sampled model reach the
same final AUC/Recall as the host-sampled one, within the seed band?

Protocol: BPR at the reference config (5,551x16,980, dim 50, batch 1000,
Adam 1e-3, lazy_adam production path on both sides), 30k steps, two
seeds per path, reference-semantics eval (mask batches, train-positive
exclusion) at checkpoints. The distributed device-sampled step is
numerically IDENTICAL to this single-device path by the mesh oracle test
(tests/test_parallel.py::test_device_sparse_step_matches_single_device
_oracle), so its quality is covered by these curves.

Runs on whatever backend is default (TPU via the axon plugin here; the
device loop is one XLA program per segment, so host load does not affect
the result — only wall time). Writes
benchmarks/device_sampler_quality.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

from benchmarks._planted import make_low_rank  # noqa: E402

USERS, ITEMS, RANK, PER_USER = 5551, 16980, 12, 36
DIM, BATCH, LR = 50, 1000, 0.001
CKPTS = (1000, 5000, 10000, 20000, 30000)
AT = (50, 100)
OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "device_sampler_quality.json")


def _log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _eval(tr, train_ds, test_ds):
    m = tr.evaluate(test_ds.evaluation(batch_size=1000,
                                       excl_datasets=[train_ds]), at=AT)
    return {"AUC": float(m["AUC"]),
            **{f"Recall@{k}": float(m["Recall"][i])
               for i, k in enumerate(AT)}}


def run(path, seed, train_ds, test_ds):
    from openrec_tpu.data.device_sampler import DevicePairwiseSampler
    from openrec_tpu.data.samplers import PairwiseSampler
    from openrec_tpu.models import BPR
    from openrec_tpu.training import Trainer

    model = BPR(total_users=USERS, total_items=ITEMS, dim_user_embed=DIM,
                dim_item_embed=DIM)
    tr = Trainer(model, lr=LR, seed=seed)
    if path.startswith("device"):
        sampler = DevicePairwiseSampler(train_ds.store, batch_size=BATCH)
    else:
        host_sampler = iter(PairwiseSampler(train_ds.store, BATCH,
                                            seed=seed))
    curve, done = [], 0
    for ck in CKPTS:
        k = ck - done
        if path.startswith("device"):
            # fixed segment length -> ONE compiled device loop for the
            # whole run (each distinct k is its own multi-minute axon
            # remote compile). path 'device' = the r3 FUSED single
            # program; 'device_unfused' = the r4 default (sampling as
            # its own dispatch feeding the fused K-step program).
            for _ in range(k // 1000):
                tr.train_steps_device(sampler, 1000,
                                      fused=(path == "device"))
        else:
            # fused multi-step dispatch over a pre-stacked host segment
            for lo in range(0, k, 200):
                kk = min(200, k - lo)
                batches = [next(host_sampler) for _ in range(kk)]
                tr.train_step_multi(batches)
        done = ck
        m = {"iter": ck, **_eval(tr, train_ds, test_ds)}
        curve.append(m)
        _log(f"  {path}/seed{seed} iter {ck}: {m}")
    return {"curve": curve, "final": curve[-1]}


def main():
    from openrec_tpu.data import Dataset

    _log(f"backend: {jax.default_backend()}")
    train_data, test_data = make_low_rank(USERS, ITEMS, RANK, PER_USER)
    train_ds = Dataset(train_data, USERS, ITEMS, seed=0)
    test_ds = Dataset(test_data, USERS, ITEMS, seed=0)

    out = {"config": {"users": USERS, "items": ITEMS, "dim": DIM,
                      "batch": BATCH, "lr": LR, "iters": CKPTS[-1],
                      "backend": jax.default_backend()}}
    if os.path.exists(OUT_PATH):
        try:
            with open(OUT_PATH) as f:
                prev = json.load(f)
            out.update({k: v for k, v in prev.items() if k != "config"})
            _log(f"resuming: {sorted(set(out) - {'config'})}")
        except Exception:
            pass
    for path in ("host", "device", "device_unfused"):
        for seed in (0, 7):
            key = f"{path}_seed{seed}"
            if key in out:
                _log(f"--- skip {key}")
                continue
            _log(f"=== {key} ===")
            out[key] = run(path, seed, train_ds, test_ds)
            with open(OUT_PATH, "w") as f:
                json.dump(out, f, indent=1)
    _log(f"wrote {OUT_PATH}")


if __name__ == "__main__":
    main()
