"""Host-only input-pipeline rate: what can the 2-vCPU host feed?

Measures samples/s of the flat pairwise feeder (native C++ sampler under
the threaded Prefetcher) across worker / C++-thread configs — the supply
ceiling for bench.py's host-sampled path. No TPU involved; run with the
host otherwise quiet.
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

USERS, ITEMS = 5551, 16980
FLAT = 200 * 1000          # one bench dispatch worth of samples
CALLS = 40


def run(workers, cpp_threads):
    os.environ["OPENREC_TPU_SAMPLER_THREADS"] = str(cpp_threads)
    from openrec_tpu.data import InteractionStore, Prefetcher
    from openrec_tpu.data.samplers import PairwiseSampler

    rng = np.random.default_rng(0)
    n = 204057
    data = np.zeros(n, dtype=[("user_id", np.int32),
                              ("item_id", np.int32)])
    data["user_id"] = rng.integers(0, USERS, n)
    data["item_id"] = rng.integers(0, ITEMS, n)
    store = InteractionStore(data, USERS, ITEMS, seed=0)
    sampler = PairwiseSampler(store, batch_size=FLAT, seed=0)
    feeder = Prefetcher(sampler, num_workers=workers, capacity=4)
    it = iter(feeder)
    next(it); next(it)                      # warm the workers
    t0 = time.perf_counter()
    for _ in range(CALLS):
        next(it)
    dt = time.perf_counter() - t0
    feeder.stop()
    rate = CALLS * FLAT / dt
    print(f"workers={workers} cpp_threads={cpp_threads}: "
          f"{rate/1e6:.1f}M samples/s", flush=True)
    return rate


if __name__ == "__main__":
    results = {}
    for workers, cpp in [(1, 1), (1, 2), (2, 1), (3, 1), (2, 2)]:
        results[f"w{workers}_t{cpp}"] = round(run(workers, cpp) / 1e6, 2)
    import json
    print(json.dumps(results))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "feeder_rate.json"), "w") as f:
        json.dump({"unit": "M samples/s",
                   "flat_batch": FLAT, "results": results}, f, indent=1)
