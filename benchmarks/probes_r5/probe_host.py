"""Fetch-synced TRUE rates for the host-fed BPR paths (prestaged/live).
Mode per process (the end-of-region fetch poisons donation).
AOT-compiled probe => no compile inside the timed region."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec); spec.loader.exec_module(bench)
import numpy as np, jax
import jax.numpy as jnp
from openrec_tpu.data import InteractionStore, Prefetcher
from openrec_tpu.data.samplers import PairwiseSampler
from openrec_tpu.models import BPR
from openrec_tpu.training import Trainer

mode = sys.argv[1]
K, BATCH, N_CALLS = 400, 1000, int(sys.argv[2]) if len(sys.argv) > 2 else 50
store = InteractionStore(bench.synth_interactions(), bench.USERS, bench.ITEMS, seed=0)
model = BPR(total_users=bench.USERS, total_items=bench.ITEMS, dim_user_embed=50, dim_item_embed=50)
tr = Trainer(model, lr=1e-3, seed=0)
sampler = PairwiseSampler(store, batch_size=K * BATCH, seed=0)
probe = jax.jit(lambda p: jnp.sum(p["user_embed"][0]) + jnp.sum(p["item_bias"][0]))
probe_c = probe.lower(tr.params).compile()    # AOT: no execute, no fetch

it = iter(sampler)
staged = [next(it) for _ in range(min(N_CALLS, 50))]
tr.train_step_multi_flat(staged[0], K)        # compile + warm
tr.train_step_multi_flat(staged[1], K)
jax.block_until_ready(tr.params)              # (enqueue-ack only)
time.sleep(15)                                # drain warmup for real

if mode == "prestaged":
    t0 = time.perf_counter()
    for i in range(N_CALLS):
        tr.train_step_multi_flat(staged[i % len(staged)], K)
    t_issue = time.perf_counter() - t0
    s = float(probe_c(tr.params))
    t_total = time.perf_counter() - t0
else:
    feeder = Prefetcher(sampler, num_workers=2, capacity=4)
    fit = iter(feeder)
    next(fit)
    t0 = time.perf_counter()
    tr.train(total_iter=N_CALLS * K, train_batches=fit, steps_per_call=K,
             feed="flat", defer_metrics=True, verbose=False)
    t_issue = time.perf_counter() - t0
    s = float(probe_c(tr.params))
    t_total = time.perf_counter() - t0
    feeder.stop()
ex = N_CALLS * K * BATCH
print(f"{mode}: calls={N_CALLS} ex={ex/1e6:.0f}M issue={t_issue:.3f}s "
      f"total={t_total:.3f}s TRUE={ex/t_total/1e6:.1f}M ex/s "
      f"(issue-rate {ex/t_issue/1e6:.0f}M) probe={s:.4f}", flush=True)
