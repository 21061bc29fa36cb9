"""Same-process A/B: private _dispatch_multi live loop vs public
Trainer.train(feed='flat') — is the public path slower, or is today's
backend just in a degraded band?"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import numpy as np, jax
sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec); spec.loader.exec_module(bench)
from openrec_tpu.data import InteractionStore, Prefetcher
from openrec_tpu.data.samplers import PairwiseSampler
from openrec_tpu.data.pipeline import device_iterator
from openrec_tpu.models import BPR
from openrec_tpu.training import Trainer

K, BATCH, N_CALLS = 400, 1000, 10
store = InteractionStore(bench.synth_interactions(), bench.USERS, bench.ITEMS, seed=0)
model = BPR(total_users=bench.USERS, total_items=bench.ITEMS, dim_user_embed=50, dim_item_embed=50)
tr = Trainer(model, lr=1e-3, seed=0)
sampler = PairwiseSampler(store, batch_size=K * BATCH, seed=0)
feeder = Prefetcher(sampler, num_workers=2, capacity=4)
fit_raw = iter(feeder)
# warm compile
tr.train_step_multi_flat(next(fit_raw), K)
tr.train_step_multi_flat(next(fit_raw), K)
jax.block_until_ready(tr.params)

def reshaped(it_):
    for fb in it_:
        yield {k: np.asarray(v).reshape((K, -1) + np.asarray(v).shape[1:]) for k, v in fb.items()}

res = {"private": [], "public": []}
for trial in range(6):
    mode = "private" if trial % 2 == 0 else "public"
    if mode == "private":
        fit = device_iterator(reshaped(fit_raw), prefetch=2)
        next(fit)
        t0 = time.perf_counter()
        for _ in range(N_CALLS):
            tr._dispatch_multi(next(fit), K)
        jax.block_until_ready(tr.params)
        dt = time.perf_counter() - t0
    else:
        t0 = time.perf_counter()
        tr.train(total_iter=N_CALLS * K, train_batches=fit_raw, steps_per_call=K,
                 feed="flat", defer_metrics=True, verbose=False)
        jax.block_until_ready(tr.params)
        dt = time.perf_counter() - t0
    rate = N_CALLS * K * BATCH / dt
    res[mode].append(rate)
    print(f"trial {trial} {mode}: {rate/1e6:.1f}M ex/s", flush=True)
feeder.stop()
print({k: [round(v/1e6,1) for v in vals] for k, vals in res.items()})
