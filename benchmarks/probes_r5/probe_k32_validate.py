"""K=32000 validation: 3.2B-example timed region + post-timing loss
fetch to prove the device actually trained (not an async artifact)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec); spec.loader.exec_module(bench)
import numpy as np, jax
from openrec_tpu.data import InteractionStore
from openrec_tpu.data.device_sampler import DevicePairwiseSampler
from openrec_tpu.models import BPR
from openrec_tpu.training import Trainer

BATCH, K, N_CALLS = 1000, 32000, 100
store = InteractionStore(bench.synth_interactions(), bench.USERS, bench.ITEMS, seed=0)
model = BPR(total_users=bench.USERS, total_items=bench.ITEMS, dim_user_embed=50, dim_item_embed=50)
tr = Trainer(model, lr=1e-3, seed=0)
sampler = DevicePairwiseSampler(store, batch_size=BATCH)
first_losses = tr.train_steps_device(sampler, K)   # compile+warm; keep for trajectory
tr.train_steps_device(sampler, K)
jax.block_until_ready(tr.params)
t0 = time.perf_counter()
losses = None
for _ in range(N_CALLS):
    losses = tr.train_steps_device(sampler, K)
jax.block_until_ready(tr.params)
dt = time.perf_counter() - t0
rate = N_CALLS * K * BATCH / dt
print(f"K={K}, {N_CALLS} calls, {dt:.3f}s -> {rate/1e9:.2f}B ex/s", flush=True)
# post-timing fetches (poisoning irrelevant now)
fl = np.asarray(first_losses); ll = np.asarray(losses)
print("first-call losses: start %.4f end %.4f" % (fl[:50].mean(), fl[-50:].mean()))
print("last-call  losses: start %.4f end %.4f" % (ll[:50].mean(), ll[-50:].mean()))
assert np.isfinite(ll).all()
assert ll.mean() < fl[:50].mean(), "no learning signal?"
print("global_step:", tr.global_step)
