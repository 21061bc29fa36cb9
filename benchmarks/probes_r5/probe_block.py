"""Does block_until_ready honor the barrier at shallow queue depth?
20 calls, block after EACH; then one data-dependent fetch. If per-call
block times are ~RTT+compute and the final fetch adds ~nothing, block
is honest at depth 1; if per-call ~0.3ms and the fetch takes seconds,
block lies even at depth 1."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec); spec.loader.exec_module(bench)
import numpy as np, jax
import jax.numpy as jnp
from openrec_tpu.data import InteractionStore
from openrec_tpu.data.device_sampler import DevicePairwiseSampler
from openrec_tpu.models import BPR
from openrec_tpu.training import Trainer

K, BATCH = 400, 1000
store = InteractionStore(bench.synth_interactions(), bench.USERS, bench.ITEMS, seed=0)
model = BPR(total_users=bench.USERS, total_items=bench.ITEMS, dim_user_embed=50, dim_item_embed=50)
tr = Trainer(model, lr=1e-3, seed=0)
sampler = DevicePairwiseSampler(store, batch_size=BATCH)
tr.train_steps_device(sampler, K)
jax.block_until_ready(tr.params)
time.sleep(10)
per_call = []
t0 = time.perf_counter()
for _ in range(20):
    t1 = time.perf_counter()
    tr.train_steps_device(sampler, K)
    jax.block_until_ready(tr.params)
    per_call.append(time.perf_counter() - t1)
t_blocked = time.perf_counter() - t0
probe = jax.jit(lambda p: jnp.sum(p["user_embed"][0]))
t2 = time.perf_counter()
s = float(probe(tr.params))
t_fetch = time.perf_counter() - t2
print("per-call block ms:", [round(x*1e3, 2) for x in per_call])
print(f"20 blocked calls: {t_blocked:.3f}s; final fetch: {t_fetch:.3f}s; "
      f"rate-if-block-honest {20*K*BATCH/t_blocked/1e6:.0f}M ex/s", flush=True)
