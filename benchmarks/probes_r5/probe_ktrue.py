"""Fetch-synced GROUND-TRUTH rate for the device-sampled fused path.

The timed region ends with jax.device_get of a scalar data-dependent on
the final params — the only barrier this backend provably honors — and
the region is sized to >= ~2B examples so the one fetch RTT is noise.
No fetch happens before/inside the region (donation poisoning). One K
per process. Also reports dispatch-issue time (the thing
block_until_ready-based loops may actually have measured).
"""
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

K = int(sys.argv[1])
TARGET = int(float(sys.argv[2] if len(sys.argv) > 2 else 2e9))
BATCH = 1000
N_CALLS = max(3, TARGET // (K * BATCH))
store = InteractionStore(bench.synth_interactions(), bench.USERS, bench.ITEMS, seed=0)
model = BPR(total_users=bench.USERS, total_items=bench.ITEMS, dim_user_embed=50, dim_item_embed=50)
tr = Trainer(model, lr=1e-3, seed=0)
sampler = DevicePairwiseSampler(store, batch_size=BATCH)
tr.train_steps_device(sampler, K)   # compile + warm (1 call)
jax.block_until_ready(tr.params)
time.sleep(20)                      # drain warmup without fetching
probe = jax.jit(lambda p: jnp.sum(p["user_embed"][0]) + jnp.sum(p["item_bias"][0]))

t0 = time.perf_counter()
for _ in range(N_CALLS):
    tr.train_steps_device(sampler, K)
t_issue = time.perf_counter() - t0
s = float(probe(tr.params))         # data-dependent fetch = true barrier
t_total = time.perf_counter() - t0
ex = N_CALLS * K * BATCH
print(f"K={K} calls={N_CALLS} examples={ex/1e9:.2f}B "
      f"issue={t_issue:.3f}s total={t_total:.3f}s "
      f"TRUE={ex/t_total/1e6:.0f}M ex/s "
      f"(issue-rate would claim {ex/t_issue/1e6:.0f}M) probe={s:.4f}",
      flush=True)
