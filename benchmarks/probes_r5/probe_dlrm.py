"""Fetch-synced TRUE DLRM staged step time (differencing: run with
argv N_STEPS in {300, 3000} in separate processes)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("dtr", "/root/repo/benchmarks/dlrm_training_run.py")
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
import numpy as np, jax
import jax.numpy as jnp

N_STEPS = int(sys.argv[1])
step_fn, params, opt_state, predict = m._setup()
rng = np.random.default_rng(0)
pool = [{k: jnp.asarray(v) for k, v in m.gen_batch(rng).items()}
        for _ in range(min(N_STEPS, 64))]
probe = jax.jit(lambda p: jnp.sum(p["mlp_top"][0]["w"][0]) + jnp.sum(p["embed_fused"][0]))
probe_c = probe.lower(params).compile()
warm = {k: jnp.asarray(v) for k, v in m.gen_batch(rng).items()}
params, opt_state, loss = step_fn(params, opt_state, warm, jax.random.PRNGKey(0))
jax.block_until_ready(loss)          # enqueue-ack only
time.sleep(20)
key = jax.random.PRNGKey(7)
t0 = time.perf_counter()
for i in range(N_STEPS):
    params, opt_state, loss = step_fn(params, opt_state,
                                      pool[i % len(pool)], key)
t_issue = time.perf_counter() - t0
s = float(probe_c(params))
t_total = time.perf_counter() - t0
print(f"dlrm staged: steps={N_STEPS} issue={t_issue:.3f}s total={t_total:.3f}s "
      f"TRUE={N_STEPS*4096/t_total/1e6:.2f}M ex/s "
      f"({t_total/N_STEPS*1e3:.3f} ms/step raw) probe={s:.4f}", flush=True)
