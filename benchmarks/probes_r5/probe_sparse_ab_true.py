"""Fetch-synced flat-vs-hash dedup A/B for the DLRM sparse step
(PERF_NOTES r5: the enqueue-paced brackets were uncertain). One
(mode, N) per process; difference N=600 vs N=100 per mode to remove the
per-process constant. Expectation on this backend: indistinguishable —
the 6.5GB state copy (~62ms) swamps any dedup difference.

  python benchmarks/probes_r5/probe_sparse_ab_true.py <flat|hash> <N>
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location(
    "dtr", "/root/repo/benchmarks/dlrm_training_run.py")
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
import numpy as np, jax
import jax.numpy as jnp

MODE, N = sys.argv[1], int(sys.argv[2])
os.environ["OPENREC_DLRM_SPARSE_MODE"] = MODE
m.SPARSE_MODE = MODE
step_fn, params, opt_state, _ = m._setup()
rng = np.random.default_rng(0)
pool = [{k: jnp.asarray(v) for k, v in m.gen_batch(rng).items()}
        for _ in range(32)]
probe = jax.jit(lambda p: jnp.sum(p["mlp_top"][0]["w"][0])
                + jnp.sum(p["embed_fused"][0]))
probe_c = probe.lower(params).compile()
warm = {k: jnp.asarray(v) for k, v in m.gen_batch(rng).items()}
params, opt_state, loss = step_fn(params, opt_state, warm,
                                  jax.random.PRNGKey(0))
jax.block_until_ready(loss)
time.sleep(20)
key = jax.random.PRNGKey(7)
t0 = time.perf_counter()
for i in range(N):
    params, opt_state, loss = step_fn(params, opt_state,
                                      pool[i % 32], key)
float(probe_c(params))
t_total = time.perf_counter() - t0
print(f"{MODE} N={N} total={t_total:.3f}s raw={t_total/N*1e3:.2f} ms/step",
      flush=True)
