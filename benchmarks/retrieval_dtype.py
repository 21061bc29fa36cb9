"""Serving retrieval benchmark: top-k mode x cached-table dtype.

Measures CachedDotProductScorer full-catalog top-100 retrieval at the
reference's two biggest catalog configs (tradesy 165,906 items, amazon
450,166 items; tf1_examples/dataloader.py) along two axes:

- exact `lax.top_k` vs `lax.approx_max_k` (TPU PartialReduce,
  recall_target=0.99) vs method='pallas' (the compiled fused bucket-max
  kernel, ops/bucketed_topk.py): approx/pallas are the production
  recommendations for big catalogs (every returned score exact; see
  docs/PERF_NOTES.md for the tradeoff).
- fp32 vs bf16 cached tables (`serve_dtype`): halves table HBM traffic;
  fp32 accumulation keeps rankings stable outside near-ties.

Two timings per cell:
- latency_ms: one call with HOST-resident ids (includes the id transfer
  + dispatch round trip — what a synchronous request sees; on this
  tunneled chip that RTT dominates).
- pipelined_ms: per-batch time over a stream of 50 in-flight batches with
  DEVICE-resident ids (what a serving loop that pipelines requests sees —
  pure device throughput).

Run alone on the TPU:  python benchmarks/retrieval_dtype.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from openrec_tpu.serving import CachedDotProductScorer


def bench(users, items, dim, batch, k, trials=50):
    rng = np.random.default_rng(0)
    U = (rng.normal(size=(users, dim)) / np.sqrt(dim)).astype(np.float32)
    V = (rng.normal(size=(items, dim)) / np.sqrt(dim)).astype(np.float32)
    b = (rng.normal(size=(items,)) * 0.01).astype(np.float32)
    params = {"U": jnp.asarray(U), "V": jnp.asarray(V), "b": jnp.asarray(b)}
    ids_np = np.arange(batch, dtype=np.int32)
    ids_dev = jnp.asarray(ids_np)
    # Distinct pre-staged id batches for the pipelined loop: identical
    # args per dispatch produce async-dispatch artifacts on this backend
    # (CLAUDE.md / PERF_NOTES) — rotate so every dispatch has fresh input.
    ids_pool = [jnp.asarray((ids_np + off * batch) % users)
                for off in range(8)]

    out = {}
    ref_idx = None
    for dt_name, dt in [("float32", jnp.float32), ("bfloat16", jnp.bfloat16)]:
        sc = CachedDotProductScorer(
            None, users, items,
            extract_user_vecs=lambda p, i: p["U"][i],
            extract_item_vecs=lambda p, i: p["V"][i],
            extract_item_bias=lambda p, i: p["b"][i],
            serve_dtype=dt)
        # (mode, recall_target, label): default 0.99 targets plus the
        # matched >=0.995 pair — approx vs the two-level kernel
        # (r4, VERDICT r3 #6) — THROUGH the serving harness.
        cases = [("exact", 0.99, "exact"), ("approx", 0.99, "approx"),
                 ("pallas", 0.99, "pallas"),
                 ("approx", 0.995, "approx_r995"),
                 ("pallas2", 0.995, "pallas2_r995")]
        for mode, rt, label in cases:
            def run(ids):
                return sc.topk(params, ids, k, method=mode,
                               recall_target=rt)
            vals, idx = run(ids_dev)
            jax.block_until_ready((vals, idx))

            t0 = time.perf_counter()
            vals, idx = run(ids_np)
            jax.block_until_ready((vals, idx))
            latency_ms = (time.perf_counter() - t0) * 1e3

            t0 = time.perf_counter()
            for t in range(trials):
                vals, idx = run(ids_pool[t % len(ids_pool)])
            jax.block_until_ready((vals, idx))
            pipelined_ms = (time.perf_counter() - t0) / trials * 1e3
            # recall check below compares against ids_dev's batch
            vals, idx = run(ids_dev)

            idx = np.asarray(idx)
            if ref_idx is None:
                ref_idx = idx          # fp32 exact = the oracle
            recall = np.mean([
                len(set(ref_idx[i].tolist()) & set(idx[i].tolist())) / k
                for i in range(batch)])
            out[f"{dt_name}_{label}"] = {
                "latency_ms": round(latency_ms, 3),
                "pipelined_ms": round(pipelined_ms, 4),
                "pipelined_qps": round(batch / (pipelined_ms / 1e3)),
                f"top{k}_recall_vs_fp32_exact": round(float(recall), 4),
            }
    return out


if __name__ == "__main__":
    res = {
        "tradesy_165906x64_B256_top100": bench(19243, 165906, 64, 256, 100),
        "amazon_450166x64_B256_top100": bench(99473, 450166, 64, 256, 100),
    }
    print(json.dumps(res, indent=1))
    with open(os.path.join(os.path.dirname(__file__),
                           "retrieval_dtype.json"), "w") as f:
        json.dump(res, f, indent=1)
