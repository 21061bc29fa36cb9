"""Serving accelerators.

Parity: FastDotProductServer (reference openrec/tf1/
fast_dot_product_server.py:57-150) — for any model whose serving scores
reduce to u·v + b, cache all user/item embeddings once after training and
serve via a single matmul; a dirty flag re-caches after updates.

In JAX the elaborate placeholder-assign machinery of the reference
(_FastDotProductRecommender, :8-54) collapses to: materialize (U, V, b) with
user-provided extractor functions, keep them on device, and jit the matmul
(plus top-k). Batched extraction still exists for models whose item vectors
are produced by feature MLPs over huge catalogs.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


class CachedDotProductScorer:
    """Cache embeddings once; serve full-catalog scores / top-k by matmul.

    extract_user_vecs(params, user_ids) -> [B, D]
    extract_item_vecs(params, item_ids) -> [B, D]
    extract_item_bias(params, item_ids) -> [B] or [B, 1] (optional)
    """

    def __init__(self, model, total_users: int, total_items: int,
                 extract_user_vecs: Callable,
                 extract_item_vecs: Callable,
                 extract_item_bias: Optional[Callable] = None,
                 extract_batch_size: int = 8192,
                 serve_dtype=jnp.float32):
        """serve_dtype: dtype of the cached embedding tables. Full-catalog
        scoring is HBM-bandwidth-bound (the matmul reads the whole item
        table per query batch), so `jnp.bfloat16` halves the bytes per
        query and ~doubles serving throughput; scores accumulate in fp32
        (preferred_element_type) and the bias is added in fp32, so ranking
        differences vs fp32 caches are confined to near-ties (measured:
        top-100 overlap >0.99 on trained-scale embeddings)."""
        self.model = model
        self.total_users = total_users
        self.total_items = total_items
        self._extract_user = jax.jit(extract_user_vecs)
        self._extract_item = jax.jit(extract_item_vecs)
        self._extract_bias = (jax.jit(extract_item_bias)
                              if extract_item_bias else None)
        self._bs = extract_batch_size
        self._serve_dtype = jnp.dtype(serve_dtype)
        self._dirty = True
        self._dirty32 = True
        self._U = self._V = self._b = None
        self._U32 = self._V32 = None

        # The user-row gather lives INSIDE the jitted programs: one XLA
        # dispatch per query batch instead of gather-then-score (per-call
        # dispatch latency, not FLOPs, dominates small-batch serving).
        @jax.jit
        def _scores(U, ids, V, b):
            rows = U[ids].astype(V.dtype)
            s = jnp.dot(rows, V.T, preferred_element_type=jnp.float32)
            return s + b

        from functools import partial

        @partial(jax.jit, static_argnums=(4, 5, 6))
        def _topk(U, ids, V, b, k, method, recall_target):
            if method in ("pallas", "pallas2"):
                # Fused Pallas bucket-max kernel (ops/bucketed_topk.py):
                # the [B, I] scores never reach HBM. 'pallas2' keeps the
                # top-2 per bucket (squared collision loss) — the
                # recall>=0.995 serving route. Interpret mode off TPU
                # keeps the path testable everywhere.
                from openrec_tpu.ops.bucketed_topk import pallas_score_topk
                rows = U[ids].astype(V.dtype)
                return pallas_score_topk(
                    rows, V, b, k, recall_target=recall_target,
                    per_bucket=2 if method == "pallas2" else 1,
                    interpret=jax.default_backend() != "tpu")
            rows = U[ids].astype(V.dtype)
            s = jnp.dot(rows, V.T, preferred_element_type=jnp.float32) + b
            if method == "approx":
                # TPU PartialReduce: ~7x faster than exact lax.top_k at
                # big catalogs (ops.topk_approx; docs/PERF_NOTES.md).
                return jax.lax.approx_max_k(
                    s, k, recall_target=recall_target or 0.99)
            return jax.lax.top_k(s, k)

        self._scores_fn = _scores
        self._topk_fn = _topk

    def mark_dirty(self):
        """Call after any training that changes params (the reference flips
        `_model_updated` inside its trainer, fast_dot_product_server.py:
        132-141)."""
        self._dirty = True
        self._dirty32 = True

    def _extract_all(self, extract, total, params):
        # Device-side concat: NO device→host fetch anywhere in the cache
        # path. On the axon backend a single fetch permanently disables
        # buffer donation for every later jitted call in the process
        # (docs/PERF_NOTES.md "donation poisoning"), so a scorer used
        # inside Trainer.evaluate(defer_metrics=True) must stay on device.
        outs = []
        for lo in range(0, total, self._bs):
            ids = jnp.arange(lo, min(lo + self._bs, total))
            outs.append(extract(params, ids))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def cache(self, params):
        dt = self._serve_dtype
        self._U = self._extract_all(self._extract_user, self.total_users,
                                    params).astype(dt)
        self._V = self._extract_all(self._extract_item, self.total_items,
                                    params).astype(dt)
        if self._extract_bias is not None:
            b = self._extract_all(self._extract_bias, self.total_items,
                                  params)
            self._b = jnp.reshape(b, (-1,)).astype(jnp.float32)
        else:
            self._b = jnp.zeros((self.total_items,), jnp.float32)
        self._dirty = False

    def serve(self, params, user_ids):
        """Full-catalog scores [B, total_items] (always fp32)."""
        if self._dirty:
            self.cache(params)
        return self._scores_fn(self._U, jnp.asarray(user_ids), self._V,
                               self._b)

    def topk(self, params, user_ids, k: int = 100, approx: bool = False,
             recall_target: float = 0.99, method: Optional[str] = None):
        """(scores, item_ids) of the top-k items per user.

        method: 'exact' (default; `lax.top_k`), 'approx'
        (`lax.approx_max_k`/TPU PartialReduce — ~7× faster than exact at
        165k+ catalogs, ≥ recall_target expected recall, every returned
        score/id exact), 'pallas' (the fused bucket-max kernel,
        ops/bucketed_topk.py — the scores never reach HBM; same guarantee
        class as 'approx'), or 'pallas2' (two-level kernel, top-2 per
        bucket — squared collision loss). Measured rule
        (docs/PERF_NOTES.md; grid + fetch-synced validation in
        benchmarks/pallas_topk_sweep.json): for recall floors ≥ 0.995
        prefer method='pallas2' with recall_target=0.995 when k·B is
        large (k ≥ 100 with batch ≥ 256, or k ≥ 500 at any batch) —
        its in-device compute advantage grows with k·B (recall ≥
        approx's in every grid cell; fetch-synced 1.46× at B=1024,
        k=500); keep 'approx' for k ≤ 10 (huge bucket ratios lose to
        PartialReduce) and at batch 64 with k=100 (sub-256 batches pad
        to the kernel's 256-row user block). NB on this project's
        tunneled backend a ~35ms per-execution floor flattens all
        methods at moderate k·B (PERF_NOTES r5); the grid's 2-10×
        block-timed ratios are the in-device shape a local runtime
        would see. `approx=True` is the backward-compatible spelling
        of method='approx'."""
        if method is None:
            method = "approx" if approx else "exact"
        if self._dirty:
            self.cache(params)
        return self._topk_fn(self._U, jnp.asarray(user_ids), self._V,
                             self._b, k, method, recall_target)

    def eval_metrics(self, params, user_ids, pos_ids, excl_ids,
                     at=(50, 100), chunk: int = 16384):
        """AUC/Recall@K/NDCG@K/Precision@K in O(B·chunk) memory — the
        giant-catalog eval path (metrics/chunked.py): the [B, total_items]
        score row is never materialized, so eval batches stay cheap at the
        amazon config's 450k items. pos_ids/excl_ids are -1-padded id
        lists (EvaluationSampler device_masks=True batches)."""
        from openrec_tpu.metrics.chunked import chunked_dot_eval_metrics
        if self._dirty:
            self.cache(params)
        # Metrics rank from FRESH fp32 extractions, not an upcast of the
        # serve caches: with serve_dtype=bfloat16 the caches were already
        # rounded, and upcasting cannot recover that precision — eval must
        # match reference/fp32 semantics exactly.
        if self._serve_dtype == jnp.float32:
            U32, V32 = self._U, self._V
        else:
            if self._dirty32 or self._U32 is None:
                self._U32 = self._extract_all(
                    self._extract_user, self.total_users, params)
                self._V32 = self._extract_all(
                    self._extract_item, self.total_items, params)
                self._dirty32 = False
            U32, V32 = self._U32, self._V32
        return chunked_dot_eval_metrics(
            U32[jnp.asarray(user_ids)],
            V32, self._b,
            jnp.asarray(pos_ids), jnp.asarray(excl_ids),
            total_items=self.total_items, chunk=chunk, at=tuple(at))
