"""Chunked full-catalog eval for giant catalogs on one device.

The dense path (metrics/ranking.py) materializes [B, I] score rows plus
boolean masks and sorts them — at the amazon config's 450k-item catalog
(SURVEY.md §5.7; reference tf1_examples/dataloader.py:7) that is hundreds
of MB per eval batch. This module computes the SAME metrics (semantics of
openrec/tf2/metrics/ranking_metrics.py:8-69 — exp·¬excl transform,
rank-above counting, eval-set ≤ counting for AUC) while only ever holding
one [B, chunk] score block:

  1. Positive scores are gathered directly ([B, P] with P = max positives
     per user — tiny).
  2. A lax.scan over catalog chunks accumulates, per positive: how many
     items score strictly above it (transformed), and how many eval items
     score ≤ it (raw) — the sufficient statistics for all four metrics
     (metrics_from_counts).

Works for any model whose serving scores are `u·Vᵀ + b` (the
CachedDotProductScorer family — reference FastDotProductServer's
assumption, fast_dot_product_server.py:57-150). Inputs are padded id
lists (EvaluationSampler device_masks=True), so host→device transfer
stays O(B·P), not O(B·I).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from openrec_tpu.metrics.ranking import metrics_from_counts


def _local_masks(ids, lo, width, batch):
    """Scatter padded id lists into [B, width] bools for ids in
    [lo, lo+width)."""
    local = ids - lo
    in_range = (ids >= 0) & (local >= 0) & (local < width)
    safe = jnp.where(in_range, local, 0)
    rows = jnp.broadcast_to(jnp.arange(batch)[:, None], ids.shape)
    return jnp.zeros((batch, width), bool).at[rows, safe].max(
        in_range)


@partial(jax.jit, static_argnames=("total_items", "chunk", "at"))
def chunked_dot_eval_metrics(user_vecs, table, bias, pos_ids, excl_ids,
                             total_items: int, chunk: int = 16384,
                             at=(100,)):
    """AUC/Recall@K/NDCG@K/Precision@K for scores u·Vᵀ+b, O(B·chunk) memory.

    user_vecs: [B, D]; table: [I', D] with I' ≥ total_items (padded rows
    ignored); bias: [I'] or [I', 1] or None; pos_ids/excl_ids: [B, P]/[B, E]
    int32, -1-padded. Returns the same dict as
    make_parallel_eval_step / Trainer eval.
    """
    B, D = user_vecs.shape
    at_arr = jnp.asarray(at, dtype=jnp.int32)
    if bias is None:
        bias = jnp.zeros((table.shape[0],), table.dtype)
    bias = jnp.reshape(bias, (-1,))

    # Pad the catalog to a whole number of chunks; padded rows are masked
    # out by `gid < total_items` below.
    n_chunks = -(-total_items // chunk)
    pad_to = n_chunks * chunk
    table = jnp.pad(table[:pad_to], ((0, max(0, pad_to - table.shape[0])),
                                     (0, 0)))
    bias = jnp.pad(bias[:pad_to], (0, max(0, pad_to - bias.shape[0])))

    valid_pos = pos_ids >= 0
    safe_pos = jnp.where(valid_pos, pos_ids, 0)
    # Positive scores, gathered directly. A positive that ALSO appears in
    # the exclusion list has its transformed score zeroed by the dense
    # path's exp·¬excl — replicate that via an id-list membership test.
    s_pos = jnp.einsum("bd,bpd->bp", user_vecs,
                       table[safe_pos]) + bias[safe_pos]
    pos_excl = jnp.any(
        (pos_ids[:, :, None] == excl_ids[:, None, :])
        & (excl_ids[:, None, :] >= 0), axis=-1)
    p_pos = jnp.where(pos_excl, 0.0, jnp.exp(s_pos))

    table_chunks = table.reshape(n_chunks, chunk, D)
    bias_chunks = bias.reshape(n_chunks, chunk)
    offsets = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

    def body(carry, xs):
        ranks, leq, num_eval = carry
        v_chunk, b_chunk, lo = xs
        s = user_vecs @ v_chunk.T + b_chunk[None, :]          # [B, C]
        gid_ok = (lo + jnp.arange(chunk)) < total_items
        pos_m = _local_masks(pos_ids, lo, chunk, B)
        excl_m = _local_masks(excl_ids, lo, chunk, B) | ~gid_ok[None, :]

        # rank_above: transformed scores over ALL (real) items. Mask inside
        # the exp (exp(-inf) = 0 exactly) — padded rows may hold arbitrary
        # values, and exp(big)·0 would be inf·0 = NaN.
        p = jnp.exp(jnp.where(excl_m, -jnp.inf, s))
        p_sorted = jnp.sort(p, axis=1)
        gt = chunk - jax.vmap(
            lambda a, q: jnp.searchsorted(a, q, side="right"))(p_sorted,
                                                               p_pos)
        # AUC: eval items (neither pos nor excl) with raw score ≤ s_pos.
        eval_m = ~(pos_m | excl_m)
        s_eval = jnp.sort(jnp.where(eval_m, s, jnp.inf), axis=1)
        le = jax.vmap(
            lambda a, q: jnp.searchsorted(a, q, side="right"))(s_eval,
                                                               s_pos)
        return (ranks + gt, leq + le,
                num_eval + jnp.sum(eval_m, axis=1)), None

    init = (jnp.zeros_like(safe_pos), jnp.zeros_like(safe_pos),
            jnp.zeros((B,), jnp.int32))
    (ranks, leq, num_eval), _ = jax.lax.scan(
        body, init, (table_chunks, bias_chunks, offsets))
    return metrics_from_counts(ranks, leq, valid_pos, num_eval, at_arr)
