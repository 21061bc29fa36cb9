"""Catalog-sharded full-catalog eval: per-shard rank counting + psum.

Completes the distributed serving/eval story (SURVEY.md §5.7): when the
item catalog (and its embedding table) is row-sharded over the 'model'
axis, evaluation must not gather a replicated [B, I] score row — at the
amazon config (450k items) that gather would dominate eval time and HBM.
Instead each shard counts, for every positive item of every user, how many
of ITS items outrank it; a psum over the 'model' axis yields exact global
ranks, from which AUC/Recall@K/NDCG@K/Precision@K follow
(metrics_from_counts) with semantics identical to the dense path
(reference openrec/tf2/metrics/ranking_metrics.py:8-69).

Communication per eval batch: 2 psums of [B, P] ints + 1 of [B] — O(B·P),
independent of catalog size, riding ICI.

No reference counterpart (the reference is single-device; SURVEY.md §2.9).
Inputs come from EvaluationSampler(device_masks=True): -1-padded
pos_ids/excl_ids id lists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from openrec_tpu.metrics.ranking import metrics_from_counts
from openrec_tpu.parallel.mesh import MODEL_AXIS


def _local_masks(ids, lo, width, batch):
    local = ids - lo
    in_range = (ids >= 0) & (local >= 0) & (local < width)
    safe = jnp.where(in_range, local, 0)
    rows = jnp.broadcast_to(jnp.arange(batch)[:, None], ids.shape)
    mask = jnp.zeros((batch, width), bool).at[rows, safe].max(in_range)
    return mask, in_range, safe


def _shard_counts(s, lo, total_items, pos_ids, excl_ids, axis):
    """Per-shard sufficient statistics; exact after psum over `axis`.

    s: [B, C] this shard's raw scores for catalog rows [lo, lo+C).
    Returns (ranks [B,P], leq [B,P], num_eval [B], s_pos [B,P] — all
    psummed, plus valid_pos [B,P])."""
    B, C = s.shape
    gid_ok = (lo + jnp.arange(C)) < total_items
    pos_m, pos_in, pos_safe = _local_masks(pos_ids, lo, C, B)
    excl_m, _, _ = _local_masks(excl_ids, lo, C, B)
    excl_m = excl_m | ~gid_ok[None, :]

    # Mask inside the exp (exp(-inf) = 0 exactly): excluded/padded rows may
    # hold arbitrary values; exp(big)·0 would be inf·0 = NaN.
    p = jnp.exp(jnp.where(excl_m, -jnp.inf, s))

    # Each positive's score lives on exactly one shard; mask + psum routes
    # it everywhere. The TRANSFORMED score is gathered from p (not
    # recomputed from s) so a positive that is also excluded keeps its
    # zeroed transform — exactly the dense path's semantics.
    rows = jnp.broadcast_to(jnp.arange(B)[:, None], pos_ids.shape)
    s_pos = jax.lax.psum(s[rows, pos_safe] * pos_in, axis)
    p_pos = jax.lax.psum(p[rows, pos_safe] * pos_in, axis)
    p_sorted = jnp.sort(p, axis=1)
    gt = C - jax.vmap(
        lambda a, q: jnp.searchsorted(a, q, side="right"))(p_sorted, p_pos)

    eval_m = ~(pos_m | excl_m)
    s_eval = jnp.sort(jnp.where(eval_m, s, jnp.inf), axis=1)
    le = jax.vmap(
        lambda a, q: jnp.searchsorted(a, q, side="right"))(s_eval, s_pos)

    ranks = jax.lax.psum(gt, axis)
    leq = jax.lax.psum(le, axis)
    num_eval = jax.lax.psum(jnp.sum(eval_m, axis=1), axis)
    return ranks, leq, num_eval


def sharded_eval_metrics(scores, pos_ids, excl_ids, total_items: int,
                         mesh, axis: str = MODEL_AXIS, at=(100,)):
    """Metrics over an item-sharded score matrix.

    scores: [B, I_padded] sharded P(batch_axes…, axis) — e.g. the output
    of parallel.embedding.sharded_scores; pos_ids/excl_ids: [B, P]/[B, E]
    -1-padded, replicated over `axis`. Padded catalog rows
    (id ≥ total_items) are ignored. Returns {"AUC": [B], "Recall"/"NDCG"/
    "Precision": [B, K]} replicated over `axis`.
    """
    at_arr = jnp.asarray(at, dtype=jnp.int32)
    shard_cols = scores.shape[-1] // mesh.shape[axis]

    def _kernel(s, pos, excl):
        lo = jax.lax.axis_index(axis) * shard_cols
        ranks, leq, num_eval = _shard_counts(
            s, lo, total_items, pos, excl, axis)
        return metrics_from_counts(ranks, leq, pos >= 0, num_eval, at_arr)

    other = tuple(a for a in mesh.axis_names if a != axis)
    batch_spec = P(*other) if other else P()
    score_spec = P(*(other + (axis,))) if other else P(None, axis)
    return jax.shard_map(
        _kernel, mesh=mesh,
        in_specs=(score_spec, batch_spec, batch_spec),
        out_specs=batch_spec, check_vma=False)(scores, pos_ids, excl_ids)


def sharded_dot_eval_metrics(user_vecs, table, bias, pos_ids, excl_ids,
                             total_items: int, mesh,
                             axis: str = MODEL_AXIS, at=(100,)):
    """Fused scoring + metrics for `u·Vᵀ+b` models with a row-sharded
    catalog: each shard computes its [B, I/m] score block in-register and
    reduces it to O(B·P) counts — the full score row never exists, even
    sharded. This is the production eval path for row-sharded tables.

    user_vecs: [B, D] replicated over `axis` (may shard over batch axes);
    table: [I_padded, D] P(axis, None); bias: [I_padded] or [I_padded, 1]
    P(axis[, None]) or None.
    """
    at_arr = jnp.asarray(at, dtype=jnp.int32)
    num_shards = mesh.shape[axis]
    shard_rows = table.shape[0] // num_shards
    if bias is None:
        bias = jnp.zeros((table.shape[0],), table.dtype)
    bias_spec = P(axis, None) if jnp.ndim(bias) == 2 else P(axis)

    def _kernel(u, v_shard, b_shard, pos, excl):
        lo = jax.lax.axis_index(axis) * shard_rows
        s = u @ v_shard.T + jnp.reshape(b_shard, (1, -1))
        ranks, leq, num_eval = _shard_counts(
            s, lo, total_items, pos, excl, axis)
        return metrics_from_counts(ranks, leq, pos >= 0, num_eval, at_arr)

    other = tuple(a for a in mesh.axis_names if a != axis)
    batch_spec = P(*other) if other else P()
    return jax.shard_map(
        _kernel, mesh=mesh,
        in_specs=(batch_spec, P(axis, None), bias_spec, batch_spec,
                  batch_spec),
        out_specs=batch_spec, check_vma=False)(
        user_vecs, table, bias, pos_ids, excl_ids)
