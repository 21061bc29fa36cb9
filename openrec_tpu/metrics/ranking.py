"""On-device full-catalog ranking metrics.

Semantics parity with openrec/tf2/metrics/ranking_metrics.py:8-69 (AUC,
Recall@K, NDCG@K over pos_mask/excl_mask), plus the tf1-only evaluators
Precision@K and MSE (openrec/tf1/utils/evaluators/{precision,mse}.py).

Re-design: the reference runs a Python tf.map_fn per user with an O(P·I)
comparison loop; here each user is O(I log I) — one sort + searchsorted —
and users are vmapped into a single fused device program. Matches:

  AUC:   eval = ¬(pos ∨ excl); per user
         Σ_p |{e ∈ eval : s_e ≤ s_p}| / (|pos|·|eval|)
  Recall/NDCG/Precision: s ← exp(s)·¬excl;
         rank_above(p) = |{j : s_j > s_p}| over ALL items;
         Recall@k = |{p : rank_above(p) < k}| / |pos|
         NDCG@k   = Σ_p 1/log2(rank_above(p)+2) · [rank_above(p) < k]
         (unnormalized DCG — exactly what the reference computes)
         Precision@k = |{p : rank_above(p) < k}| / k
"""

from __future__ import annotations

import jax
import jax.numpy as jnp



def _counts_leq_sorted(sorted_vals, queries):
    """#entries in sorted_vals ≤ each query (right bisect)."""
    return jnp.searchsorted(sorted_vals, queries, side="right")


def _counts_gt(vals, queries):
    """#entries in vals strictly greater than each query."""
    sorted_vals = jnp.sort(vals)
    n = vals.shape[0]
    return n - jnp.searchsorted(sorted_vals, queries, side="right")


def _auc_user(pos_mask, pred, excl_mask):
    eval_mask = jnp.logical_not(jnp.logical_or(pos_mask, excl_mask))
    num_pos = jnp.sum(pos_mask)
    num_eval = jnp.sum(eval_mask)
    # Sort eval scores; non-eval entries pushed to +inf so a right-bisect of
    # any finite positive score never counts them.
    eval_sorted = jnp.sort(jnp.where(eval_mask, pred, jnp.inf))
    counts = _counts_leq_sorted(eval_sorted, pred)          # per item
    total = jnp.sum(jnp.where(pos_mask, counts, 0))
    denom = (num_pos * num_eval).astype(jnp.float32)
    return jnp.where(denom > 0, total.astype(jnp.float32) / denom, 0.0)


def AUC(pos_mask, pred, excl_mask):
    return jax.vmap(_auc_user)(pos_mask, pred, excl_mask)


def _rank_above(pos_mask, pred, excl_mask):
    """rank_above per item under the reference's exp·mask transform."""
    p = jnp.exp(pred) * jnp.logical_not(excl_mask).astype(pred.dtype)
    return _counts_gt(p, p)


def _recall_user(pos_mask, pred, excl_mask, at):
    ranks = _rank_above(pos_mask, pred, excl_mask)
    num_pos = jnp.maximum(jnp.sum(pos_mask), 1)
    hits = (ranks[None, :] < at[:, None]) & pos_mask[None, :]
    return jnp.sum(hits, axis=1).astype(jnp.float32) / num_pos


def Recall(pos_mask, pred, excl_mask, at=(100,)):
    at_arr = jnp.asarray(at, dtype=jnp.int32)
    return jax.vmap(_recall_user, in_axes=(0, 0, 0, None))(
        pos_mask, pred, excl_mask, at_arr)


def _ndcg_user(pos_mask, pred, excl_mask, at):
    ranks = _rank_above(pos_mask, pred, excl_mask).astype(jnp.float32)
    log_recip = 1.0 / (jnp.log(ranks + 2.0) / jnp.log(2.0))
    within = (ranks[None, :] < at[:, None].astype(jnp.float32)) \
        & pos_mask[None, :]
    return jnp.sum(jnp.where(within, log_recip[None, :], 0.0), axis=1)


def NDCG(pos_mask, pred, excl_mask, at=(100,)):
    at_arr = jnp.asarray(at, dtype=jnp.int32)
    return jax.vmap(_ndcg_user, in_axes=(0, 0, 0, None))(
        pos_mask, pred, excl_mask, at_arr)


def _precision_user(pos_mask, pred, excl_mask, at):
    ranks = _rank_above(pos_mask, pred, excl_mask)
    hits = (ranks[None, :] < at[:, None]) & pos_mask[None, :]
    return jnp.sum(hits, axis=1).astype(jnp.float32) \
        / at.astype(jnp.float32)


def Precision(pos_mask, pred, excl_mask, at=(100,)):
    at_arr = jnp.asarray(at, dtype=jnp.int32)
    return jax.vmap(_precision_user, in_axes=(0, 0, 0, None))(
        pos_mask, pred, excl_mask, at_arr)


def metrics_from_counts(ranks, leq_counts, valid_pos, num_eval, at):
    """Assemble the metric dict from per-positive rank counts.

    The sharded (parallel/metrics.py) and chunked (metrics/chunked.py)
    catalog-scale eval paths both reduce to these sufficient statistics —
    per positive item: rank_above under the exp·¬excl transform (`ranks`,
    [B, P]) and #eval items with score ≤ it (`leq_counts`, [B, P]) — from
    which AUC/Recall/NDCG/Precision follow exactly as in the dense
    implementations above (same ≤/< conventions).

    valid_pos: [B, P] bool (False for -1 pads); num_eval: [B];
    at: int32 [K]. Returns {"AUC": [B], "Recall"/"NDCG"/"Precision":
    [B, K]}.
    """
    ranks = ranks.astype(jnp.int32)
    num_pos = jnp.sum(valid_pos, axis=1)
    hits = (ranks[:, None, :] < at[None, :, None]) & valid_pos[:, None, :]

    recall = jnp.sum(hits, axis=2).astype(jnp.float32) \
        / jnp.maximum(num_pos, 1)[:, None]
    precision = jnp.sum(hits, axis=2).astype(jnp.float32) \
        / at.astype(jnp.float32)[None, :]
    log_recip = 1.0 / (jnp.log(ranks.astype(jnp.float32) + 2.0)
                       / jnp.log(2.0))
    ndcg = jnp.sum(jnp.where(hits, log_recip[:, None, :], 0.0), axis=2)

    total = jnp.sum(jnp.where(valid_pos, leq_counts, 0), axis=1)
    denom = (num_pos * num_eval).astype(jnp.float32)
    auc = jnp.where(denom > 0, total.astype(jnp.float32) / denom, 0.0)
    return {"AUC": auc, "Recall": recall, "NDCG": ndcg,
            "Precision": precision}


def MSE(pred, labels):
    """Per-example squared error (tf1 evaluators/mse.py:10-12)."""
    return (pred - labels) ** 2


def ids_to_masks(pos_ids, excl_ids, total_items):
    """Scatter padded id lists (-1 = pad) into [B, I] boolean masks on
    device — the transfer-light eval path (EvaluationSampler
    device_masks=True)."""
    B = pos_ids.shape[0]
    rows = jnp.arange(B)[:, None]

    def scatter(ids):
        safe = jnp.where(ids >= 0, ids, total_items)   # pads → OOB
        return jnp.zeros((B, total_items), bool).at[
            jnp.broadcast_to(rows, ids.shape), safe].set(True, mode="drop")

    return scatter(pos_ids), scatter(excl_ids)
