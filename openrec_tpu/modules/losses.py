"""Loss functions — pure jnp, batch-in scalar-out.

Parity map (reference file:line → function here):
  openrec/tf2/modules/pairwise_log_loss.py:17-33      → pairwise_log_loss
  openrec/tf2/modules/pointwise_mse_loss.py:18-31     → pointwise_mse_loss
  openrec/tf2/recommenders/ucml.py:29-42              → pairwise_eudist_hinge_loss
  legacy interactions/pairwise_hinge.py:73-85         → pairwise_hinge_loss
  legacy interactions/ns_log.py:36-54 (WARP-ish)      → multi_neg_log_loss
  legacy interactions/ns_eu_dist.py:39-56 (WCML)      → multi_neg_eudist_loss
  keras BinaryCrossentropy (tf2 gmf.py:22, dlrm.py:55)→ bce_loss / bce_logits_loss
  keras MeanSquaredError (tf2 dlrm.py:53)             → mse_loss
  legacy interactions/pointwise_mse.py                → pointwise_mse_loss
  tf1 modules/interactions/{mlp,rnn}_softmax.py       → softmax_ce_loss,
                                                        sampled_softmax_loss

Notes on fidelity: reference PairwiseHinge negates the hinge sum
(pairwise_hinge.py:83-84, `- reduce_sum(maximum(...))`), which would reward
violations; we implement the mathematically-intended positive hinge (the form
its own CML/UCML models use, ucml.py:41).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def l2_half(*tensors):
    """tf.nn.l2_loss: sum(t**2)/2, summed over the given tensors."""
    return sum(0.5 * jnp.sum(t ** 2) for t in tensors)


# ---------------------------------------------------------------- pairwise #

def pairwise_log_loss(user_vec, p_item_vec, n_item_vec,
                      p_item_bias=None, n_item_bias=None):
    """BPR: -mean(log_sigmoid(max(pos - neg, -30)))."""
    pos = _dot(user_vec, p_item_vec)
    neg = _dot(user_vec, n_item_vec)
    if p_item_bias is not None:
        pos = pos + jnp.reshape(p_item_bias, pos.shape)
    if n_item_bias is not None:
        neg = neg + jnp.reshape(n_item_bias, neg.shape)
    return -jnp.mean(jax.nn.log_sigmoid(jnp.maximum(pos - neg, -30.0)))


def pairwise_hinge_loss(user_vec, p_item_vec, n_item_vec,
                        p_item_bias=None, n_item_bias=None, margin=1.0):
    """sum(max(margin - pos_score + neg_score, 0)) on dot-product scores."""
    pos = _dot(user_vec, p_item_vec)
    neg = _dot(user_vec, n_item_vec)
    if p_item_bias is not None:
        pos = pos + jnp.reshape(p_item_bias, pos.shape)
    if n_item_bias is not None:
        neg = neg + jnp.reshape(n_item_bias, neg.shape)
    return jnp.sum(jnp.maximum(margin - pos + neg, 0.0))


def pairwise_eudist_hinge_loss(user_vec, p_item_vec, n_item_vec,
                               p_item_bias=None, n_item_bias=None,
                               margin=0.5):
    """CML triplet: scores are -‖u-v‖² (+bias); sum of margin violations."""
    pos = -jnp.sum((user_vec - p_item_vec) ** 2, axis=-1)
    neg = -jnp.sum((user_vec - n_item_vec) ** 2, axis=-1)
    if p_item_bias is not None:
        pos = pos + jnp.reshape(p_item_bias, pos.shape)
    if n_item_bias is not None:
        neg = neg + jnp.reshape(n_item_bias, neg.shape)
    return jnp.sum(jnp.maximum(margin - (pos - neg), 0.0))


# ----------------------------------------------------------- multi-negative #

def _rank_weight(violations, neg_num, total_items):
    """WARP-style rank weight: log(floor(I * viol / K) + 1)."""
    est_rank = jnp.floor(total_items * violations.astype(jnp.float32)
                         / neg_num)
    return jnp.log(est_rank + 1.0)


def multi_neg_log_loss(user_vec, p_item_vec, n_item_vecs,
                       p_item_bias, n_item_biases, total_items):
    """NBPR (legacy ns_log.py:36-54): rank-weighted log loss on the hardest
    of K negatives.

    n_item_vecs: [B, K, D]; n_item_biases: [B, K] or [B, K, 1].
    """
    K = n_item_vecs.shape[1]
    pos = _dot(user_vec, p_item_vec) + jnp.reshape(p_item_bias, (-1,))
    neg = jnp.einsum("bd,bkd->bk", user_vec, n_item_vecs) \
        + jnp.reshape(n_item_biases, (n_item_vecs.shape[0], K))
    diff = pos[:, None] - neg                      # [B, K]
    violations = jnp.sum(diff < 0.0, axis=1)
    w = _rank_weight(violations, K, total_items)
    hardest = jnp.min(diff, axis=1)
    return -jnp.sum(jax.nn.log_sigmoid(jnp.maximum(w * hardest, -30.0)))


def multi_neg_eudist_loss(user_vec, p_item_vec, n_item_vecs,
                          p_item_bias, n_item_biases, total_items,
                          margin=0.5):
    """WCML (legacy ns_eu_dist.py:39-56): rank-weighted hinge on the hardest
    of K negatives under euclidean scores."""
    B, K = n_item_vecs.shape[0], n_item_vecs.shape[1]
    pos = -jnp.sum((user_vec - p_item_vec) ** 2, axis=-1) \
        + jnp.reshape(p_item_bias, (-1,))
    neg = -jnp.sum((user_vec[:, None, :] - n_item_vecs) ** 2, axis=-1) \
        + jnp.reshape(n_item_biases, (B, K))
    scores = jnp.maximum(margin - pos[:, None] + neg, 0.0)   # [B, K]
    violations = jnp.sum(scores > 0.0, axis=1)
    w = _rank_weight(violations, K, total_items)
    return jnp.sum(w * jnp.max(scores, axis=1))


# --------------------------------------------------------------- pointwise #

def pointwise_mse_loss(user_vec, item_vec, item_bias, label,
                       a=1.0, b=1.0, sigmoid=False):
    """WRMF weighted MSE: sum(((a-b)*label + b) * (label - pred)²)."""
    pred = _dot(user_vec, item_vec) + jnp.reshape(item_bias, (-1,))
    if sigmoid:
        pred = jax.nn.sigmoid(pred)
    weight = (a - b) * label + b
    return jnp.sum(weight * (label - pred) ** 2)


def mse_loss(label, pred):
    """Mean squared error (keras MeanSquaredError, mean reduction)."""
    return jnp.mean((label - pred) ** 2)


def bce_loss(label, prob, eps=1e-7):
    """Binary CE on probabilities (keras BinaryCrossentropy defaults:
    probs clipped to [eps, 1-eps], mean reduction)."""
    p = jnp.clip(prob, eps, 1.0 - eps)
    return -jnp.mean(label * jnp.log(p) + (1.0 - label) * jnp.log(1.0 - p))


def bce_logits_loss(label, logit, reduction="mean"):
    """Binary CE from logits, numerically stable
    (sigmoid_cross_entropy_with_logits)."""
    per = jnp.maximum(logit, 0.0) - logit * label \
        + jnp.log1p(jnp.exp(-jnp.abs(logit)))
    return jnp.mean(per) if reduction == "mean" else jnp.sum(per)


# ----------------------------------------------------------------- softmax #

def softmax_ce_loss(logits, labels, reduction="mean"):
    """Sparse softmax cross-entropy over the full catalog (tf1
    mlp_softmax.py:36-40, rnn_softmax.py:22-26)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(per) if reduction == "mean" else jnp.sum(per)


def log_uniform_logprob(ids, range_max: int):
    """log P(id) under TF's log-uniform (Zipf) candidate distribution
    (tf.random.log_uniform_candidate_sampler):
    P(c) = (log(c+2) - log(c+1)) / log(range_max + 1)."""
    c = ids.astype(jnp.float32)
    return (jnp.log(jnp.log1p(1.0 / (c + 1.0)))
            - jnp.log(jnp.log(float(range_max) + 1.0)))


def log_uniform_sample(rng, num_sampled: int, range_max: int):
    """Draw `num_sampled` ids (with replacement) from the log-uniform/Zipf
    distribution via the inverse CDF — the same closed form TF's
    RangeSampler::LogUniform uses: c = floor(exp(u·log(R+1))) - 1."""
    u = jax.random.uniform(rng, (num_sampled,))
    c = jnp.floor(jnp.exp(u * jnp.log(float(range_max) + 1.0))) - 1.0
    return jnp.clip(c.astype(jnp.int32), 0, range_max - 1)


def sampled_softmax_loss(rng, item_table, item_bias, hidden, labels,
                         num_sampled: int,
                         distribution: str = "log_uniform",
                         sampled_values=None):
    """Sampled-softmax (tf1 rnn_softmax.py:24-26 calls TF's sampled
    softmax loss with default candidate sampling): candidates drawn from
    the catalog, true class always included; softmax CE over
    [true | sampled] candidates with log-expected-count correction and
    accidental-hit removal — tf.nn.sampled_softmax_loss semantics.

    distribution: 'log_uniform' (DEFAULT — TF's default
    log_uniform_candidate_sampler assumes ids are sorted by decreasing
    frequency, i.e. a Zipf prior over popularity-ranked catalogs; this is
    what the reference trains with) or 'uniform'. Sampling is with
    replacement (TPU-friendly static shapes); expected counts are
    S·P(class), the exact correction for with-replacement draws (TF's
    unique=True correction 1-(1-p)^tries differs only at O(S·p) —
    negligible for S ≪ I).

    sampled_values: optional (sampled_ids [S], true_expected_count [B],
    sampled_expected_count [S]) override — mirrors the TF argument; used
    to pin candidates for parity tests or custom samplers.

    item_table: [I, D] output embedding; item_bias: [I] or [I, 1];
    hidden: [B, D]; labels: [B] int.
    """
    total_items = item_table.shape[0]
    if sampled_values is not None:
        sampled, true_exp, samp_exp = sampled_values
        sampled = jnp.asarray(sampled, jnp.int32)
        true_logq = jnp.log(jnp.asarray(true_exp, jnp.float32))
        samp_logq = jnp.log(jnp.asarray(samp_exp, jnp.float32))
    elif distribution == "log_uniform":
        sampled = log_uniform_sample(rng, num_sampled, total_items)
        log_s = jnp.log(jnp.asarray(float(num_sampled), jnp.float32))
        true_logq = log_s + log_uniform_logprob(labels, total_items)
        samp_logq = log_s + log_uniform_logprob(sampled, total_items)
    elif distribution == "uniform":
        sampled = jax.random.randint(rng, (num_sampled,), 0, total_items)
        logq = jnp.log(jnp.asarray(num_sampled / total_items, jnp.float32))
        true_logq = samp_logq = logq
    else:
        raise ValueError(f"unknown candidate distribution {distribution!r}")
    bias = jnp.reshape(item_bias, (-1,))

    true_w = jnp.take(item_table, labels, axis=0)             # [B, D]
    true_logit = jnp.sum(hidden * true_w, axis=-1) + bias[labels]
    sampled_w = jnp.take(item_table, sampled, axis=0)         # [S, D]
    sampled_logit = hidden @ sampled_w.T + bias[sampled]      # [B, S]

    true_logit = true_logit - true_logq
    sampled_logit = sampled_logit - jnp.reshape(samp_logq, (1, -1))
    # Remove accidental hits of the true class among candidates.
    hit = sampled[None, :] == labels[:, None]
    sampled_logit = jnp.where(hit, -1e9, sampled_logit)

    logits = jnp.concatenate([true_logit[:, None], sampled_logit], axis=1)
    return softmax_ce_loss(logits, jnp.zeros_like(labels))
