"""Losses vs closed-form numpy oracles (reference formulas)."""

import numpy as np
import jax.numpy as jnp
import pytest

from openrec_tpu.modules import losses

rng = np.random.default_rng(0)
B, D, K = 8, 6, 4
u = rng.normal(size=(B, D)).astype(np.float32)
p = rng.normal(size=(B, D)).astype(np.float32)
n = rng.normal(size=(B, D)).astype(np.float32)
pb = rng.normal(size=(B, 1)).astype(np.float32)
nb = rng.normal(size=(B, 1)).astype(np.float32)
nmulti = rng.normal(size=(B, K, D)).astype(np.float32)
nbmulti = rng.normal(size=(B, K, 1)).astype(np.float32)
label = (rng.random(B) > 0.5).astype(np.float32)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_pairwise_log_loss():
    pos = (u * p).sum(1) + pb[:, 0]
    neg = (u * n).sum(1) + nb[:, 0]
    want = -np.mean(np.log(sigmoid(np.maximum(pos - neg, -30.0))))
    got = losses.pairwise_log_loss(u, p, n, pb, nb)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pairwise_eudist_hinge():
    pos = -((u - p) ** 2).sum(1) + pb[:, 0]
    neg = -((u - n) ** 2).sum(1) + nb[:, 0]
    want = np.maximum(0.5 - (pos - neg), 0).sum()
    got = losses.pairwise_eudist_hinge_loss(u, p, n, pb, nb, margin=0.5)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pairwise_hinge():
    pos = (u * p).sum(1) + pb[:, 0]
    neg = (u * n).sum(1) + nb[:, 0]
    want = np.maximum(1.0 - pos + neg, 0).sum()
    got = losses.pairwise_hinge_loss(u, p, n, pb, nb, margin=1.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pointwise_mse():
    pred = (u * p).sum(1) + pb[:, 0]
    w = (2.0 - 0.5) * label + 0.5
    want = (w * (label - pred) ** 2).sum()
    got = losses.pointwise_mse_loss(u, p, pb, label, a=2.0, b=0.5)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pointwise_mse_sigmoid():
    pred = sigmoid((u * p).sum(1) + pb[:, 0])
    want = ((label - pred) ** 2).sum()
    got = losses.pointwise_mse_loss(u, p, pb, label, sigmoid=True)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_logits_matches_probability_form():
    logit = rng.normal(size=B).astype(np.float32)
    want = -np.mean(label * np.log(sigmoid(logit))
                    + (1 - label) * np.log(1 - sigmoid(logit)))
    got = losses.bce_logits_loss(label, logit)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_prob_clipping():
    prob = np.array([0.0, 1.0, 0.5], dtype=np.float32)
    lab = np.array([0.0, 1.0, 1.0], dtype=np.float32)
    got = losses.bce_loss(lab, prob)
    assert np.isfinite(got)


def test_multi_neg_log_loss():
    I = 1000
    pos = (u * p).sum(1) + pb[:, 0]
    neg = np.einsum("bd,bkd->bk", u, nmulti) + nbmulti[:, :, 0]
    diff = pos[:, None] - neg
    viol = (diff < 0).sum(1)
    w = np.log(np.floor(I * viol.astype(np.float32) / K) + 1.0)
    want = -np.sum(np.log(sigmoid(np.maximum(w * diff.min(1), -30.0))))
    got = losses.multi_neg_log_loss(u, p, nmulti, pb, nbmulti, I)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_multi_neg_eudist_loss():
    I = 1000
    pos = -((u - p) ** 2).sum(1) + pb[:, 0]
    neg = -((u[:, None, :] - nmulti) ** 2).sum(2) + nbmulti[:, :, 0]
    scores = np.maximum(0.5 - pos[:, None] + neg, 0)
    viol = (scores > 0).sum(1)
    w = np.log(np.floor(I * viol.astype(np.float32) / K) + 1.0)
    want = np.sum(w * scores.max(1))
    got = losses.multi_neg_eudist_loss(u, p, nmulti, pb, nbmulti, I,
                                       margin=0.5)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_softmax_ce():
    logits = rng.normal(size=(B, 10)).astype(np.float32)
    labels = rng.integers(0, 10, size=B)
    ex = np.exp(logits - logits.max(1, keepdims=True))
    logp = np.log(ex / ex.sum(1, keepdims=True))
    want = -np.mean(logp[np.arange(B), labels])
    got = losses.softmax_ce_loss(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sampled_softmax_runs_and_decreases_with_fit():
    import jax
    table = jnp.asarray(rng.normal(size=(50, D)).astype(np.float32))
    bias = jnp.zeros((50,))
    labels = jnp.asarray(rng.integers(0, 50, size=B))
    hidden_good = table[labels] * 10.0   # aligned with true classes
    hidden_bad = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    good = losses.sampled_softmax_loss(key, table, bias, hidden_good,
                                       labels, num_sampled=20)
    bad = losses.sampled_softmax_loss(key, table, bias, hidden_bad,
                                      labels, num_sampled=20)
    assert good < bad
