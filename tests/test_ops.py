"""Pallas kernels vs XLA oracles (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openrec_tpu.ops.topk import fused_score_topk, topk_xla


@pytest.mark.parametrize("B,I,D,k", [(4, 1000, 16, 10), (12, 300, 8, 50)])
def test_fused_score_topk_matches_xla(B, I, D, k):
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(I,)).astype(np.float32))
    want_v, want_i = topk_xla(u, v, b, k)
    got_v, got_i = fused_score_topk(u, v, b, k, user_block=8,
                                    item_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-5, atol=1e-5)
    # ids may differ on ties; compare scores at chosen ids
    scores = np.asarray(u @ v.T + b[None, :])
    np.testing.assert_allclose(
        np.take_along_axis(scores, np.asarray(got_i), axis=1),
        np.asarray(want_v), rtol=1e-5, atol=1e-5)


def test_fused_topk_never_returns_padding():
    rng = np.random.default_rng(1)
    B, I, D, k = 4, 130, 8, 130   # I not tile-aligned; k == I
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
    b = jnp.zeros((I,))
    got_v, got_i = fused_score_topk(u, v, b, k, user_block=8,
                                    item_tile=128, interpret=True)
    assert np.asarray(got_i).max() < I
    assert np.isfinite(np.asarray(got_v)).all()


def test_topk_approx_high_recall():
    """approx_max_k path: every returned (score, id) is exact; set recall
    vs exact top-k must meet the target (on CPU the lowering is exact or
    near-exact — assert a conservative floor)."""
    from openrec_tpu.ops import topk_approx
    rng = np.random.default_rng(2)
    B, I, D, k = 16, 4096, 16, 64
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(I,)).astype(np.float32))
    ev, ei = topk_xla(u, v, b, k)
    av, ai = topk_approx(u, v, b, k, recall_target=0.99)
    scores = np.asarray(u @ v.T + b[None, :])
    np.testing.assert_allclose(
        np.take_along_axis(scores, np.asarray(ai), axis=1),
        np.asarray(av), rtol=1e-5, atol=1e-5)
    ei, ai = np.asarray(ei), np.asarray(ai)
    recall = np.mean([len(set(ei[i]) & set(ai[i])) / k for i in range(B)])
    assert recall >= 0.95, recall
