"""lazy_adam / lazy_adagrad: rows-touched semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openrec_tpu.training.optim import lazy_adagrad, lazy_adam


def test_lazy_adam_touched_rows_only():
    tx = lazy_adam(0.1)
    params = {"table": jnp.ones((10, 4)), "dense": jnp.ones((3,))}
    state = tx.init(params)
    grads = {"table": jnp.zeros((10, 4)).at[2].set(1.0).at[5].set(-1.0),
             "dense": jnp.ones((3,))}
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    table = np.asarray(new["table"])
    # untouched rows unchanged
    for r in range(10):
        if r in (2, 5):
            assert not np.allclose(table[r], 1.0)
        else:
            np.testing.assert_array_equal(table[r], 1.0)
    # dense leaf gets a dense update
    assert not np.allclose(np.asarray(new["dense"]), 1.0)


def test_lazy_adam_moments_frozen_for_untouched():
    tx = lazy_adam(0.1)
    params = {"t": jnp.zeros((4, 2))}
    state = tx.init(params)
    g1 = {"t": jnp.zeros((4, 2)).at[1].set(1.0)}
    _, state = tx.update(g1, state, params)
    mu_after_1 = np.asarray(state.mu["t"])
    g0 = {"t": jnp.zeros((4, 2))}
    _, state = tx.update(g0, state, params)
    # no rows touched → moments identical (no decay drift)
    np.testing.assert_array_equal(np.asarray(state.mu["t"]), mu_after_1)


def test_lazy_adam_matches_keras_adam_formula():
    # With every row touched, lazy == a numpy transcription of keras Adam
    # (bias correction folded into alpha, eps outside the corrected sqrt).
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-7
    tx = lazy_adam(lr, b1=b1, b2=b2, eps=eps)
    params = {"t": jnp.ones((4, 3))}
    st = tx.init(params)
    p = params
    m = np.zeros((4, 3))
    v = np.zeros((4, 3))
    p_ref = np.ones((4, 3))
    key = jax.random.PRNGKey(0)
    for i in range(1, 6):
        key, sub = jax.random.split(key)
        g = jax.random.normal(sub, (4, 3))
        u, st = tx.update({"t": g}, st, p)
        p = optax.apply_updates(p, u)
        gn = np.asarray(g)
        m = b1 * m + (1 - b1) * gn
        v = b2 * v + (1 - b2) * gn * gn
        alpha = lr * np.sqrt(1 - b2 ** i) / (1 - b1 ** i)
        p_ref = p_ref - alpha * m / (np.sqrt(v) + eps)
    np.testing.assert_allclose(np.asarray(p["t"]), p_ref, rtol=1e-5)


def test_lazy_adagrad_touched_rows_only():
    tx = lazy_adagrad(0.1)
    params = {"table": jnp.ones((6, 2))}
    state = tx.init(params)
    grads = {"table": jnp.zeros((6, 2)).at[0].set(2.0)}
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    table = np.asarray(new["table"])
    np.testing.assert_array_equal(table[1:], 1.0)
    assert not np.allclose(table[0], 1.0)


def test_keras_adam_trajectory_matches_tf_over_sparse_schedule():
    """keras_adam must track a real keras Adam trajectory ROW FOR ROW
    over a multi-step schedule where rows enter and leave the batch
    (duplicate-free slices, where TF<=2.x and keras 3 agree): TF decays
    m,v and applies -a*m/(sqrt(v)+eps) DENSELY, so previously-touched
    rows keep moving while absent. lazy_adam intentionally does NOT
    (second assert documents the divergence)."""
    import pytest
    tf = pytest.importorskip("tensorflow")
    from openrec_tpu.training.optim import keras_adam

    R, D, lr = 8, 3, 0.01
    rng = np.random.default_rng(0)
    init = rng.normal(size=(R, D)).astype(np.float32)
    V = tf.Variable(init)
    opt = tf.keras.optimizers.Adam(lr)

    tx = keras_adam(lr)
    ltx = lazy_adam(lr)
    params = {"t": jnp.asarray(init)}
    lparams = {"t": jnp.asarray(init)}
    state, lstate = tx.init(params), ltx.init(lparams)

    schedule = [([0, 1, 2], rng.normal(size=(3, D))),
                ([2, 3], rng.normal(size=(2, D))),
                ([5], rng.normal(size=(1, D))),
                ([0, 3, 5, 7], rng.normal(size=(4, D))),
                ([1], np.zeros((1, D)))]        # zero-grad present row
    for idx, g in schedule:
        gs = np.asarray(g, np.float32)
        opt.apply_gradients([(tf.IndexedSlices(
            tf.constant(gs), tf.constant(np.asarray(idx, np.int64)),
            dense_shape=tf.constant([R, D], np.int64)), V)])
        gd = {"t": jnp.zeros((R, D)).at[jnp.asarray(idx)].add(
            jnp.asarray(gs))}
        upd, state = tx.update(gd, state, params)
        params = optax.apply_updates(params, upd)
        lupd, lstate = ltx.update(gd, lstate, lparams)
        lparams = optax.apply_updates(lparams, lupd)

    np.testing.assert_allclose(np.asarray(params["t"]), V.numpy(),
                               rtol=1e-5, atol=1e-6)
    # row 4 was never touched: all three agree it never moves
    np.testing.assert_array_equal(np.asarray(params["t"])[4], init[4])
    # row 1 was touched at step 1 then absent/zero-grad: keras keeps
    # moving it by residual momentum, lazy_adam freezes it — they MUST
    # differ (this is the trajectory semantics the round-2 docs had
    # backwards).
    assert not np.allclose(np.asarray(lparams["t"])[1],
                           np.asarray(params["t"])[1], atol=1e-6)
