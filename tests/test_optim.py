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


def test_lazy_adam_matches_dense_adam_when_all_rows_touched():
    # With every row touched each step, lazy == dense Adam (same eps).
    tx_lazy = lazy_adam(0.01, eps=1e-8)
    tx_dense = optax.adam(0.01, eps=1e-8, eps_root=0.0)
    params = {"t": jnp.ones((4, 3))}
    s_l, s_d = tx_lazy.init(params), tx_dense.init(params)
    p_l = p_d = params
    key = jax.random.PRNGKey(0)
    for i in range(5):
        key, sub = jax.random.split(key)
        g = {"t": jax.random.normal(sub, (4, 3))}
        u_l, s_l = tx_lazy.update(g, s_l, p_l)
        u_d, s_d = tx_dense.update(g, s_d, p_d)
        p_l = optax.apply_updates(p_l, u_l)
        p_d = optax.apply_updates(p_d, u_d)
    np.testing.assert_allclose(np.asarray(p_l["t"]), np.asarray(p_d["t"]),
                               rtol=1e-5)


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
