"""Module-level unit tests: MLP options, fusions, RNN cells, SDAE,
interactions, censoring."""

import numpy as np
import jax
import jax.numpy as jnp

from openrec_tpu.modules import (
    GRU, LSTM, MLP, SDAE, average_fusion, censor_max_norm, censor_norm,
    concat_fusion, embedding_init, embedding_lookup, masked_mean_pool,
    second_order_interaction)


def test_mlp_forward_matches_numpy():
    mlp = MLP(units=(8, 3), activation="relu", out_activation=None)
    params = mlp.init(jax.random.PRNGKey(0), in_dim=5)
    x = np.random.default_rng(0).normal(size=(4, 5)).astype(np.float32)
    got = np.asarray(mlp.apply(params, jnp.asarray(x)))
    h = np.maximum(x @ np.asarray(params[0]["w"])
                   + np.asarray(params[0]["b"]), 0)
    want = h @ np.asarray(params[1]["w"]) + np.asarray(params[1]["b"])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mlp_dropout_only_in_train():
    mlp = MLP(units=(16, 4), dropout_rate=0.5)
    params = mlp.init(jax.random.PRNGKey(0), in_dim=8)
    x = jnp.ones((32, 8))
    out_eval = mlp.apply(params, x)                       # no rng: off
    out_eval2 = mlp.apply(params, x, train=False)
    np.testing.assert_array_equal(np.asarray(out_eval),
                                  np.asarray(out_eval2))
    out_tr1 = mlp.apply(params, x, train=True,
                        rng=jax.random.PRNGKey(1))
    out_tr2 = mlp.apply(params, x, train=True,
                        rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(out_tr1), np.asarray(out_tr2))


def test_average_fusion_matches_legacy_formula():
    a = jnp.ones((2, 3))
    b = 3 * jnp.ones((2, 3))
    # legacy Average: weight * (a+b) / len  → 2*(1+3)/2 = 4
    np.testing.assert_allclose(np.asarray(average_fusion([a, b],
                                                         weight=2.0)),
                               4.0)
    got = concat_fusion([a, b])
    assert got.shape == (2, 6)


def test_censor_norm_and_max_norm():
    table = jnp.asarray(np.random.default_rng(0).normal(
        size=(10, 4)).astype(np.float32) * 3)
    out = censor_norm(table, jnp.asarray([0, 3]))
    norms = np.linalg.norm(np.asarray(out), axis=1)
    np.testing.assert_allclose(norms[[0, 3]], 1.0, rtol=1e-5)
    # untouched rows unchanged
    np.testing.assert_array_equal(np.asarray(out)[1], np.asarray(table)[1])

    out2 = censor_max_norm(table, jnp.asarray([1]), max_norm=0.5)
    assert np.linalg.norm(np.asarray(out2)[1]) <= 0.5 + 1e-5
    # rows already inside the ball are unscaled
    small = jnp.zeros((3, 4)).at[0, 0].set(0.1)
    out3 = censor_max_norm(small, jnp.asarray([0]), max_norm=1.0)
    np.testing.assert_allclose(np.asarray(out3)[0, 0], 0.1, rtol=1e-6)


def test_second_order_interaction_oracle():
    rng = np.random.default_rng(0)
    feats = [rng.normal(size=(3, 4)).astype(np.float32) for _ in range(4)]
    got = np.asarray(second_order_interaction(feats))
    # oracle: all pairwise dots i<j
    want = []
    for b in range(3):
        row = []
        for i in range(4):
            for j in range(i + 1, 4):
                row.append(feats[i][b] @ feats[j][b])
        want.append(row)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5)
    got_self = second_order_interaction(feats, self_interaction=True)
    assert got_self.shape == (3, 10)


def test_masked_mean_pool():
    seq = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 3, 4))
    lens = jnp.asarray([1, 3])
    out = np.asarray(masked_mean_pool(seq, lens))
    np.testing.assert_allclose(out[0], np.asarray(seq)[0, 0], rtol=1e-6)
    np.testing.assert_allclose(out[1], np.asarray(seq)[1].mean(0),
                               rtol=1e-6)


def test_gru_respects_seq_len():
    gru = GRU(dim_in=4, dim_hidden=6)
    params = gru.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    seq = jnp.asarray(rng.normal(size=(2, 5, 4)).astype(np.float32))
    # user 0 has length 2: states after step 2 must be ignored
    h = gru.apply(params, seq, jnp.asarray([2, 5]))
    seq_mut = seq.at[0, 3:].set(99.0)     # garbage in padded region
    h2 = gru.apply(params, seq_mut, jnp.asarray([2, 5]))
    np.testing.assert_allclose(np.asarray(h), np.asarray(h2), rtol=1e-6)


def test_lstm_shapes_and_masking():
    lstm = LSTM(dim_in=3, dim_hidden=5)
    params = lstm.init(jax.random.PRNGKey(0))
    seq = jnp.asarray(np.random.default_rng(1).normal(
        size=(4, 6, 3)).astype(np.float32))
    h = lstm.apply(params, seq, jnp.asarray([6, 1, 3, 6]))
    assert h.shape == (4, 5)
    assert np.isfinite(np.asarray(h)).all()


def test_sdae_reconstruction_improves_with_training():
    import optax
    sdae = SDAE(in_dim=12, dims=(8, 4), l2_reconst=1.0)
    params = sdae.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(16, 12)).astype(np.float32))
    tx = optax.adam(1e-2)
    st = tx.init(params)

    def loss_fn(p):
        loss, code = sdae.reconstruction_loss(p, x)
        return loss
    first = float(loss_fn(params))
    for _ in range(60):
        g = jax.grad(loss_fn)(params)
        upd, st = tx.update(g, st, params)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, upd)
    assert float(loss_fn(params)) < first * 0.5
    code = sdae.encode(params, x)
    assert code.shape == (16, 4)


def test_embedding_init_and_lookup():
    t = embedding_init(jax.random.PRNGKey(0), 20, 8)
    assert float(jnp.max(jnp.abs(t))) <= 0.05
    z = embedding_init(jax.random.PRNGKey(0), 20, 8, zero_init=True)
    assert float(jnp.max(jnp.abs(z))) == 0.0
    rows = embedding_lookup(t, jnp.asarray([0, 19, 19]))
    assert rows.shape == (3, 8)
