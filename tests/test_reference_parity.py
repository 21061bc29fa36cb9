"""Numerical parity against the actual reference math, executed in
TF/Keras on CPU (the reference's own runtime).

For each core model: build the reference computation exactly as
openrec/tf2 defines it, copy OUR initial parameters into it, feed the SAME
batch, and require identical loss values and identical post-Adam-step
parameters. This pins the loss/gradient/optimizer semantics, not just the
formulas-as-transcribed.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from openrec_tpu.models import BPR, GMF, UCML, WRMF  # noqa: E402
from openrec_tpu.training.optim import lazy_adam  # noqa: E402

USERS, ITEMS, DIM, B = 30, 50, 8, 16
rng = np.random.default_rng(0)
# Ids are drawn WITHOUT replacement: keras 3's sparse Adam accumulates v
# per duplicate slice (Σg_i² instead of (Σg_i)²), a modern-keras quirk the
# TF-2.0-era reference (dedup-summed IndexedSlices) did not have; our
# lazy_adam matches the classic dense-sum semantics, so the comparison is
# done on duplicate-free batches where all three agree.
_pn = rng.choice(ITEMS, size=2 * B, replace=False)
BATCH = {
    "user_id": rng.choice(USERS, size=B, replace=False).astype(np.int32),
    "p_item_id": _pn[:B].astype(np.int32),
    "n_item_id": _pn[B:].astype(np.int32),
    "item_id": rng.choice(ITEMS, size=B, replace=False).astype(np.int32),
    "label": (rng.random(B) > 0.5).astype(np.float32),
}


def _tf_vars(params):
    return {k: tf.Variable(np.asarray(v), dtype=tf.float32)
            for k, v in params.items() if hasattr(v, "shape")}


def _tf_bpr_loss(v, batch):
    u = tf.gather(v["user_embed"], batch["user_id"])
    p = tf.gather(v["item_embed"], batch["p_item_id"])
    n = tf.gather(v["item_embed"], batch["n_item_id"])
    pb = tf.gather(v["item_bias"], batch["p_item_id"])
    nb = tf.gather(v["item_bias"], batch["n_item_id"])
    pos = tf.reduce_sum(u * p, axis=1, keepdims=True) + pb
    neg = tf.reduce_sum(u * n, axis=1, keepdims=True) + nb
    loss = -tf.reduce_mean(
        tf.math.log_sigmoid(tf.maximum(pos - neg, -30.0)))
    l2 = tf.nn.l2_loss(u) + tf.nn.l2_loss(p) + tf.nn.l2_loss(n)
    return loss, l2


def test_bpr_loss_and_adam_step_match_reference():
    model = BPR(total_users=USERS, total_items=ITEMS, dim_user_embed=DIM,
                dim_item_embed=DIM, l2_weight=1.0)
    params = model.init(jax.random.PRNGKey(0))
    total_ours, aux = model.loss(params, {k: jnp.asarray(v)
                                          for k, v in BATCH.items()})

    v = _tf_vars(params)
    with tf.GradientTape() as tape:
        loss, l2 = _tf_bpr_loss(v, BATCH)
        total_tf = loss + l2      # tape.gradient over the (loss, l2) tuple
    np.testing.assert_allclose(float(aux["loss"]), float(loss), rtol=1e-5)
    np.testing.assert_allclose(float(total_ours), float(total_tf),
                               rtol=1e-5)

    # one optimizer step: keras Adam (sparse updates) vs our lazy_adam
    grads = tape.gradient(total_tf, list(v.values()))
    opt = tf.keras.optimizers.Adam(learning_rate=1e-3)
    opt.apply_gradients(zip(grads, v.values()))

    tx = lazy_adam(1e-3)   # eps=1e-7 == keras
    st = tx.init(params)
    g = jax.grad(lambda p: model.loss(p, {k: jnp.asarray(x)
                                          for k, x in BATCH.items()})[0])(
        params)
    upd, st = tx.update(g, st, params)
    ours2 = optax.apply_updates(params, upd)

    for key in ("user_embed", "item_embed", "item_bias"):
        np.testing.assert_allclose(np.asarray(ours2[key]),
                                   v[key].numpy(), rtol=2e-4, atol=2e-6)


def test_wrmf_loss_matches_reference():
    model = WRMF(total_users=USERS, total_items=ITEMS, dim_user_embed=DIM,
                 dim_item_embed=DIM, a=2.0, b=0.3, l2_weight=1.0)
    params = model.init(jax.random.PRNGKey(1))
    total_ours, aux = model.loss(params, {k: jnp.asarray(v)
                                          for k, v in BATCH.items()})
    v = _tf_vars(params)
    u = tf.gather(v["user_embed"], BATCH["user_id"])
    it = tf.gather(v["item_embed"], BATCH["item_id"])
    bias = tf.gather(v["item_bias"], BATCH["item_id"])
    label = tf.constant(BATCH["label"])
    pred = tf.reduce_sum(u * it, axis=1) + tf.reshape(bias, [-1])
    w = (2.0 - 0.3) * label + 0.3
    loss_tf = tf.reduce_sum(w * tf.square(label - pred))
    np.testing.assert_allclose(float(aux["loss"]), float(loss_tf),
                               rtol=1e-5)


def test_ucml_loss_matches_reference():
    model = UCML(total_users=USERS, total_items=ITEMS, dim_user_embed=DIM,
                 dim_item_embed=DIM, margin=0.5)
    params = model.init(jax.random.PRNGKey(2))
    _, aux = model.loss(params, {k: jnp.asarray(v)
                                 for k, v in BATCH.items()})
    v = _tf_vars(params)
    u = tf.gather(v["user_embed"], BATCH["user_id"])
    p = tf.gather(v["item_embed"], BATCH["p_item_id"])
    n = tf.gather(v["item_embed"], BATCH["n_item_id"])
    pb = tf.gather(v["item_bias"], BATCH["p_item_id"])
    nb = tf.gather(v["item_bias"], BATCH["n_item_id"])
    l2p = tf.reduce_sum(tf.square(u - p), axis=-1, keepdims=True)
    l2n = tf.reduce_sum(tf.square(u - n), axis=-1, keepdims=True)
    diff = ((-l2p) + pb) - ((-l2n) + nb)
    loss_tf = tf.reduce_sum(tf.maximum(0.5 - diff, 0))
    np.testing.assert_allclose(float(aux["loss"]), float(loss_tf),
                               rtol=1e-5)


def test_gmf_loss_matches_reference():
    model = GMF(total_users=USERS, total_items=ITEMS, dim_user_embed=DIM,
                dim_item_embed=DIM)
    params = model.init(jax.random.PRNGKey(3))
    _, aux = model.loss(params, {k: jnp.asarray(v)
                                 for k, v in BATCH.items()})
    v = _tf_vars({k: params[k] for k in
                  ("user_embed", "item_embed", "item_bias")})
    w = tf.constant(np.asarray(params["mlp"][0]["w"]))
    u = tf.gather(v["user_embed"], BATCH["user_id"])
    it = tf.gather(v["item_embed"], BATCH["item_id"])
    bias = tf.gather(v["item_bias"], BATCH["item_id"])
    logit = tf.reshape(tf.matmul(u * it, w) + bias, [-1])
    bce = tf.keras.losses.BinaryCrossentropy(from_logits=True)
    loss_tf = bce(y_true=BATCH["label"], y_pred=logit)
    np.testing.assert_allclose(float(aux["loss"]), float(loss_tf),
                               rtol=1e-4)


def test_censor_matches_reference():
    from openrec_tpu.modules.embedding import censor_norm
    table = np.asarray(rng.normal(size=(20, DIM)) * 2, np.float32)
    ids = np.array([1, 5, 5, 9], np.int32)
    ours = np.asarray(censor_norm(jnp.asarray(table), jnp.asarray(ids)))

    var = tf.Variable(table)
    unique_ids, _ = tf.unique(ids)
    gathered = tf.gather(var, unique_ids)
    norm = tf.norm(gathered, axis=1, keepdims=True)
    var.scatter_nd_update(tf.expand_dims(unique_ids, 1),
                          gathered / tf.maximum(norm, 0.1))
    np.testing.assert_allclose(ours, var.numpy(), rtol=1e-5)


def test_dlrm_loss_and_adam_step_match_reference():
    """DLRM (openrec/tf2/recommenders/dlrm.py:63-100) restated in TF with
    OUR initial parameters: per-table embeddings, bottom MLP (relu out),
    pairwise dot interaction over [sparse..., dense_emb], top MLP
    (sigmoid out), keras BinaryCrossentropy, keras Adam.

    The interaction uses the INTENDED pair values (symmetric Gram at
    i<j): the reference's own mask composition selects entries its
    LinearOperatorLowerTriangular already zeroed (a reference bug — see
    modules/interactions.py docstring), so transcribing it literally
    would compare against an all-zero interaction.
    """
    from openrec_tpu.models import DLRM

    ln_emb, m_spa, dim_dense, Bd = (20, 30, 25), 4, 5, 12
    model = DLRM(m_spa=m_spa, ln_emb=ln_emb, ln_bot=(6, 4),
                 ln_top=(8, 1), dim_dense=dim_dense, loss_func="bce")
    params = model.init(jax.random.PRNGKey(3))
    r = np.random.default_rng(3)
    batch = {
        "dense_features": r.normal(size=(Bd, dim_dense)).astype(
            np.float32),
        # without replacement per table (keras-3 sparse-Adam dup quirk)
        "sparse_features": np.stack(
            [r.choice(c, size=Bd, replace=False) for c in ln_emb],
            axis=1).astype(np.int32),
        "label": (r.random(Bd) > 0.5).astype(np.float32),
    }
    total_ours, _ = model.loss(params, {k: jnp.asarray(v)
                                        for k, v in batch.items()})

    tables = [tf.Variable(np.asarray(t), dtype=tf.float32)
              for t in params["embed_tables"]]
    bot = [(tf.Variable(np.asarray(l["w"])), tf.Variable(np.asarray(l["b"])))
           for l in params["mlp_bot"]]
    top = [(tf.Variable(np.asarray(l["w"])), tf.Variable(np.asarray(l["b"])))
           for l in params["mlp_top"]]
    variables = tables + [v for w, b in bot + top for v in (w, b)]
    bce = tf.keras.losses.BinaryCrossentropy()
    F = len(ln_emb) + 1
    iu = np.stack(np.triu_indices(F, k=1), axis=1)

    def forward(dense, sparse):
        embs = [tf.gather(tables[j], sparse[:, j])
                for j in range(len(ln_emb))]
        x = dense
        for k, (w, b) in enumerate(bot):
            x = tf.matmul(x, w) + b
            x = tf.nn.relu(x)
        feats = tf.stack(embs + [x], axis=1)
        dots = tf.matmul(feats, feats, transpose_b=True)
        inter = tf.transpose(tf.gather_nd(
            tf.transpose(dots, [1, 2, 0]), iu))
        y = tf.concat([x, inter], axis=1)
        for k, (w, b) in enumerate(top):
            y = tf.matmul(y, w) + b
            y = tf.nn.sigmoid(y) if k == len(top) - 1 else tf.nn.relu(y)
        return tf.reshape(y, [-1])

    with tf.GradientTape() as tape:
        loss_tf = bce(y_true=tf.constant(batch["label"]),
                      y_pred=forward(tf.constant(batch["dense_features"]),
                                     tf.constant(batch["sparse_features"])))
    np.testing.assert_allclose(float(total_ours), float(loss_tf),
                               rtol=1e-5)

    grads = tape.gradient(loss_tf, variables)
    opt = tf.keras.optimizers.Adam(learning_rate=1e-3)
    opt.apply_gradients(zip(grads, variables))

    tx = lazy_adam(1e-3)
    st = tx.init(params)
    g = jax.grad(lambda p: model.loss(p, {k: jnp.asarray(v)
                                          for k, v in batch.items()})[0])(
        params)
    upd, st = tx.update(g, st, params)
    ours2 = optax.apply_updates(params, upd)

    np.testing.assert_allclose(np.asarray(ours2["embed_tables"][0]),
                               tables[0].numpy(), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ours2["mlp_top"][0]["w"]),
                               top[0][0].numpy(), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ours2["mlp_bot"][-1]["b"]),
                               bot[-1][1].numpy(), rtol=2e-4, atol=2e-6)


def test_sampled_softmax_matches_tf_sampled_softmax_loss():
    """tf.nn.sampled_softmax_loss parity (the reference's sampled-softmax
    path, tf1 interactions/rnn_softmax.py:24-26): pin the candidate set +
    expected counts via sampled_values on BOTH sides and require
    identical loss AND identical gradients w.r.t. weights/bias/inputs."""
    from openrec_tpu.modules.losses import (log_uniform_logprob,
                                            log_uniform_sample,
                                            sampled_softmax_loss)

    I, D, B, S = 200, 12, 16, 32
    r = np.random.default_rng(11)
    w = r.normal(size=(I, D)).astype(np.float32) * 0.3
    b = r.normal(size=(I,)).astype(np.float32) * 0.1
    h = r.normal(size=(B, D)).astype(np.float32)
    labels = r.integers(0, I, B).astype(np.int32)

    sampled = np.array(log_uniform_sample(jax.random.PRNGKey(3), S, I))
    # include a guaranteed accidental hit so that path is exercised too
    sampled[0] = labels[0]
    p_true = np.exp(np.asarray(log_uniform_logprob(jnp.asarray(labels), I)))
    p_samp = np.exp(np.asarray(log_uniform_logprob(jnp.asarray(sampled), I)))
    true_exp, samp_exp = S * p_true, S * p_samp

    # ---- TF side (explicit sampled_values → fully deterministic)
    wv = tf.Variable(w); bv = tf.Variable(b); hv = tf.Variable(h)
    sv = (tf.constant(sampled.astype(np.int64)),
          tf.constant(true_exp.reshape(B, 1)),
          tf.constant(samp_exp))
    with tf.GradientTape() as tape:
        per = tf.nn.sampled_softmax_loss(
            weights=wv, biases=bv,
            labels=tf.constant(labels.astype(np.int64)[:, None]),
            inputs=hv, num_sampled=S, num_classes=I,
            sampled_values=sv, remove_accidental_hits=True)
        loss_tf = tf.reduce_mean(per)
    g_tf = tape.gradient(loss_tf, [wv, bv, hv])
    g_w = tf.convert_to_tensor(g_tf[0]).numpy()
    g_b = tf.convert_to_tensor(g_tf[1]).numpy()
    g_h = g_tf[2].numpy()

    # ---- ours (same pinned sampled_values)
    def ours(params):
        return sampled_softmax_loss(
            None, params["w"], params["b"], params["h"],
            jnp.asarray(labels), S,
            sampled_values=(jnp.asarray(sampled), jnp.asarray(true_exp),
                            jnp.asarray(samp_exp)))

    params = {"w": jnp.asarray(w), "b": jnp.asarray(b), "h": jnp.asarray(h)}
    loss_ours, g_ours = jax.value_and_grad(ours)(params)

    np.testing.assert_allclose(float(loss_ours), float(loss_tf), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_ours["w"]), g_w,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_ours["b"]), g_b,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_ours["h"]), g_h,
                               rtol=1e-4, atol=1e-6)


def test_log_uniform_sampler_matches_tf_distribution():
    """Our Zipf probability formula must equal TF's
    log_uniform_candidate_sampler expected counts (unique=False:
    E[count] = S·P(c)), and our inverse-CDF sampler's empirical
    frequencies must match that distribution."""
    from openrec_tpu.modules.losses import (log_uniform_logprob,
                                            log_uniform_sample)

    I, S = 1000, 25
    classes = np.arange(0, I, 7, dtype=np.int64)
    _, true_exp, _ = tf.random.log_uniform_candidate_sampler(
        true_classes=classes[:, None], num_true=1, num_sampled=S,
        unique=False, range_max=I, seed=1)
    p_tf = true_exp.numpy().reshape(-1) / S
    p_ours = np.exp(np.asarray(
        log_uniform_logprob(jnp.asarray(classes), I)))
    np.testing.assert_allclose(p_ours, p_tf, rtol=1e-5)

    # empirical check of the sampler itself (with-replacement draws)
    n = 200_000
    draws = np.asarray(log_uniform_sample(jax.random.PRNGKey(0), n, I))
    assert draws.min() >= 0 and draws.max() < I
    # head classes carry most mass — compare their empirical frequency
    for c in [0, 1, 2, 5, 10, 50]:
        p = np.exp(float(log_uniform_logprob(jnp.asarray(c), I)))
        emp = float(np.mean(draws == c))
        se = np.sqrt(p * (1 - p) / n)
        assert abs(emp - p) < 6 * se + 1e-4, (c, emp, p)
