"""Quality parity: our models vs the reference's TF/Keras math, trained on
the SAME synthetic dataset, fed by the SAME sampler streams, with the SAME
hyperparameters, evaluated with the SAME (reference-semantics) metrics.

Covers every BASELINE.md parity target trainable without external data:
BPR, WRMF, UCML (incl. post-step censoring), GMF. Per-step math identity is
separately pinned by tests/test_reference_parity.py; this records that the
*converged* metrics agree too.

Writes benchmarks/quality_parity.json:
  {model: {"ours": {...}, "reference": {...}}, ...}

Run on CPU (forced below) so both frameworks share the hardware and the
benchmark never contends for the TPU chip.

Dataset: planted low-rank preferences (tests/conftest.make_low_rank recipe
scaled up) — a learnable structure where converged Recall/AUC is a
meaningful equality target, unlike uniform-random interactions.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# Force CPU regardless of the environment's TPU sitecustomize.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

USERS, ITEMS, RANK, PER_USER = 200, 800, 8, 30
DIM, BATCH, ITERS, LR = 32, 512, 4000, 0.001
AT = (50, 100)
SEED = 0


def make_low_rank():
    rng = np.random.default_rng(SEED)
    U = rng.normal(size=(USERS, RANK))
    V = rng.normal(size=(ITEMS, RANK))
    top = np.argsort(-(U @ V.T), axis=1)[:, :PER_USER]
    train_rows, test_rows = [], []
    for u in range(USERS):
        items = top[u].copy()
        rng.shuffle(items)
        half = PER_USER // 2
        train_rows += [(u, i) for i in items[:half]]
        test_rows += [(u, i) for i in items[half:]]
    dtype = [("user_id", np.int32), ("item_id", np.int32)]
    return (np.array(train_rows, dtype=dtype),
            np.array(test_rows, dtype=dtype))


def eval_ours_style(score_rows, train_store, test_store):
    """Reference tf2 metric semantics via our on-device implementations."""
    from openrec_tpu.data.samplers import EvaluationSampler
    from openrec_tpu.metrics import AUC, DictMean, Recall

    sampler = EvaluationSampler(test_store, batch_size=64,
                                excl_stores=[train_store])
    acc = DictMean({"AUC": [], "Recall": [len(AT)]})
    for batch in sampler:
        pred = score_rows(batch["user_id"])
        out = {"AUC": AUC(batch["pos_mask"], pred, batch["excl_mask"]),
               "Recall": Recall(batch["pos_mask"], pred,
                                batch["excl_mask"], at=AT)}
        acc.update_state(jax.device_get(out), valid=batch["valid"])
    res = acc.result()
    return {"AUC": float(res["AUC"]),
            **{f"Recall@{k}": float(res["Recall"][i])
               for i, k in enumerate(AT)}}


def _datasets(train_data, test_data):
    from openrec_tpu.data import Dataset
    return (Dataset(train_data, USERS, ITEMS, seed=SEED),
            Dataset(test_data, USERS, ITEMS, seed=SEED))


def _batches(train_ds, kind):
    if kind == "pairwise":
        return iter(train_ds.pairwise(batch_size=BATCH))
    return iter(train_ds.stratified_pointwise(batch_size=BATCH,
                                              pos_ratio=0.5))


# ---------------------------------------------------------------- ours

def run_ours(model, sampler_kind, train_data, test_data):
    import jax.numpy as jnp
    from openrec_tpu.training import Trainer

    train_ds, test_ds = _datasets(train_data, test_data)
    tr = Trainer(model, lr=LR, seed=SEED)
    batches = _batches(train_ds, sampler_kind)
    for _ in range(ITERS):
        tr.train_step(next(batches))

    def score_rows(users):
        return np.asarray(
            tr._score(tr.params, {"user_id": jnp.asarray(users)}))

    return eval_ours_style(score_rows, train_ds.store, test_ds.store)


# ------------------------------------------------------------- reference
# Each runner states the reference's training computation in TF/Keras
# exactly as openrec/tf2 defines it (see file:line cites), fed by the same
# sampler streams as ours.

def _tf_embeds(seed_u=1, seed_i=2):
    import tensorflow as tf
    user_lf = tf.Variable(np.random.default_rng(seed_u).uniform(
        -0.05, 0.05, (USERS, DIM)).astype(np.float32))
    item_lf = tf.Variable(np.random.default_rng(seed_i).uniform(
        -0.05, 0.05, (ITEMS, DIM)).astype(np.float32))
    item_b = tf.Variable(np.zeros((ITEMS, 1), np.float32))
    return user_lf, item_lf, item_b


def run_reference_bpr(train_data, test_data):
    """openrec/tf2/recommenders/bpr.py:21-37 + joint l2, keras Adam."""
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import tensorflow as tf

    train_ds, test_ds = _datasets(train_data, test_data)
    user_lf, item_lf, item_b = _tf_embeds()
    opt = tf.keras.optimizers.Adam(LR)

    @tf.function
    def step(uid, pid, nid):
        with tf.GradientTape() as tape:
            u = tf.gather(user_lf, uid)
            p = tf.gather(item_lf, pid)
            n = tf.gather(item_lf, nid)
            pb = tf.gather(item_b, pid)
            nb = tf.gather(item_b, nid)
            pos = tf.reduce_sum(u * p, 1, keepdims=True) + pb
            neg = tf.reduce_sum(u * n, 1, keepdims=True) + nb
            loss = -tf.reduce_mean(
                tf.math.log_sigmoid(tf.maximum(pos - neg, -30.0)))
            total = loss + tf.nn.l2_loss(u) + tf.nn.l2_loss(p) \
                + tf.nn.l2_loss(n)
        grads = tape.gradient(total, [user_lf, item_lf, item_b])
        opt.apply_gradients(zip(grads, [user_lf, item_lf, item_b]))

    batches = _batches(train_ds, "pairwise")
    for _ in range(ITERS):
        b = next(batches)
        step(tf.constant(b["user_id"]), tf.constant(b["p_item_id"]),
             tf.constant(b["n_item_id"]))

    U, V = user_lf.numpy(), item_lf.numpy()
    bias = item_b.numpy().reshape(-1)
    return eval_ours_style(lambda users: U[users] @ V.T + bias[None, :],
                           train_ds.store, test_ds.store)


def run_reference_wrmf(train_data, test_data, a=2.0, b=0.3):
    """openrec/tf2/recommenders/wrmf.py:5-40 with
    pointwise_mse_loss.py:4-31 (weight outside the square)."""
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import tensorflow as tf

    train_ds, test_ds = _datasets(train_data, test_data)
    user_lf, item_lf, item_b = _tf_embeds()
    opt = tf.keras.optimizers.Adam(LR)

    @tf.function
    def step(uid, iid, label):
        with tf.GradientTape() as tape:
            u = tf.gather(user_lf, uid)
            it = tf.gather(item_lf, iid)
            ib = tf.gather(item_b, iid)
            pred = tf.reduce_sum(u * it, 1) + tf.reshape(ib, [-1])
            w = (a - b) * label + b
            loss = tf.reduce_sum(w * tf.square(label - pred))
            total = loss + tf.nn.l2_loss(u) + tf.nn.l2_loss(it)
        grads = tape.gradient(total, [user_lf, item_lf, item_b])
        opt.apply_gradients(zip(grads, [user_lf, item_lf, item_b]))

    batches = _batches(train_ds, "pointwise")
    for _ in range(ITERS):
        bt = next(batches)
        step(tf.constant(bt["user_id"]), tf.constant(bt["item_id"]),
             tf.constant(bt["label"]))

    U, V = user_lf.numpy(), item_lf.numpy()
    bias = item_b.numpy().reshape(-1)
    return eval_ours_style(lambda users: U[users] @ V.T + bias[None, :],
                           train_ds.store, test_ds.store)


def run_reference_ucml(train_data, test_data, margin=0.5):
    """openrec/tf2/recommenders/ucml.py:29-48: hinge on -‖u-v‖²+b with
    post-step unit-ball censoring of the touched rows (censor_vec →
    latent_factor.py:17-23)."""
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import tensorflow as tf

    train_ds, test_ds = _datasets(train_data, test_data)
    user_lf, item_lf, item_b = _tf_embeds()
    opt = tf.keras.optimizers.Adam(LR)

    def censor(var, ids):
        unique_ids, _ = tf.unique(ids)
        g = tf.gather(var, unique_ids)
        norm = tf.norm(g, axis=1, keepdims=True)
        var.scatter_nd_update(tf.expand_dims(unique_ids, 1),
                              g / tf.maximum(norm, 0.1))

    @tf.function
    def step(uid, pid, nid):
        with tf.GradientTape() as tape:
            u = tf.gather(user_lf, uid)
            p = tf.gather(item_lf, pid)
            n = tf.gather(item_lf, nid)
            pb = tf.gather(item_b, pid)
            nb = tf.gather(item_b, nid)
            l2p = tf.reduce_sum(tf.square(u - p), -1, keepdims=True)
            l2n = tf.reduce_sum(tf.square(u - n), -1, keepdims=True)
            diff = ((-l2p) + pb) - ((-l2n) + nb)
            loss = tf.reduce_sum(tf.maximum(margin - diff, 0))
            total = loss + tf.nn.l2_loss(u) + tf.nn.l2_loss(p) \
                + tf.nn.l2_loss(n)
        grads = tape.gradient(total, [user_lf, item_lf, item_b])
        opt.apply_gradients(zip(grads, [user_lf, item_lf, item_b]))
        censor(user_lf, uid)
        censor(item_lf, tf.concat([pid, nid], 0))

    batches = _batches(train_ds, "pairwise")
    for _ in range(ITERS):
        b = next(batches)
        step(tf.constant(b["user_id"]), tf.constant(b["p_item_id"]),
             tf.constant(b["n_item_id"]))

    U, V = user_lf.numpy(), item_lf.numpy()
    bias = item_b.numpy().reshape(-1)

    def score_rows(users):
        u = U[users]
        return (2.0 * (u @ V.T) - np.sum(u ** 2, 1, keepdims=True)
                - np.sum(V ** 2, 1)[None, :] + bias[None, :])

    return eval_ours_style(score_rows, train_ds.store, test_ds.store)


def run_reference_gmf(train_data, test_data):
    """openrec/tf2/recommenders/gmf.py:5-41: logit = Dense_1(u⊙v)+b_i
    (single linear unit, no bias), BCE-from-logits."""
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import tensorflow as tf

    train_ds, test_ds = _datasets(train_data, test_data)
    user_lf, item_lf, item_b = _tf_embeds()
    limit = np.sqrt(6.0 / (DIM + 1))
    w = tf.Variable(np.random.default_rng(3).uniform(
        -limit, limit, (DIM, 1)).astype(np.float32))
    opt = tf.keras.optimizers.Adam(LR)
    bce = tf.keras.losses.BinaryCrossentropy(from_logits=True)

    @tf.function
    def step(uid, iid, label):
        with tf.GradientTape() as tape:
            u = tf.gather(user_lf, uid)
            it = tf.gather(item_lf, iid)
            ib = tf.gather(item_b, iid)
            logit = tf.reshape(tf.matmul(u * it, w) + ib, [-1])
            loss = bce(y_true=label, y_pred=logit)
            total = loss + tf.nn.l2_loss(u) + tf.nn.l2_loss(it) \
                + tf.nn.l2_loss(w)
        grads = tape.gradient(total, [user_lf, item_lf, item_b, w])
        opt.apply_gradients(zip(grads, [user_lf, item_lf, item_b, w]))

    batches = _batches(train_ds, "pointwise")
    for _ in range(ITERS):
        bt = next(batches)
        step(tf.constant(bt["user_id"]), tf.constant(bt["item_id"]),
             tf.constant(bt["label"]))

    U, V = user_lf.numpy(), item_lf.numpy()
    bias = item_b.numpy().reshape(-1)
    wv = w.numpy()[:, 0]

    def score_rows(users):
        return (U[users] * wv[None, :]) @ V.T + bias[None, :]

    return eval_ours_style(score_rows, train_ds.store, test_ds.store)


def main():
    from openrec_tpu.models import BPR, GMF, UCML, WRMF

    train_data, test_data = make_low_rank()
    runs = {
        "BPR": (BPR(total_users=USERS, total_items=ITEMS,
                    dim_user_embed=DIM, dim_item_embed=DIM),
                "pairwise", run_reference_bpr),
        "WRMF": (WRMF(total_users=USERS, total_items=ITEMS,
                      dim_user_embed=DIM, dim_item_embed=DIM,
                      a=2.0, b=0.3),
                 "pointwise", run_reference_wrmf),
        "UCML": (UCML(total_users=USERS, total_items=ITEMS,
                      dim_user_embed=DIM, dim_item_embed=DIM, margin=0.5),
                 "pairwise", run_reference_ucml),
        "GMF": (GMF(total_users=USERS, total_items=ITEMS,
                    dim_user_embed=DIM, dim_item_embed=DIM),
                "pointwise", run_reference_gmf),
    }
    out = {"config": {"users": USERS, "items": ITEMS, "dim": DIM,
                      "batch": BATCH, "iters": ITERS, "lr": LR}}
    for name, (model, kind, ref_fn) in runs.items():
        ours = run_ours(model, kind, train_data, test_data)
        print(f"{name} ours:     ", ours, flush=True)
        ref = ref_fn(train_data, test_data)
        print(f"{name} reference:", ref, flush=True)
        out[name] = {"ours": ours, "reference": ref}

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "quality_parity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
