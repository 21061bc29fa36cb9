"""Quality parity: our BPR vs the reference's TF/Keras BPR, trained on the
SAME synthetic dataset with the SAME hyperparameters, evaluated with the
SAME (reference-semantics) metrics.

Writes benchmarks/quality_parity.json: {"ours": {...}, "reference": {...}}.
Run on CPU (JAX_PLATFORMS=cpu) so both frameworks share the hardware; the
comparison is about metric parity, not speed.

Dataset: planted low-rank preferences (tests/conftest.make_low_rank
recipe scaled up) — a learnable structure where converged Recall/AUC is a
meaningful equality target, unlike uniform-random interactions.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# Force CPU regardless of the environment's TPU sitecustomize — this
# benchmark compares metric parity, and must never contend for the chip.
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
    import jax
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


def run_ours(train_data, test_data):
    import jax
    import jax.numpy as jnp
    from openrec_tpu.data import Dataset
    from openrec_tpu.models import BPR
    from openrec_tpu.training import Trainer

    train_ds = Dataset(train_data, USERS, ITEMS, seed=SEED)
    test_ds = Dataset(test_data, USERS, ITEMS, seed=SEED)
    model = BPR(total_users=USERS, total_items=ITEMS, dim_user_embed=DIM,
                dim_item_embed=DIM)
    tr = Trainer(model, lr=LR, seed=SEED)
    batches = iter(train_ds.pairwise(batch_size=BATCH))
    for i in range(ITERS):
        tr.train_step(next(batches))

    def score_rows(users):
        return np.asarray(
            tr._score(tr.params, {"user_id": jnp.asarray(users)}))

    return eval_ours_style(score_rows, train_ds.store, test_ds.store)


def run_reference(train_data, test_data):
    """The reference's exact training computation in TF/Keras (CPU)."""
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import tensorflow as tf
    from openrec_tpu.data import Dataset

    train_ds = Dataset(train_data, USERS, ITEMS, seed=SEED)
    test_ds = Dataset(test_data, USERS, ITEMS, seed=SEED)

    user_lf = tf.Variable(np.random.default_rng(1).uniform(
        -0.05, 0.05, (USERS, DIM)).astype(np.float32))
    item_lf = tf.Variable(np.random.default_rng(2).uniform(
        -0.05, 0.05, (ITEMS, DIM)).astype(np.float32))
    item_b = tf.Variable(np.zeros((ITEMS, 1), np.float32))
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
        return loss

    batches = iter(train_ds.pairwise(batch_size=BATCH))
    for i in range(ITERS):
        b = next(batches)
        step(tf.constant(b["user_id"]), tf.constant(b["p_item_id"]),
             tf.constant(b["n_item_id"]))

    U = user_lf.numpy()
    V = item_lf.numpy()
    bias = item_b.numpy().reshape(-1)

    def score_rows(users):
        return U[users] @ V.T + bias[None, :]

    return eval_ours_style(score_rows, train_ds.store, test_ds.store)


def main():
    train_data, test_data = make_low_rank()
    ours = run_ours(train_data, test_data)
    print("ours:     ", ours, flush=True)
    ref = run_reference(train_data, test_data)
    print("reference:", ref, flush=True)
    out = {"config": {"users": USERS, "items": ITEMS, "dim": DIM,
                      "batch": BATCH, "iters": ITERS, "lr": LR},
           "ours": ours, "reference": ref}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "quality_parity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
