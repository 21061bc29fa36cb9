"""Quality parity AT REFERENCE SCALE: our models vs the reference's
TF/Keras math, trained on the SAME synthetic dataset at the CiteULike
config (5,551 users x 16,980 items — tf2_examples/dataloader.py:22-23),
from the SAME INITIAL PARAMETERS, fed by the SAME sampler streams, with
the SAME hyperparameters (dim_embed=50, batch=1000, Adam 1e-3 —
tf2_examples/bpr_citeulike.py:12-15), evaluated with the SAME
(reference-semantics) metrics at the SAME iteration checkpoints —
including the PRE-PLATEAU regime (iters 250-5000) where trajectories
still discriminate between implementations.

Round-3 protocol (after root-causing the round-2 UCML gap):
- Ours trains with `keras_adam` (training/optim.py) — the empirically
  probed TF/Keras Adam trajectory semantics: moments decay and apply
  DENSELY, so previously-touched embedding rows keep moving by residual
  momentum while absent from the batch. (`lazy_adam`, our production
  default, freezes untouched rows — identical per-step, different over
  trajectories; it was the primary cause of round 2's UCML deviation.)
- The reference is run in BOTH sparse-gradient modes:
    * ref_dedup:  IndexedSlices dedup-summed before apply — the
      TF<=2.x / reference-era semantics, and exactly what JAX's dense
      autodiff gradients produce. Ours must (and does) match this
      trajectory to fp precision at every checkpoint.
    * ref_keras3: keras 3 as installed applies the raw per-slice
      IndexedSlices (v accumulates sum(g_i^2) instead of (sum g_i)^2 on
      duplicate ids). The ref_keras3-vs-ref_dedup gap measures the
      reference's OWN drift across its framework's versions — the noise
      floor any cross-framework comparison must be judged against.
- UCML/WRMF variance bands: an ours run with a different init+stream
  seed, and a ref_dedup run with fp-sized (1e-7) init perturbation,
  calibrate seed- and fp-level spread.

Covers every BASELINE.md parity target: BPR, WRMF, UCML (incl. post-step
censoring), GMF at CiteULike scale, and DLRM at the reference's Criteo
recipe (dim 4, bot [8,4], top [128,64,1], batch 1024, BCE-AUC, 1000
train batches — tf2_examples/dlrm_criteo.py:9-27). Per-step math identity
is separately pinned by tests/test_reference_parity.py; this records that
the *training trajectories* agree too.

Writes benchmarks/quality_parity.json incrementally:
  {model: {"ours": {"curve": [...], "final": {...}},
           "ref_dedup": {...}, "ref_keras3": {...}, ...}, ...}

Run on CPU (forced below) so both frameworks share the hardware and the
benchmark never contends for the TPU chip. Takes ~1h on the 2-vCPU host;
set OPENREC_PARITY_SCALE=toy for a minutes-long smoke run.

Dataset: planted low-rank preferences (a learnable structure where the
converged Recall/AUC trajectory is a meaningful equality target, unlike
uniform-random interactions). The real CiteULike file is not downloadable
in this environment (zero egress); the planted set matches its size and
density (~36 interactions/user).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# Force CPU regardless of the environment's TPU sitecustomize.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

TOY = os.environ.get("OPENREC_PARITY_SCALE") == "toy"
if TOY:
    USERS, ITEMS, RANK, PER_USER = 200, 800, 8, 30
    DIM, BATCH, LR = 32, 512, 0.001
    CKPTS = (100, 250, 500, 1000)
    DLRM_ITERS, DLRM_BATCH, DLRM_EVAL_EVERY = 100, 256, 50
else:
    # CiteULike scale + the reference example's exact hyperparameters.
    USERS, ITEMS, RANK, PER_USER = 5551, 16980, 12, 36
    DIM, BATCH, LR = 50, 1000, 0.001
    # Checkpoints cover the PRE-PLATEAU regime (250-5000, where the
    # trajectories still discriminate between implementations — the
    # round-2 verdict's point) plus the plateau for final-value parity.
    CKPTS = (250, 500, 1000, 2000, 5000, 10000, 20000, 30000)
    # reference dlrm_criteo.py trains exactly 1000 batches of 1024
    DLRM_ITERS, DLRM_BATCH, DLRM_EVAL_EVERY = 1000, 1024, 250
ITERS = CKPTS[-1]
AT = (50, 100)
SEED = 0
OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "quality_parity.json")


def make_low_rank():
    """Planted low-rank preferences at CiteULike size; per-user top items
    split half train / half test."""
    rng = np.random.default_rng(SEED)
    U = rng.normal(size=(USERS, RANK)).astype(np.float32)
    V = rng.normal(size=(ITEMS, RANK)).astype(np.float32)
    train_rows, test_rows = [], []
    chunk = 512
    for lo in range(0, USERS, chunk):
        scores = U[lo:lo + chunk] @ V.T
        top = np.argpartition(-scores, PER_USER, axis=1)[:, :PER_USER]
        for r in range(top.shape[0]):
            items = top[r].copy()
            rng.shuffle(items)
            half = PER_USER // 2
            u = lo + r
            train_rows += [(u, i) for i in items[:half]]
            test_rows += [(u, i) for i in items[half:]]
    dtype = [("user_id", np.int32), ("item_id", np.int32)]
    return (np.array(train_rows, dtype=dtype),
            np.array(test_rows, dtype=dtype))


def eval_ours_style(score_rows, train_store, test_store):
    """Reference tf2 metric semantics via our on-device implementations."""
    from openrec_tpu.data.samplers import EvaluationSampler
    from openrec_tpu.metrics import AUC, DictMean, Recall

    sampler = EvaluationSampler(test_store, batch_size=min(BATCH, 1000),
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


def _batches(train_ds, kind, sampler_seed=None):
    if sampler_seed is not None:
        train_ds._seed = sampler_seed
    if kind == "pairwise":
        return iter(train_ds.pairwise(batch_size=BATCH))
    return iter(train_ds.stratified_pointwise(batch_size=BATCH,
                                              pos_ratio=0.5))


def _log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


# ------------------------------------------------------- shared inits

def make_inits(seed=99, perturb=0.0):
    """The initial parameter arrays BOTH frameworks start from: keras
    'uniform' embeddings (+-0.05), zero biases, glorot-uniform GMF
    weight. perturb: add N(0, perturb) noise (fp-sensitivity control)."""
    r = np.random.default_rng(seed)
    limit = np.sqrt(6.0 / (DIM + 1))
    inits = {
        "user_embed": r.uniform(-0.05, 0.05, (USERS, DIM))
        .astype(np.float32),
        "item_embed": r.uniform(-0.05, 0.05, (ITEMS, DIM))
        .astype(np.float32),
        "item_bias": np.zeros((ITEMS, 1), np.float32),
        "gmf_w": r.uniform(-limit, limit, (DIM, 1)).astype(np.float32),
    }
    if perturb:
        rp = np.random.default_rng(seed + 1000)
        inits = {k: (v + rp.normal(0, perturb, v.shape)
                     .astype(np.float32)) if v.size else v
                 for k, v in inits.items()}
    return inits


# ---------------------------------------------------------------- ours

def run_ours(model, sampler_kind, train_data, test_data, inits,
             sampler_seed=SEED, optimizer="keras", iters=None):
    """Train ours from the shared inits with keras_adam (trajectory-
    exact reference semantics) or lazy_adam (production default)."""
    import jax.numpy as jnp
    from openrec_tpu.training import Trainer
    from openrec_tpu.training.optim import keras_adam

    iters = iters or ITERS
    train_ds, test_ds = _datasets(train_data, test_data)
    tx = keras_adam(LR) if optimizer == "keras" else None
    tr = Trainer(model, optimizer=tx, lr=LR, seed=SEED)
    params = dict(tr.params)
    params["user_embed"] = jnp.asarray(inits["user_embed"])
    params["item_embed"] = jnp.asarray(inits["item_embed"])
    params["item_bias"] = jnp.asarray(inits["item_bias"])
    if "mlp" in params:
        params["mlp"] = [{"w": jnp.asarray(inits["gmf_w"])}]
    tr.params = params
    tr.opt_state = tr.tx.init(tr.params)
    train_ds._seed = sampler_seed
    batches = _batches(train_ds, sampler_kind, sampler_seed)

    def score_rows(users):
        return np.asarray(
            tr._score(tr.params, {"user_id": jnp.asarray(users)}))

    curve = []
    for it in range(1, iters + 1):
        tr.train_step(next(batches))
        if it in CKPTS:
            m = eval_ours_style(score_rows, train_ds.store, test_ds.store)
            curve.append({"iter": it, **m})
            _log(f"  ours iter {it}: {m}")
    return {"curve": curve, "final": curve[-1]}


# ------------------------------------------------------------- reference
# Each runner states the reference's training computation in TF/Keras
# exactly as openrec/tf2 defines it (see file:line cites), fed by the same
# sampler streams as ours, from the same shared inits.

def _tf_embeds(inits):
    import tensorflow as tf
    user_lf = tf.Variable(inits["user_embed"].copy())
    item_lf = tf.Variable(inits["item_embed"].copy())
    item_b = tf.Variable(inits["item_bias"].copy())
    return user_lf, item_lf, item_b


def _maybe_dedup(grads, grad_mode):
    """grad_mode='dedup': convert IndexedSlices to dense (dedup-summed)
    tensors before apply — the TF<=2.x era sparse-Adam semantics, and
    exactly what JAX autodiff hands our optimizer. 'keras3': leave the
    per-slice IndexedSlices for keras 3's own handling."""
    import tensorflow as tf
    if grad_mode == "dedup":
        return [tf.convert_to_tensor(g) for g in grads]
    return grads


def _ref_curve(step, batches, batch_keys, score_rows, train_store,
               test_store, tag, iters=None):
    """Drive a TF step over the shared sampler stream with the shared
    eval checkpoints."""
    import tensorflow as tf
    curve = []
    for it in range(1, (iters or ITERS) + 1):
        b = next(batches)
        step(*[tf.constant(b[k]) for k in batch_keys])
        if it in CKPTS:
            m = eval_ours_style(score_rows, train_store, test_store)
            curve.append({"iter": it, **m})
            _log(f"  {tag} iter {it}: {m}")
    return {"curve": curve, "final": curve[-1]}


def run_reference_bpr(train_data, test_data, inits, grad_mode="keras3",
                      sampler_seed=SEED, tag="ref-bpr", iters=None):
    """openrec/tf2/recommenders/bpr.py:21-37 + joint l2, keras Adam."""
    import tensorflow as tf

    train_ds, test_ds = _datasets(train_data, test_data)
    train_ds._seed = sampler_seed
    user_lf, item_lf, item_b = _tf_embeds(inits)
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
        grads = _maybe_dedup(grads, grad_mode)
        opt.apply_gradients(zip(grads, [user_lf, item_lf, item_b]))

    def score_rows(users):
        U, V = user_lf.numpy(), item_lf.numpy()
        bias = item_b.numpy().reshape(-1)
        return U[users] @ V.T + bias[None, :]

    from openrec_tpu.data.samplers import PairwiseSampler
    batches = iter(PairwiseSampler(train_ds.store, BATCH,
                                   seed=sampler_seed))
    return _ref_curve(step, batches, ("user_id", "p_item_id", "n_item_id"),
                      score_rows, train_ds.store, test_ds.store, tag,
                      iters)


def run_reference_wrmf(train_data, test_data, inits, grad_mode="keras3",
                       sampler_seed=SEED, tag="ref-wrmf", a=2.0, b=0.3,
                       iters=None):
    """openrec/tf2/recommenders/wrmf.py:5-40 with
    pointwise_mse_loss.py:4-31 (weight outside the square)."""
    import tensorflow as tf

    train_ds, test_ds = _datasets(train_data, test_data)
    user_lf, item_lf, item_b = _tf_embeds(inits)
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
        grads = _maybe_dedup(grads, grad_mode)
        opt.apply_gradients(zip(grads, [user_lf, item_lf, item_b]))

    def score_rows(users):
        U, V = user_lf.numpy(), item_lf.numpy()
        bias = item_b.numpy().reshape(-1)
        return U[users] @ V.T + bias[None, :]

    batches = _batches(train_ds, "pointwise", sampler_seed)
    return _ref_curve(step, batches, ("user_id", "item_id", "label"),
                      score_rows, train_ds.store, test_ds.store, tag,
                      iters)


def run_reference_ucml(train_data, test_data, inits, grad_mode="keras3",
                       sampler_seed=SEED, tag="ref-ucml", margin=0.5,
                       iters=None):
    """openrec/tf2/recommenders/ucml.py:29-48: hinge on -‖u-v‖²+b with
    post-step unit-ball censoring of the touched rows (censor_vec →
    latent_factor.py:17-23)."""
    import tensorflow as tf

    train_ds, test_ds = _datasets(train_data, test_data)
    train_ds._seed = sampler_seed
    user_lf, item_lf, item_b = _tf_embeds(inits)
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
        grads = _maybe_dedup(grads, grad_mode)
        opt.apply_gradients(zip(grads, [user_lf, item_lf, item_b]))
        censor(user_lf, uid)
        censor(item_lf, tf.concat([pid, nid], 0))

    def score_rows(users):
        U, V = user_lf.numpy(), item_lf.numpy()
        bias = item_b.numpy().reshape(-1)
        u = U[users]
        return (2.0 * (u @ V.T) - np.sum(u ** 2, 1, keepdims=True)
                - np.sum(V ** 2, 1)[None, :] + bias[None, :])

    batches = _batches(train_ds, "pairwise", sampler_seed)
    return _ref_curve(step, batches, ("user_id", "p_item_id", "n_item_id"),
                      score_rows, train_ds.store, test_ds.store, tag,
                      iters)


def run_reference_gmf(train_data, test_data, inits, grad_mode="keras3",
                      sampler_seed=SEED, tag="ref-gmf", iters=None):
    """openrec/tf2/recommenders/gmf.py:5-41: logit = Dense_1(u⊙v)+b_i
    (single linear unit, no bias), BCE-from-logits."""
    import tensorflow as tf

    train_ds, test_ds = _datasets(train_data, test_data)
    user_lf, item_lf, item_b = _tf_embeds(inits)
    w = tf.Variable(inits["gmf_w"].copy())
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
        grads = _maybe_dedup(grads, grad_mode)
        opt.apply_gradients(zip(grads, [user_lf, item_lf, item_b, w]))

    def score_rows(users):
        U, V = user_lf.numpy(), item_lf.numpy()
        bias = item_b.numpy().reshape(-1)
        wv = w.numpy()[:, 0]
        return (U[users] * wv[None, :]) @ V.T + bias[None, :]

    batches = _batches(train_ds, "pointwise", sampler_seed)
    return _ref_curve(step, batches, ("user_id", "item_id", "label"),
                      score_rows, train_ds.store, test_ds.store, tag,
                      iters)


# ------------------------------------------------------------------ DLRM

DLRM_EMB = tuple([200] * 20 + [2000] * 6)     # 26 sparse tables
DLRM_DIM, DLRM_BOT, DLRM_TOP = 4, (8, 4), (128, 64, 1)
DLRM_DENSE = 13


def make_ctr_data(n_train=None, n_val=None):
    """Planted CTR structure at the reference's Criteo recipe shapes:
    label = Bernoulli(sigmoid(dense w·x + per-table id affinities))."""
    n_train = n_train or DLRM_ITERS * DLRM_BATCH
    n_val = n_val or max(DLRM_BATCH * 20, 4096)
    rng = np.random.default_rng(SEED)
    w = rng.normal(size=(DLRM_DENSE,)).astype(np.float32) * 0.5
    table_aff = [rng.normal(size=(c,)).astype(np.float32) * 0.4
                 for c in DLRM_EMB]

    def gen(n, seed):
        r = np.random.default_rng(seed)
        dense = r.normal(size=(n, DLRM_DENSE)).astype(np.float32)
        sparse = np.stack([r.integers(0, c, n) for c in DLRM_EMB],
                          axis=1).astype(np.int32)
        logit = dense @ w + sum(
            table_aff[j][sparse[:, j]] for j in range(len(DLRM_EMB)))
        p = 1.0 / (1.0 + np.exp(-logit))
        label = (r.uniform(size=n) < p).astype(np.float32)
        return {"dense_features": dense, "sparse_features": sparse,
                "label": label}

    return gen(n_train, SEED + 10), gen(n_val, SEED + 20)


def _auc_np(y_true, y_score):
    order = np.argsort(y_score)
    ranks = np.empty(len(y_score))
    ranks[order] = np.arange(1, len(y_score) + 1)
    n_pos = y_true.sum()
    n_neg = len(y_true) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return float((ranks[y_true > 0].sum()
                  - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def make_dlrm_inits():
    """Shared DLRM initial parameters (numpy) for both frameworks:
    uniform(+-0.05) tables, glorot dense layers, zero biases."""
    rng = np.random.default_rng(1)
    tables = [rng.uniform(-0.05, 0.05, (c, DLRM_DIM)).astype(np.float32)
              for c in DLRM_EMB]

    def dense_layer(n_in, n_out, seed):
        limit = np.sqrt(6.0 / (n_in + n_out))
        r = np.random.default_rng(seed)
        return (r.uniform(-limit, limit, (n_in, n_out)).astype(np.float32),
                np.zeros((n_out,), np.float32))

    bot, n_in = [], DLRM_DENSE
    for k, n_out in enumerate(DLRM_BOT):
        bot.append(dense_layer(n_in, n_out, 100 + k))
        n_in = n_out
    n_sparse = len(DLRM_EMB) + 1
    n_inter = n_sparse * (n_sparse - 1) // 2
    top, n_in = [], DLRM_BOT[-1] + n_inter
    for k, n_out in enumerate(DLRM_TOP):
        top.append(dense_layer(n_in, n_out, 200 + k))
        n_in = n_out
    return {"tables": tables, "bot": bot, "top": top}


def run_ours_dlrm(train, val, inits):
    import jax.numpy as jnp
    from openrec_tpu.models import DLRM
    from openrec_tpu.training import Trainer
    from openrec_tpu.training.optim import keras_adam

    model = DLRM(m_spa=DLRM_DIM, ln_emb=DLRM_EMB, ln_bot=DLRM_BOT,
                 ln_top=DLRM_TOP, dim_dense=DLRM_DENSE, loss_func="bce")
    tr = Trainer(model, optimizer=keras_adam(LR), lr=LR, seed=SEED)
    tr.params = {
        "embed_tables": [jnp.asarray(t) for t in inits["tables"]],
        "mlp_bot": [{"w": jnp.asarray(w), "b": jnp.asarray(b)}
                    for w, b in inits["bot"]],
        "mlp_top": [{"w": jnp.asarray(w), "b": jnp.asarray(b)}
                    for w, b in inits["top"]],
    }
    tr.opt_state = tr.tx.init(tr.params)
    predict = jax.jit(model.predict)

    def val_auc():
        preds = []
        for lo in range(0, len(val["label"]), DLRM_BATCH):
            preds.append(np.asarray(predict(
                tr.params,
                jnp.asarray(val["dense_features"][lo:lo + DLRM_BATCH]),
                jnp.asarray(val["sparse_features"][lo:lo + DLRM_BATCH]))))
        return _auc_np(val["label"], np.concatenate(preds))

    curve = []
    order = np.random.default_rng(SEED).permutation(len(train["label"]))
    for it in range(1, DLRM_ITERS + 1):
        take = order[(it - 1) * DLRM_BATCH:it * DLRM_BATCH]
        batch = {k: v[take] for k, v in train.items()}
        tr.train_step(batch)
        if it % DLRM_EVAL_EVERY == 0:
            m = {"iter": it, "AUC": val_auc()}
            curve.append(m)
            _log(f"  ours-dlrm iter {it}: {m}")
    return {"curve": curve, "final": curve[-1]}


def run_reference_dlrm(train, val, inits, grad_mode="keras3",
                       tag="ref-dlrm"):
    """openrec/tf2/recommenders/dlrm.py:6-100 restated: per-table uniform
    embeddings, bottom MLP (relu out), dot interaction over
    [sparse..., dense_emb], top MLP (sigmoid out), BCE, keras Adam."""
    import tensorflow as tf

    tables = [tf.Variable(t.copy()) for t in inits["tables"]]
    bot = [(tf.Variable(w.copy()), tf.Variable(b.copy()))
           for w, b in inits["bot"]]
    top = [(tf.Variable(w.copy()), tf.Variable(b.copy()))
           for w, b in inits["top"]]
    n_sparse = len(DLRM_EMB) + 1

    variables = tables + [v for w, b in bot + top for v in (w, b)]
    opt = tf.keras.optimizers.Adam(LR)
    bce = tf.keras.losses.BinaryCrossentropy()

    def mlp(x, layers, out_act):
        for k, (w, b) in enumerate(layers):
            x = tf.matmul(x, w) + b
            x = out_act(x) if k == len(layers) - 1 else tf.nn.relu(x)
        return x

    def forward(dense, sparse):
        embs = [tf.gather(tables[j], sparse[:, j])
                for j in range(len(DLRM_EMB))]
        dense_emb = mlp(dense, bot, tf.nn.relu)
        feats = tf.stack(embs + [dense_emb], axis=1)     # [B, 27, 4]
        dots = tf.matmul(feats, feats, transpose_b=True)  # [B, 27, 27]
        ii, jj = np.tril_indices(n_sparse, k=-1)
        inter = tf.gather_nd(
            tf.transpose(dots, [1, 2, 0]),
            np.stack([ii, jj], axis=1))                   # [n_inter, B]
        inter = tf.transpose(inter)                       # [B, n_inter]
        out = mlp(tf.concat([dense_emb, inter], axis=1), top,
                  tf.nn.sigmoid)
        return tf.reshape(out, [-1])

    @tf.function
    def step(dense, sparse, label):
        with tf.GradientTape() as tape:
            loss = bce(y_true=label, y_pred=forward(dense, sparse))
        grads = tape.gradient(loss, variables)
        grads = _maybe_dedup(grads, grad_mode)
        opt.apply_gradients(zip(grads, variables))

    def val_auc():
        preds = []
        for lo in range(0, len(val["label"]), DLRM_BATCH):
            preds.append(forward(
                tf.constant(val["dense_features"][lo:lo + DLRM_BATCH]),
                tf.constant(val["sparse_features"][lo:lo + DLRM_BATCH]))
                .numpy())
        return _auc_np(val["label"], np.concatenate(preds))

    curve = []
    order = np.random.default_rng(SEED).permutation(len(train["label"]))
    for it in range(1, DLRM_ITERS + 1):
        take = order[(it - 1) * DLRM_BATCH:it * DLRM_BATCH]
        step(tf.constant(train["dense_features"][take]),
             tf.constant(train["sparse_features"][take]),
             tf.constant(train["label"][take]))
        if it % DLRM_EVAL_EVERY == 0:
            m = {"iter": it, "AUC": val_auc()}
            curve.append(m)
            _log(f"  {tag} iter {it}: {m}")
    return {"curve": curve, "final": curve[-1]}


# ------------------------------------------------------------------ main

def _write(out):
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)


def main():
    from openrec_tpu.models import BPR, GMF, UCML, WRMF

    _log(f"building planted dataset ({USERS}x{ITEMS}, {PER_USER}/user)")
    train_data, test_data = make_low_rank()
    out = {"config": {"users": USERS, "items": ITEMS, "dim": DIM,
                      "batch": BATCH, "iters": ITERS, "lr": LR,
                      "per_user": PER_USER,
                      "train_records": len(train_data),
                      "dlrm": {"emb": list(DLRM_EMB), "dim": DLRM_DIM,
                               "bot": list(DLRM_BOT),
                               "top": list(DLRM_TOP),
                               "batch": DLRM_BATCH,
                               "iters": DLRM_ITERS}}}
    # Resume BEFORE the first write (which would wipe the record).
    if os.path.exists(OUT_PATH) and os.environ.get(
            "OPENREC_PARITY_FRESH") != "1":
        try:
            with open(OUT_PATH) as f:
                prev = json.load(f)
            if prev.get("config", {}).get("iters") == ITERS:
                out.update({k: v for k, v in prev.items()
                            if k != "config"})
                _log(f"resuming: {sorted(set(out) - {'config'})}")
        except Exception as e:
            _log(f"no resume ({e})")
    _write(out)

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
    def todo(name, key):
        return key not in out.get(name, {})

    def record(name, key, fn):
        if not todo(name, key):
            _log(f"--- skip {name}/{key} (recorded)")
            return
        out.setdefault(name, {})[key] = fn()
        _write(out)

    # Budgeting (this suite runs on a 2-vCPU host; keras-semantics
    # training is O(catalog)/step on both sides): the trajectory claim
    # is decided in the MOVING part of the curve — the planted metric
    # plateaus by ~iter 2000 — so most runs stop at the pre-plateau cap.
    # UCML, the round-2 disputed target, additionally runs the decisive
    # pair (ours vs ref_dedup) to UCML_FULL = 10k — 2x the moving part
    # of the curve — plus the fp-perturbation control that calibrates
    # pure fp-accumulation divergence at the SAME horizon (a 2-vCPU
    # wall-clock budget choice: per-checkpoint fp-parity through 10k is
    # strictly stronger same-trainer evidence than a noisy 30k
    # final-value match). Round 2's full-30k keras3-native
    # reference finals (AUC 0.88596/0.88661) and lazy-adam ours final
    # (0.87860) remain in git history (quality_parity.json @ d6fe440)
    # for the final-value comparison; the lazy-vs-keras deviation is
    # documented here at the pre-plateau cap.
    PRE = CKPTS[min(4, len(CKPTS) - 1)]
    UCML_FULL = 10000 if 10000 in CKPTS else ITERS

    inits = make_inits()
    for name, (model, kind, ref_fn) in runs.items():
        _log(f"=== {name} ===")
        full = UCML_FULL if name == "UCML" else PRE
        record(name, "ours", lambda: run_ours(
            model, kind, train_data, test_data, inits, iters=full))
        record(name, "ref_dedup", lambda: ref_fn(
            train_data, test_data, inits, grad_mode="dedup",
            tag=f"ref-{name}-dedup", iters=full))
        record(name, "ref_keras3", lambda: ref_fn(
            train_data, test_data, inits, grad_mode="keras3",
            tag=f"ref-{name}-keras3", iters=PRE))

    # Variance bands: ours under a different init+stream seed, and the
    # reference under an fp-sized (1e-7) init perturbation — the scale
    # any remaining ours-vs-reference difference must be judged against.
    # UCML's fp control runs the UCML_FULL horizon (it calibrates the
    # fp-divergence of the decisive pair).
    for name, band_iters in (("UCML", PRE), ("WRMF", PRE)):
        model, kind, ref_fn = runs[name]
        record(name, "ours_seed2", lambda: run_ours(
            model, kind, train_data, test_data, make_inits(seed=123),
            sampler_seed=SEED + 7, iters=band_iters))
        record(name, "ref_dedup_fp_perturbed", lambda: ref_fn(
            train_data, test_data, make_inits(perturb=1e-7),
            grad_mode="dedup", tag=f"ref-{name}-fp",
            iters=UCML_FULL if name == "UCML" else band_iters))

    # The production path (lazy_adam) on the noisiest target — records
    # the size of the lazy-vs-keras trajectory deviation (root cause of
    # the round-2 UCML gap; its 30k final is in the r2 artifact).
    model, kind, _ = runs["UCML"]
    record("UCML", "ours_lazy_adam", lambda: run_ours(
        model, kind, train_data, test_data, inits, optimizer="lazy",
        iters=PRE))

    _log("=== DLRM (shared init) ===")
    dlrm_inits = make_dlrm_inits()
    dlrm_train, dlrm_val = make_ctr_data()
    record("DLRM", "ours", lambda: run_ours_dlrm(
        dlrm_train, dlrm_val, dlrm_inits))
    record("DLRM", "ref_dedup", lambda: run_reference_dlrm(
        dlrm_train, dlrm_val, dlrm_inits, grad_mode="dedup",
        tag="ref-dlrm-dedup"))
    record("DLRM", "ref_keras3", lambda: run_reference_dlrm(
        dlrm_train, dlrm_val, dlrm_inits, grad_mode="keras3",
        tag="ref-dlrm-keras3"))
    _write(out)
    _log(f"wrote {OUT_PATH}")


if __name__ == "__main__":
    main()
