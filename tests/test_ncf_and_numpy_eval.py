import numpy as np
import jax
import jax.numpy as jnp

from openrec_tpu.data.samplers import StratifiedPointwiseSampler
from openrec_tpu.data.store import InteractionStore
from openrec_tpu.metrics import numpy_eval
from openrec_tpu.models import BPR, MLPRec, NeuMF
from openrec_tpu.training import Trainer
from tests.conftest import make_interactions

USERS, ITEMS = 40, 100


def _store():
    return InteractionStore(make_interactions(), USERS, ITEMS, seed=0)


def _train_ok(model, steps=40, lr=0.01):
    store = _store()
    s = StratifiedPointwiseSampler(store, batch_size=64, seed=0)
    tr = Trainer(model, lr=lr, seed=0)
    losses = []
    for i, b in enumerate(iter(s)):
        if i >= steps:
            break
        loss, _ = tr.train_step(b)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    return tr


def test_mlp_rec_trains_and_scores():
    model = MLPRec(total_users=USERS, total_items=ITEMS, dim_user_embed=8,
                   dim_item_embed=8, mlp_units=(16, 1))
    tr = _train_ok(model)
    scores = model.score(tr.params,
                         {"user_id": jnp.arange(3)}, item_chunk=32)
    assert scores.shape == (3, ITEMS)
    # chunked scoring == direct pairwise logits
    u, i = jnp.asarray([1]), jnp.asarray([7])
    direct = model._mlp_logit(
        tr.params, jnp.concatenate([
            tr.params["user_embed"][u], tr.params["item_embed"][i]],
            axis=1))[0, 0] + tr.params["item_bias"][7, 0]
    np.testing.assert_allclose(float(scores[1, 7]) if False else
                               float(model.score(tr.params,
                                                 {"user_id": u},
                                                 item_chunk=32)[0, 7]),
                               float(direct), rtol=1e-5)


def test_neumf_trains_and_scores():
    model = NeuMF(total_users=USERS, total_items=ITEMS, dim_ge_embed=8,
                  dim_mlp_embed=8, mlp_units=(16, 1), alpha=0.4)
    tr = _train_ok(model)
    scores = model.score(tr.params, {"user_id": jnp.arange(2)},
                         item_chunk=32)
    assert scores.shape == (2, ITEMS)
    # full-catalog row at (u, i) equals the training-path logit
    logit = model._logit(tr.params, jnp.asarray([1]), jnp.asarray([5]))
    np.testing.assert_allclose(float(scores[1, 5]), float(logit[0]),
                               rtol=1e-4, atol=1e-6)


def test_numpy_eval_manager_full_and_sampled():
    store = _store()
    model = BPR(total_users=USERS, total_items=ITEMS, dim_user_embed=8,
                dim_item_embed=8)
    tr = Trainer(model, lr=0.01, seed=0)

    def score_fn(users):
        return tr._score(tr.params,
                         {"user_id": jnp.asarray(users, jnp.int32)})

    mgr = numpy_eval.EvalManager(at=(10, 50), seed=0)
    full = mgr.evaluate(score_fn, store)
    assert set(full) == {"AUC", "Recall@10", "Recall@50", "NDCG@10",
                         "NDCG@50", "Precision@10", "Precision@50"}
    for v in full.values():
        assert 0.0 <= v <= 1.0 or np.isfinite(v)
    sampled = mgr.evaluate(score_fn, store, num_negatives=20)
    assert np.isfinite(list(sampled.values())).all()


def test_numpy_metric_formulas():
    ranks = np.array([0.0, 3.0, 120.0])
    n = 500.0
    np.testing.assert_allclose(numpy_eval.auc(ranks, n),
                               np.mean((n - ranks) / n))
    # reference uses <= for recall/precision at k
    assert numpy_eval.recall(ranks, n, at=3) == 2 / 3
    assert numpy_eval.precision(ranks, n, at=3) == 2 / 3
    want_denom = sum(1 / np.log2(i + 2) for i in range(3))
    want_dcg = 1 / np.log2(0 + 2) + 1 / np.log2(3 + 2)
    np.testing.assert_allclose(numpy_eval.ndcg(ranks, n, at=100),
                               want_dcg / want_denom)


def test_full_rank_excludes():
    scores = np.array([5.0, 4.0, 3.0, 2.0, 1.0])
    ranks, n_neg = numpy_eval.full_rank(scores, pos_items=[2],
                                        excl_items=[0])
    # negatives = {1, 3, 4}; items scoring above item2: only item1
    assert n_neg == 3
    np.testing.assert_array_equal(ranks, [1.0])
