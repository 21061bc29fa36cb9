"""Extended zoo: feature-fusion, multi-negative, sequence, temporal models."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openrec_tpu.data import Dataset
from openrec_tpu.data.samplers import (
    NPairwiseSampler, PairwiseSampler, StratifiedPointwiseSampler,
    TemporalSampler)
from openrec_tpu.models import (
    CDL, DLRM, NBPR, RNNRec, UserPMF, VBPR, VanillaYouTubeRec, VisualBPR,
    VisualCML, VisualGMF, VisualPMF, WCML, YouTubeRec, ConcatVisualBPR,
    ItrMLP, UserVisualPMF)
from openrec_tpu.training import Trainer
from tests.conftest import make_interactions

USERS, ITEMS = 40, 100


def _store(**kw):
    from openrec_tpu.data import InteractionStore
    data = make_interactions(**kw)
    return InteractionStore(data, USERS, ITEMS, seed=0,
                            **({"sortby": "ts"} if kw.get("timestamps")
                               else {}))


def _train_decreases(model, sampler_batches, steps=30, lr=0.01, rng=None):
    tr = Trainer(model, lr=lr, seed=0)
    losses = []
    for i, b in enumerate(sampler_batches):
        if i >= steps:
            break
        loss, _ = tr.train_step(b)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses[:5]
    head = np.mean(losses[:5])
    tail = np.mean(losses[-5:])
    assert tail < head, (head, tail)
    return tr


def test_dlrm_bce_learns_synthetic():
    rng = np.random.default_rng(0)
    model = DLRM(m_spa=4, ln_emb=(20, 30), ln_bot=(8, 4), ln_top=(16, 1),
                 dim_dense=3, loss_func="bce")
    # Labels depend on one sparse feature → learnable.
    def batches():
        while True:
            s = np.stack([rng.integers(0, 20, 128),
                          rng.integers(0, 30, 128)], axis=1)
            d = rng.normal(size=(128, 3)).astype(np.float32)
            label = (s[:, 0] < 10).astype(np.float32)
            yield {"dense_features": d,
                   "sparse_features": s.astype(np.int32), "label": label}
    tr = _train_decreases(model, batches(), steps=200, lr=0.01)
    b = next(batches())
    pred = np.asarray(tr._score(tr.params, b))
    auc_pairs = pred[b["label"] == 1].mean() > pred[b["label"] == 0].mean()
    assert auc_pairs


def test_dlrm_cat_interaction_and_mse():
    model = DLRM(m_spa=4, ln_emb=(10, 10), ln_bot=(4,), ln_top=(8, 1),
                 dim_dense=2, arch_interaction_op="cat", loss_func="mse",
                 sigmoid_top=False)
    rng = np.random.default_rng(1)
    def batches():
        while True:
            yield {"dense_features":
                   rng.normal(size=(64, 2)).astype(np.float32),
                   "sparse_features":
                   rng.integers(0, 10, (64, 2)).astype(np.int32),
                   "label": rng.random(64).astype(np.float32)}
    _train_decreases(model, batches(), steps=50, lr=0.01)


def test_dlrm_invalid_configs():
    with pytest.raises(ValueError):
        DLRM(m_spa=4, ln_emb=(10,), ln_bot=(4,), ln_top=(1,), dim_dense=2,
             arch_interaction_op="bogus")
    with pytest.raises(ValueError):
        DLRM(m_spa=4, ln_emb=(10,), ln_bot=(4,), ln_top=(1,), dim_dense=2,
             loss_func="hinge")


def test_nbpr_trains():
    store = _store()
    model = NBPR(total_users=USERS, total_items=ITEMS, dim_embed=8)
    s = NPairwiseSampler(store, batch_size=64, num_negatives=4, seed=0)
    _train_decreases(model, iter(s), steps=150, lr=0.05)


def test_wcml_trains_and_censors():
    store = _store()
    model = WCML(total_users=USERS, total_items=ITEMS, dim_embed=8,
                 margin=0.5)
    s = NPairwiseSampler(store, batch_size=64, num_negatives=4, seed=0)
    tr = Trainer(model, lr=0.05, seed=0)
    for i, b in enumerate(iter(s)):
        if i >= 40:
            break
        tr.train_step(b)
    norms = np.linalg.norm(np.asarray(tr.params["item_embed"]), axis=1)
    assert norms.max() <= 1.0 + 1e-4


def _visual_features(dim_v=12, seed=3):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(ITEMS, dim_v)).astype(np.float32)


def test_vbpr_concat_pathway():
    store = _store()
    feats = _visual_features()
    model = VBPR(total_users=USERS, total_items=ITEMS, dim_user_embed=16,
                 dim_item_embed=8, item_features=feats)
    s = PairwiseSampler(store, batch_size=64, seed=0)
    tr = _train_decreases(model, iter(s), steps=40, lr=0.02)
    scores = np.asarray(tr._score(tr.params,
                                  {"user_id": np.arange(4, dtype=np.int32)}))
    assert scores.shape == (4, ITEMS)


def test_vbpr_with_joined_features_matches_gathered():
    """Sampler-joined features and model-gathered features agree."""
    store = _store()
    feats = _visual_features()
    model = VBPR(total_users=USERS, total_items=ITEMS, dim_user_embed=16,
                 dim_item_embed=8, item_features=feats)
    params = model.init(jax.random.PRNGKey(0))
    s = PairwiseSampler(store, batch_size=32, seed=1)
    batch = s.sample()
    with_join = dict(batch)
    with_join["p_item_vfeature"] = feats[batch["p_item_id"]]
    with_join["n_item_vfeature"] = feats[batch["n_item_id"]]
    l1, _ = model.loss(params, {k: jnp.asarray(v)
                                for k, v in batch.items()})
    l2, _ = model.loss(params, {k: jnp.asarray(v)
                                for k, v in with_join.items()})
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_visual_bpr_grad_rescale_applied():
    store = _store()
    feats = _visual_features()
    model = VisualBPR(total_users=USERS, total_items=ITEMS, dim_embed=8,
                      mlp_units=(16,), item_features=feats)
    params = model.init(jax.random.PRNGKey(0))
    s = PairwiseSampler(store, batch_size=64, seed=0)
    batch = {k: jnp.asarray(v) for k, v in s.sample().items()}
    grads = jax.grad(lambda p: model.loss(p, batch)[0])(params)
    scaled = model.grad_transform(grads, batch)
    ratio = (np.asarray(scaled["visual_mlp"][0]["w"])
             / np.asarray(grads["visual_mlp"][0]["w"]))
    np.testing.assert_allclose(ratio[np.isfinite(ratio)], 1.0 / 64,
                               rtol=1e-5)
    # non-MLP grads untouched
    np.testing.assert_array_equal(np.asarray(scaled["item_embed"]),
                                  np.asarray(grads["item_embed"]))


@pytest.mark.parametrize("cls", [VisualPMF, VisualGMF])
def test_visual_pointwise_models_train(cls):
    store = _store()
    feats = _visual_features()
    model = cls(total_users=USERS, total_items=ITEMS, dim_embed=8,
                mlp_units=(16,), item_features=feats)
    s = StratifiedPointwiseSampler(store, batch_size=64, seed=0)
    _train_decreases(model, iter(s), steps=40, lr=0.02)


def test_visual_cml_censors():
    store = _store()
    feats = _visual_features()
    model = VisualCML(total_users=USERS, total_items=ITEMS, dim_embed=8,
                      mlp_units=(16,), item_features=feats)
    tr = Trainer(model, lr=0.05, seed=0)
    s = PairwiseSampler(store, batch_size=64, seed=0)
    for i, b in enumerate(iter(s)):
        if i >= 30:
            break
        tr.train_step(b)
    norms = np.linalg.norm(np.asarray(tr.params["item_embed"]), axis=1)
    assert norms.max() <= 1.0 + 1e-4


def test_concat_visual_bpr_trains():
    store = _store()
    feats = _visual_features()
    model = ConcatVisualBPR(total_users=USERS, total_items=ITEMS,
                            dim_embed=12, dim_ve=4, item_features=feats)
    s = PairwiseSampler(store, batch_size=64, seed=0)
    _train_decreases(model, iter(s), steps=40, lr=0.02)


def test_user_pmf_and_user_visual_pmf_train():
    store = _store()
    rng = np.random.default_rng(5)
    ufeats = rng.normal(size=(USERS, 6)).astype(np.float32)
    model = UserPMF(total_users=USERS, total_items=ITEMS, dim_embed=8,
                    user_features=ufeats, mlp_units=(8,))
    s = StratifiedPointwiseSampler(store, batch_size=64, seed=0)
    _train_decreases(model, iter(s), steps=40, lr=0.02)

    model2 = UserVisualPMF(total_users=USERS, total_items=ITEMS, dim_embed=8,
                           user_features=ufeats, mlp_units=(8,),
                           item_features=_visual_features(),
                           item_mlp_units=(8,))
    _train_decreases(model2, iter(s), steps=40, lr=0.02)


def test_cdl_reconstruction_plus_rating():
    store = _store()
    feats = _visual_features(dim_v=20)
    model = CDL(total_users=USERS, total_items=ITEMS, dim_embed=8,
                item_features=feats, encoder_dims=(16,), l2_reconst=0.1)
    s = StratifiedPointwiseSampler(store, batch_size=64, seed=0)
    tr = Trainer(model, lr=0.01, seed=0)
    b = {k: jnp.asarray(v) for k, v in s.sample().items()}
    _, aux = model.loss(tr.params, b)
    assert "reconst_loss" in aux and float(aux["reconst_loss"]) > 0
    _train_decreases(model, iter(s), steps=40, lr=0.01)


def test_itr_mlp_lifecycle():
    store = _store()
    model = ItrMLP(total_users=USERS, total_items=ITEMS, dim_embed=8)
    tr = Trainer(model, lr=0.01, seed=0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 8), minval=-0.5,
                           maxval=0.5)
    before = float(jnp.mean(jnp.abs(
        model._user_mlp.apply(tr.params["user_mlp"], x) - x)))
    params = model.pretrain_identity(tr.params, jax.random.PRNGKey(0),
                                     steps=300)
    # Identity pretraining shrinks |MLP(x) - x| (the relu output layer —
    # reference relu_out=True — caps how close it can get for x < 0).
    after = float(jnp.mean(jnp.abs(
        model._user_mlp.apply(params["user_mlp"], x) - x)))
    assert after < before, (before, after)
    tr.params = params

    s = StratifiedPointwiseSampler(store, batch_size=64, seed=0)
    for i, b in enumerate(iter(s)):
        if i >= 10:
            break
        tr.train_step(b)
    # flags recorded
    assert np.asarray(tr.params["user_flag"]).sum() > 0
    before = np.asarray(tr.params["user_embed"]).copy()
    tr.params = model.update_embeddings(tr.params)
    assert np.asarray(tr.params["user_flag"]).sum() == 0
    assert not np.allclose(np.asarray(tr.params["user_embed"]), before)


def test_rnn_rec_full_and_sampled_softmax():
    store = _store(timestamps=True)
    s = TemporalSampler(store, batch_size=32, max_seq_len=5, seed=0)
    model = RNNRec(total_items=ITEMS, dim_item_embed=8, max_seq_len=5,
                   num_units=16)
    tr = _train_decreases(model, iter(s), steps=30, lr=0.01)
    scores = np.asarray(tr._score(tr.params, s.sample()))
    assert scores.shape == (32, ITEMS)

    model_s = RNNRec(total_items=ITEMS, dim_item_embed=8, max_seq_len=5,
                     num_units=16, softmax_samples=20)
    _train_decreases(model_s, iter(s), steps=30, lr=0.01)


def test_rnn_rec_lstm_cell():
    store = _store(timestamps=True)
    s = TemporalSampler(store, batch_size=16, max_seq_len=4, seed=0)
    model = RNNRec(total_items=ITEMS, dim_item_embed=8, max_seq_len=4,
                   num_units=8, cell_type="lstm")
    _train_decreases(model, iter(s), steps=25, lr=0.01)


def test_youtube_recs():
    store = _store(timestamps=True)
    s = TemporalSampler(store, batch_size=32, max_seq_len=5, seed=0)
    model = VanillaYouTubeRec(total_items=ITEMS, dim_item_embed=8,
                              max_seq_len=5)
    _train_decreases(model, iter(s), steps=30, lr=0.01)

    rng = np.random.default_rng(0)
    gender = rng.integers(0, 3, USERS).astype(np.int32)
    geo = rng.integers(0, 10, USERS).astype(np.int32)

    def yt_batches():
        for b in iter(s):
            b = dict(b)
            b["user_gender"] = gender[b["user_id"]]
            b["user_geo"] = geo[b["user_id"]]
            yield b

    model2 = YouTubeRec(total_items=ITEMS, dim_item_embed=8, max_seq_len=5,
                        total_genders=3, total_geos=10,
                        dim_gender_embed=4, dim_geo_embed=4)
    _train_decreases(model2, yt_batches(), steps=30, lr=0.01)


def test_cached_scorer_matches_model_score():
    from openrec_tpu.serving import CachedDotProductScorer
    from openrec_tpu.models import BPR
    from openrec_tpu.modules.embedding import embedding_lookup

    model = BPR(total_users=USERS, total_items=ITEMS, dim_user_embed=8,
                dim_item_embed=8)
    params = model.init(jax.random.PRNGKey(0))
    scorer = CachedDotProductScorer(
        model, USERS, ITEMS,
        extract_user_vecs=lambda p, ids: embedding_lookup(p["user_embed"],
                                                          ids),
        extract_item_vecs=lambda p, ids: embedding_lookup(p["item_embed"],
                                                          ids),
        extract_item_bias=lambda p, ids: embedding_lookup(p["item_bias"],
                                                          ids),
        extract_batch_size=32)
    users = np.arange(10, dtype=np.int32)
    got = np.asarray(scorer.serve(params, users))
    want = np.asarray(model.score(params, {"user_id": jnp.asarray(users)}))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

    vals, idx = scorer.topk(params, users, k=5)
    np.testing.assert_allclose(np.asarray(vals),
                               np.sort(want, axis=1)[:, ::-1][:, :5],
                               rtol=1e-5, atol=1e-7)

    # the Pallas fused-kernel route (interpret mode off-TPU) returns the
    # same exact scores for every hit
    pv, pi = scorer.topk(params, users, k=5, method="pallas")
    np.testing.assert_allclose(
        np.take_along_axis(want, np.asarray(pi), axis=1),
        np.asarray(pv), rtol=1e-5, atol=1e-6)

    # two-level route (top-2 per bucket; the recall>=0.995 regime)
    pv2, pi2 = scorer.topk(params, users, k=5, method="pallas2",
                           recall_target=0.995)
    np.testing.assert_allclose(
        np.take_along_axis(want, np.asarray(pi2), axis=1),
        np.asarray(pv2), rtol=1e-5, atol=1e-6)


def test_dlrm_bfloat16_compute():
    kw = dict(m_spa=4, ln_emb=(20, 30), ln_bot=(8, 4), ln_top=(16, 1),
              dim_dense=3, loss_func="bce")
    m32 = DLRM(**kw)
    m16 = DLRM(compute_dtype="bfloat16", **kw)
    params = m32.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {"dense_features": jnp.asarray(
                 rng.normal(size=(64, 3)).astype(np.float32)),
             "sparse_features": jnp.asarray(np.stack(
                 [rng.integers(0, 20, 64), rng.integers(0, 30, 64)],
                 axis=1).astype(np.int32)),
             "label": jnp.asarray(
                 rng.integers(0, 2, 64).astype(np.float32))}
    l32, _ = m32.loss(params, batch)
    l16, _ = m16.loss(params, batch)
    assert l16.dtype == jnp.float32
    np.testing.assert_allclose(float(l16), float(l32), rtol=2e-2)
    # trains without NaN
    tr = Trainer(m16, lr=0.01, seed=0)
    for i in range(10):
        loss, _ = tr.train_step(batch)
    assert np.isfinite(float(loss))


def test_temporal_evaluation_flow():
    from openrec_tpu.data.samplers import TemporalEvaluationSampler
    store = _store(timestamps=True)
    model = RNNRec(total_items=ITEMS, dim_item_embed=8, max_seq_len=5,
                   num_units=16)
    tr = Trainer(model, lr=0.01, seed=0)
    from openrec_tpu.data.samplers import TemporalSampler
    s = TemporalSampler(store, batch_size=32, max_seq_len=5, seed=0)
    for i, b in enumerate(iter(s)):
        if i >= 20:
            break
        tr.train_step(b)
    ev = TemporalEvaluationSampler(store, batch_size=16, max_seq_len=5)
    res = tr.evaluate_temporal(ev, at=(10, 50))
    assert 0.0 <= res["AUC"] <= 1.0
    assert res["Recall"].shape == (2,)
    assert np.isfinite(res["NDCG"]).all()


def test_bf16_serving_cache_matches_fp32_ranking():
    """serve_dtype=bfloat16 halves cached-table HBM traffic (the serving
    throughput lever, benchmarks/retrieval_dtype.py); scores accumulate in
    fp32 so rankings only differ at near-ties. With well-separated scores
    the top-k must be identical to the fp32 cache."""
    from openrec_tpu.serving import CachedDotProductScorer

    users, items, dim, k = 20, 300, 16, 10
    rng = np.random.default_rng(0)
    U = rng.normal(size=(users, dim)).astype(np.float32)
    V = rng.normal(size=(items, dim)).astype(np.float32)
    # Separate item score levels by ~i so gaps dwarf bf16 rounding.
    b = np.arange(items, dtype=np.float32)[::-1].copy()
    params = {"U": jnp.asarray(U), "V": jnp.asarray(V), "b": jnp.asarray(b)}

    def mk(dt):
        return CachedDotProductScorer(
            None, users, items,
            extract_user_vecs=lambda p, i: p["U"][i],
            extract_item_vecs=lambda p, i: p["V"][i],
            extract_item_bias=lambda p, i: p["b"][i],
            serve_dtype=dt)

    ids = np.arange(users, dtype=np.int32)
    s32 = mk(jnp.float32)
    s16 = mk(jnp.bfloat16)
    sc32 = np.asarray(s32.serve(params, ids))
    sc16 = np.asarray(s16.serve(params, ids))
    assert sc16.dtype == np.float32          # fp32 accumulation + bias
    np.testing.assert_allclose(sc16, sc32, rtol=0, atol=0.15)
    _, i32 = s32.topk(params, ids, k)
    _, i16 = s16.topk(params, ids, k)
    np.testing.assert_array_equal(np.asarray(i16), np.asarray(i32))

    # eval_metrics always ranks in fp32; with separated scores the two
    # caches must agree exactly.
    pos = rng.integers(0, items, size=(users, 3)).astype(np.int32)
    excl = np.full((users, 2), -1, np.int32)
    m32 = s32.eval_metrics(params, ids, pos, excl, at=(10,), chunk=128)
    m16 = s16.eval_metrics(params, ids, pos, excl, at=(10,), chunk=128)
    for key in m32:
        np.testing.assert_allclose(np.asarray(m16[key]),
                                   np.asarray(m32[key]),
                                   rtol=1e-4, atol=1e-5, err_msg=key)
