"""Catalog-scale eval paths (chunked + catalog-sharded) vs the dense
oracle (metrics/ranking.py, whose semantics are themselves tested against
the reference's formulas in test_metrics.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openrec_tpu.metrics import (
    AUC, NDCG, Precision, Recall, chunked_dot_eval_metrics)
from openrec_tpu.metrics.ranking import ids_to_masks
from openrec_tpu.parallel import (
    make_mesh, pad_rows, row_sharding, sharded_dot_eval_metrics,
    sharded_eval_metrics, sharded_scores)

AT = (5, 20)


def _case(seed=0, B=7, I=233, D=8, P=5, E=4):
    """Random users/catalog + padded pos/excl id lists (disjoint)."""
    rng = np.random.default_rng(seed)
    U = rng.normal(size=(B, D)).astype(np.float32)
    V = rng.normal(size=(I, D)).astype(np.float32)
    b = rng.normal(size=(I,)).astype(np.float32)
    pos_ids = np.full((B, P), -1, np.int32)
    excl_ids = np.full((B, E), -1, np.int32)
    for r in range(B):
        n_pos = rng.integers(1, P + 1)
        n_excl = rng.integers(0, E + 1)
        picks = rng.choice(I, size=n_pos + n_excl, replace=False)
        pos_ids[r, :n_pos] = picks[:n_pos]
        excl_ids[r, :n_excl] = picks[n_pos:]
    # One positive that is ALSO excluded (train/val overlap): the dense
    # path zeroes its transformed score; catalog-scale paths must match.
    excl_ids[0, -1] = pos_ids[0, 0]
    return U, V, b, pos_ids, excl_ids


def _oracle(U, V, b, pos_ids, excl_ids):
    I = V.shape[0]
    pred = jnp.asarray(U @ V.T + b[None, :])
    pos_m, excl_m = ids_to_masks(jnp.asarray(pos_ids),
                                 jnp.asarray(excl_ids), I)
    return {
        "AUC": AUC(pos_m, pred, excl_m),
        "Recall": Recall(pos_m, pred, excl_m, at=AT),
        "NDCG": NDCG(pos_m, pred, excl_m, at=AT),
        "Precision": Precision(pos_m, pred, excl_m, at=AT),
    }


def _assert_close(got, want):
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                    rtol=1e-5, atol=1e-6, err_msg=k)


def test_chunked_matches_dense():
    U, V, b, pos_ids, excl_ids = _case()
    want = _oracle(U, V, b, pos_ids, excl_ids)
    # chunk not dividing I, and a padded table with junk rows
    V_pad = np.concatenate([V, 999 * np.ones((23, V.shape[1]), np.float32)])
    b_pad = np.concatenate([b, 999 * np.ones((23,), np.float32)])
    got = chunked_dot_eval_metrics(U, V_pad, b_pad, pos_ids, excl_ids,
                                   total_items=V.shape[0], chunk=64, at=AT)
    _assert_close(got, want)


def test_chunked_no_bias_single_chunk():
    U, V, b, pos_ids, excl_ids = _case(seed=1)
    want = _oracle(U, V, np.zeros_like(b), pos_ids, excl_ids)
    got = chunked_dot_eval_metrics(U, V, None, pos_ids, excl_ids,
                                   total_items=V.shape[0], chunk=512, at=AT)
    _assert_close(got, want)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_dot_eval_matches_dense():
    mesh = make_mesh(data=1, model=8)
    U, V, b, pos_ids, excl_ids = _case(seed=2)
    want = _oracle(U, V, b, pos_ids, excl_ids)
    I_pad = pad_rows(V.shape[0], 8)
    V_pad = np.pad(V, ((0, I_pad - V.shape[0]), (0, 0)),
                   constant_values=999.0)
    b_pad = np.pad(b, (0, I_pad - V.shape[0]), constant_values=999.0)
    table = jax.device_put(jnp.asarray(V_pad), row_sharding(mesh))
    got = sharded_dot_eval_metrics(
        U, table, jnp.asarray(b_pad), jnp.asarray(pos_ids),
        jnp.asarray(excl_ids), total_items=V.shape[0], mesh=mesh, at=AT)
    _assert_close(got, want)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_eval_metrics_from_sharded_scores():
    """Pipeline: sharded_scores → sharded_eval_metrics, with a data axis."""
    mesh = make_mesh(data=2, model=4)
    U, V, b, pos_ids, excl_ids = _case(seed=3, B=8)
    want = _oracle(U, V, b, pos_ids, excl_ids)
    I_pad = pad_rows(V.shape[0], 4)
    V_pad = np.pad(V, ((0, I_pad - V.shape[0]), (0, 0)))
    b_pad = np.pad(b, (0, I_pad - V.shape[0]))[:, None]
    table = jax.device_put(jnp.asarray(V_pad), row_sharding(mesh))
    bias = jax.device_put(jnp.asarray(b_pad), row_sharding(mesh))
    scores = sharded_scores(jnp.asarray(U), table, bias, mesh)
    got = sharded_eval_metrics(scores, jnp.asarray(pos_ids),
                               jnp.asarray(excl_ids),
                               total_items=V.shape[0], mesh=mesh, at=AT)
    _assert_close(got, want)


def test_trainer_evaluate_with_scorer_matches_default():
    """Trainer.evaluate(scorer=...) — the chunked giant-catalog path —
    must agree with the default dense id-batch eval end-to-end."""
    from conftest import make_interactions
    from openrec_tpu.data import InteractionStore
    from openrec_tpu.data.samplers import EvaluationSampler
    from openrec_tpu.models import BPR
    from openrec_tpu.modules.embedding import embedding_lookup
    from openrec_tpu.serving import CachedDotProductScorer
    from openrec_tpu.training import Trainer

    train = make_interactions(num_users=30, num_items=80, per_user=6,
                              seed=5)
    val = make_interactions(num_users=30, num_items=80, per_user=4,
                            seed=6)
    train_store = InteractionStore(train, 30, 80, seed=0)
    val_store = InteractionStore(val, 30, 80, seed=0)
    model = BPR(total_users=30, total_items=80, dim_user_embed=8,
                dim_item_embed=8)
    tr = Trainer(model, lr=0.01, seed=0)
    scorer = CachedDotProductScorer(
        model, 30, 80,
        extract_user_vecs=lambda p, i: embedding_lookup(p["user_embed"], i),
        extract_item_vecs=lambda p, i: embedding_lookup(p["item_embed"], i),
        extract_item_bias=lambda p, i: embedding_lookup(p["item_bias"], i))

    def sampler():
        return EvaluationSampler(val_store, 16, excl_stores=[train_store],
                                 device_masks=True)

    want = tr.evaluate(sampler(), at=AT)
    got = tr.evaluate(sampler(), at=AT, scorer=scorer, eval_chunk=32)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]),
                                    np.asarray(want[k]),
                                    rtol=1e-5, atol=1e-6, err_msg=k)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_dot_eval_jits():
    """The fused path must compile under jit (how Trainer would call it)."""
    mesh = make_mesh(data=1, model=8)
    U, V, b, pos_ids, excl_ids = _case(seed=4)
    I_pad = pad_rows(V.shape[0], 8)
    V_pad = np.pad(V, ((0, I_pad - V.shape[0]), (0, 0)))
    b_pad = np.pad(b, (0, I_pad - V.shape[0]))
    table = jax.device_put(jnp.asarray(V_pad), row_sharding(mesh))

    @jax.jit
    def step(u, t, bb, p, e):
        return sharded_dot_eval_metrics(u, t, bb, p, e,
                                        total_items=V.shape[0],
                                        mesh=mesh, at=AT)

    got = step(jnp.asarray(U), table, jnp.asarray(b_pad),
               jnp.asarray(pos_ids), jnp.asarray(excl_ids))
    _assert_close(got, _oracle(U, V, b, pos_ids, excl_ids))
