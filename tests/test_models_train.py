"""End-to-end: models learn planted low-rank structure (SURVEY.md §4)."""

import numpy as np
import optax
import pytest

from openrec_tpu.data import Dataset
from openrec_tpu.models import BPR, GMF, PMF, UCML, WRMF
from openrec_tpu.training import Trainer

USERS, ITEMS = 64, 256


def _datasets(low_rank_split):
    train, test = low_rank_split
    train_ds = Dataset(train, USERS, ITEMS, seed=0)
    val_ds = Dataset(test, USERS, ITEMS, seed=0)
    return train_ds, val_ds


def _fit_and_eval(model, train_batches, val_ds, train_ds, iters=1000,
                  lr=0.05):
    tr = Trainer(model, optimizer=optax.adam(lr), seed=0)
    for i, batch in enumerate(train_batches):
        if i >= iters:
            break
        tr.train_step(batch)
    if hasattr(train_batches, "stop"):
        train_batches.stop()
    res = tr.evaluate(val_ds.evaluation(batch_size=32,
                                        excl_datasets=[train_ds]),
                      at=(50,))
    return res


def test_bpr_learns_low_rank(low_rank_split):
    train_ds, val_ds = _datasets(low_rank_split)
    model = BPR(total_users=USERS, total_items=ITEMS, dim_user_embed=16,
                dim_item_embed=16, l2_weight=0.0001)
    res = _fit_and_eval(model, train_ds.pairwise(batch_size=512),
                        val_ds, train_ds)
    assert res["AUC"] > 0.8, res
    assert res["Recall"][0] > 0.5, res


def test_ucml_learns_and_censors(low_rank_split):
    train_ds, val_ds = _datasets(low_rank_split)
    model = UCML(total_users=USERS, total_items=ITEMS, dim_user_embed=16,
                 dim_item_embed=16, margin=0.5, l2_weight=0.0)
    # Default optimizer = lazy_adam: rows untouched since their last censor
    # get no update, so the unit-ball invariant holds (keras-Adam parity).
    tr = Trainer(model, lr=0.05, seed=0)
    batches = train_ds.pairwise(batch_size=256)
    for i, batch in enumerate(batches):
        if i >= 800:
            break
        tr.train_step(batch)
    batches.stop()
    # Post-step censoring keeps touched rows inside the unit ball.
    norms = np.linalg.norm(np.asarray(tr.params["item_embed"]), axis=1)
    assert norms.max() <= 1.0 + 1e-4
    res = tr.evaluate(val_ds.evaluation(batch_size=32,
                                        excl_datasets=[train_ds]), at=(50,))
    assert res["AUC"] > 0.75, res


def test_wrmf_learns(low_rank_split):
    train_ds, val_ds = _datasets(low_rank_split)
    model = WRMF(total_users=USERS, total_items=ITEMS, dim_user_embed=16,
                 dim_item_embed=16, a=1.0, b=0.01, l2_weight=0.001)
    res = _fit_and_eval(
        model, train_ds.stratified_pointwise(batch_size=256, pos_ratio=0.5),
        val_ds, train_ds, iters=1000, lr=0.02)
    assert res["AUC"] > 0.75, res


def test_gmf_learns(low_rank_split):
    train_ds, val_ds = _datasets(low_rank_split)
    model = GMF(total_users=USERS, total_items=ITEMS, dim_user_embed=16,
                dim_item_embed=16, l2_weight=0.0005)
    res = _fit_and_eval(
        model, train_ds.stratified_pointwise(batch_size=512, pos_ratio=0.5),
        val_ds, train_ds, iters=1500, lr=0.05)
    assert res["AUC"] > 0.72, res


def test_pmf_trains_without_nan(low_rank_split):
    train_ds, val_ds = _datasets(low_rank_split)
    model = PMF(total_users=USERS, total_items=ITEMS, dim_user_embed=16,
                dim_item_embed=16, a=1.0, b=0.1, l2_reg=0.001)
    tr = Trainer(model, optimizer=optax.adam(0.01), seed=0)
    batches = train_ds.stratified_pointwise(batch_size=128)
    losses = []
    for i, batch in enumerate(batches):
        if i >= 50:
            break
        loss, _ = tr.train_step(batch)
        losses.append(float(loss))
    batches.stop()
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
