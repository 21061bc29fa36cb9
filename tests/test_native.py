"""Native C++ sampling library vs numpy oracles."""

import numpy as np
import pytest

from openrec_tpu import native
from openrec_tpu.data.samplers import PairwiseSampler
from openrec_tpu.data.store import InteractionStore
from tests.conftest import make_interactions

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _store():
    return InteractionStore(make_interactions(), 40, 100, seed=0)


def test_is_positive_matches_store():
    store = _store()
    rng = np.random.default_rng(0)
    users = rng.integers(0, 40, 500)
    items = rng.integers(0, 100, 500)
    want = store.is_positive(users, items)
    got = native.is_positive(store._pos_keys, users, items, 100)
    np.testing.assert_array_equal(got, want)


def test_sample_negatives_never_positive():
    store = _store()
    users = np.repeat(np.arange(40), 25)
    negs = native.sample_negatives(store._pos_keys, users, 100, seed=7)
    assert not store.is_positive(users, negs).any()
    assert negs.min() >= 0 and negs.max() < 100


def test_negatives_roughly_uniform():
    store = _store()
    users = np.zeros(20000, dtype=np.int64)
    negs = native.sample_negatives(store._pos_keys, users, 100, seed=3)
    counts = np.bincount(negs, minlength=100).astype(float)
    valid = np.setdiff1d(np.arange(100), store.get_positive_items(0))
    expected = 20000 / len(valid)
    assert counts[valid].min() > expected * 0.5
    assert counts[valid].max() < expected * 1.5


def test_native_pairwise_sampler_valid_and_deterministic():
    store = _store()
    s1 = PairwiseSampler(store, 128, seed=5, use_native=True)
    b = s1.sample()
    assert store.is_positive(b["user_id"], b["p_item_id"]).all()
    assert not store.is_positive(b["user_id"], b["n_item_id"]).any()
    store2 = InteractionStore(make_interactions(), 40, 100, seed=0)
    s2 = PairwiseSampler(store2, 128, seed=5, use_native=True)
    b2 = s2.sample()
    for k in b:
        np.testing.assert_array_equal(b[k], b2[k])


def test_native_stratified_pointwise_valid_and_deterministic():
    from openrec_tpu.data.samplers import StratifiedPointwiseSampler

    store = _store()
    s = StratifiedPointwiseSampler(store, batch_size=200, pos_ratio=0.3,
                                   seed=5, use_native=True)
    assert s.use_native
    b = s.sample()
    lab = b["label"]
    assert lab.sum() == 60 and lab.dtype == np.float32
    # positives come from the record stream in epoch order semantics
    assert store.is_positive(b["user_id"][lab == 1],
                             b["item_id"][lab == 1]).all()
    assert not store.is_positive(b["user_id"][lab == 0],
                                 b["item_id"][lab == 0]).any()
    assert (b["user_id"][lab == 0] < 40).all()
    assert (b["item_id"][lab == 0] < 100).all()
    # deterministic under the same seed
    s2 = StratifiedPointwiseSampler(store, batch_size=200, pos_ratio=0.3,
                                    seed=5, use_native=True)
    b2 = s2.sample()
    for k in b:
        np.testing.assert_array_equal(b[k], b2[k])
    # numpy path shares the same record stream for positives
    s3 = StratifiedPointwiseSampler(store, batch_size=200, pos_ratio=0.3,
                                    seed=5, use_native=False)
    b3 = s3.sample()
    np.testing.assert_array_equal(b3["user_id"][:60], b["user_id"][:60])
    np.testing.assert_array_equal(b3["item_id"][:60], b["item_id"][:60])
