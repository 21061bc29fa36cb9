import numpy as np
import pytest

from openrec_tpu.data import InteractionStore


def test_membership(interactions):
    store = InteractionStore(interactions, total_users=40, total_items=100,
                             seed=1)
    for row in interactions[:50]:
        assert store.is_positive(row["user_id"], row["item_id"])
    # Vectorized batch check agrees with scalar checks.
    u = np.asarray(interactions["user_id"][:50])
    i = np.asarray(interactions["item_id"][:50])
    assert store.is_positive(u, i).all()
    # Unobserved pairs are negative.
    assert not store.is_positive(0, 99) or (
        99 in set(store.get_positive_items(0).tolist()))


def test_negative_sampling_never_positive(interactions):
    store = InteractionStore(interactions, total_users=40, total_items=100,
                             seed=2)
    users = np.repeat(np.arange(40), 20)
    negs = store.sample_negative_items(users)
    assert not store.is_positive(users, negs).any()


def test_record_stream_is_epoch_shuffled(interactions):
    store = InteractionStore(interactions, total_users=40, total_items=100,
                             seed=3)
    n = len(interactions)
    epoch = store.next_random_records(n)
    # Every record exactly once per epoch.
    keys = set(zip(epoch["user_id"].tolist(), epoch["item_id"].tolist()))
    all_keys = set(zip(interactions["user_id"].tolist(),
                       interactions["item_id"].tolist()))
    assert keys == all_keys


def test_deterministic_given_seed(interactions):
    a = InteractionStore(interactions, 40, 100, seed=7)
    b = InteractionStore(interactions, 40, 100, seed=7)
    ua = a.next_random_records(64)
    ub = b.next_random_records(64)
    assert (ua == ub).all()
    assert (a.sample_negative_items(ua["user_id"])
            == b.sample_negative_items(ub["user_id"])).all()


def test_warm_users_and_counts(interactions):
    store = InteractionStore(interactions, 40, 100, seed=0)
    assert (store.user_positive_counts() == 8).all()
    assert len(store.warm_users()) == 40
    assert len(store.warm_users(threshold=9)) == 0


def test_sortby(interactions):
    pass  # covered in test_samplers temporal tests


def test_presampled_negatives(interactions):
    store = InteractionStore(interactions, 40, 100, seed=0,
                             num_negatives=10)
    assert store.contain_negatives()
    for u in range(5):
        negs = store.get_negative_items(u)
        assert len(negs) == 10
        assert not store.is_positive(np.full(10, u), negs).any()
    # sampling draws from the pre-sampled pool
    drawn = store.sample_negative_items(np.full(50, 3))
    pool = set(store.get_negative_items(3).tolist())
    assert set(drawn.tolist()) <= pool


def test_explicit_negative_labels():
    dtype = [("user_id", np.int32), ("item_id", np.int32),
             ("label", np.float32)]
    data = np.array([(0, 1, 1.0), (0, 2, 0.0), (1, 3, 5.0), (1, 4, 0.0)],
                    dtype=dtype)
    store = InteractionStore(data, 2, 5, implicit_negative=False)
    assert store.contain_negatives()
    assert store.is_positive(0, 1) and not store.is_positive(0, 2)
    assert store.get_negative_items(0).tolist() == [2]
    assert store.get_positive_items(1).tolist() == [3]


def test_bad_input_type():
    with pytest.raises(TypeError):
        InteractionStore([(0, 1)], 1, 2)
