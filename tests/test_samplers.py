import numpy as np

from openrec_tpu.data import Dataset, InteractionStore
from openrec_tpu.data.samplers import (
    EvaluationSampler, NPairwiseSampler, PairwiseSampler,
    PerPosStratifiedPointwiseSampler, RandomPointwiseSampler,
    StratifiedPointwiseSampler, TemporalEvaluationSampler, TemporalSampler)
from tests.conftest import make_interactions


def _store(**kw):
    data = make_interactions(**kw)
    return InteractionStore(data, total_users=40, total_items=100, seed=0,
                            **({"sortby": "ts"} if kw.get("timestamps")
                               else {}))


def test_pairwise_sampler_shapes_and_validity():
    store = _store()
    s = PairwiseSampler(store, batch_size=64, seed=1)
    batch = s.sample()
    assert batch["user_id"].shape == (64,)
    assert store.is_positive(batch["user_id"], batch["p_item_id"]).all()
    assert not store.is_positive(batch["user_id"], batch["n_item_id"]).any()


def test_pairwise_native_seq_epoch_semantics():
    """The native sequential-window path (epoch shuffle applied to
    private record copies + block-prefetched negatives) keeps the
    every-record-once-per-epoch contract and valid triplets."""
    from openrec_tpu import native

    if not native.available():
        import pytest
        pytest.skip("native sampler unavailable")
    store = _store()
    s = PairwiseSampler(store, batch_size=50, seed=3)
    assert s.use_native
    n_rec = store.total_records()
    n_batches = (2 * n_rec) // 50
    pairs = []
    for _ in range(n_batches):
        b = s.sample()
        assert store.is_positive(b["user_id"], b["p_item_id"]).all()
        assert not store.is_positive(b["user_id"], b["n_item_id"]).any()
        pairs.append(np.stack([b["user_id"], b["p_item_id"]], axis=1))
    seen = np.concatenate(pairs)[:n_rec]
    want = np.stack([store._pos_users, store._pos_items], axis=1)
    # first epoch covers every record exactly once (any order)
    seen_keys = np.sort(seen[:, 0].astype(np.int64) * 100 + seen[:, 1])
    want_keys = np.sort(want[:, 0].astype(np.int64) * 100 + want[:, 1])
    np.testing.assert_array_equal(seen_keys, want_keys)
    # the store's own record arrays were not mutated by the shuffle
    assert store.is_positive(store._pos_users, store._pos_items).all()

    # worker clones draw their own independent (valid) streams
    clone = s.with_seed((3, 1))
    b1, b2 = s.sample(), clone.sample()
    assert not np.array_equal(b1["user_id"], b2["user_id"]) or \
        not np.array_equal(b1["p_item_id"], b2["p_item_id"])


def test_npairwise_sampler():
    store = _store()
    s = NPairwiseSampler(store, batch_size=16, num_negatives=5, seed=1)
    b = s.sample()
    assert b["n_item_id"].shape == (16, 5)
    u = np.repeat(b["user_id"], 5)
    assert not store.is_positive(u, b["n_item_id"].reshape(-1)).any()


def test_stratified_pointwise():
    store = _store()
    s = StratifiedPointwiseSampler(store, batch_size=100, pos_ratio=0.3,
                                   seed=2)
    b = s.sample()
    assert b["label"].sum() == 30
    pos_sel = b["label"] == 1.0
    assert store.is_positive(b["user_id"][pos_sel],
                             b["item_id"][pos_sel]).all()
    neg_sel = ~pos_sel
    assert not store.is_positive(b["user_id"][neg_sel],
                                 b["item_id"][neg_sel]).any()


def test_per_pos_stratified_pointwise():
    store = _store()
    s = PerPosStratifiedPointwiseSampler(store, batch_size=90, pos_ratio=0.5,
                                         seed=2)
    b = s.sample()
    assert b["user_id"].shape == (90,)
    pos_sel = b["label"] == 1.0
    assert store.is_positive(b["user_id"][pos_sel],
                             b["item_id"][pos_sel]).all()


def test_random_pointwise_labels_match_membership():
    store = _store()
    s = RandomPointwiseSampler(store, batch_size=200, seed=3)
    b = s.sample()
    expect = store.is_positive(b["user_id"], b["item_id"]).astype(np.float32)
    assert (b["label"] == expect).all()


def test_temporal_sampler_windows():
    store = _store(timestamps=True)
    s = TemporalSampler(store, batch_size=32, max_seq_len=5, seed=4)
    b = s.sample()
    assert b["seq_item_id"].shape == (32, 5)
    assert (b["seq_len"] >= 1).all() and (b["seq_len"] <= 5).all()
    # Window items + label are consecutive in the user's sorted history.
    for k in range(32):
        u = b["user_id"][k]
        hist = store.get_positive_items(u, sort=True).tolist()
        L = b["seq_len"][k]
        window = b["seq_item_id"][k][:L].tolist()
        label = b["label"][k]
        pos = hist.index(label)
        assert hist[pos - L:pos] == window
    # Padding is zero after seq_len.
    for k in range(32):
        assert (b["seq_item_id"][k][b["seq_len"][k]:] == 0).all()


def test_temporal_evaluation_last_item_holdout():
    store = _store(timestamps=True)
    s = TemporalEvaluationSampler(store, batch_size=16, max_seq_len=5)
    seen_users = []
    for b in s.epoch():
        for k in range(16):
            if not b["valid"][k]:
                continue
            u = b["user_id"][k]
            seen_users.append(u)
            hist = store.get_positive_items(u, sort=True).tolist()
            assert b["label"][k] == hist[-1]
            L = b["seq_len"][k]
            assert b["seq_item_id"][k][:L].tolist() == hist[-1 - L:-1]
    assert sorted(seen_users) == sorted(store.warm_users()[
        store.user_positive_counts()[store.warm_users()] > 1].tolist())


def test_evaluation_sampler_masks():
    train = make_interactions(seed=0)
    val = make_interactions(seed=5)
    train_store = InteractionStore(train, 40, 100, seed=0)
    val_store = InteractionStore(val, 40, 100, seed=0)
    ev = EvaluationSampler(val_store, batch_size=16,
                           excl_stores=[train_store])
    users_seen = 0
    for batch in ev:
        assert batch["pos_mask"].shape == (16, 100)
        for k in range(16):
            if not batch["valid"][k]:
                # padded row: everything excluded, nothing positive
                assert not batch["pos_mask"][k].any()
                assert batch["excl_mask"][k].all()
                continue
            users_seen += 1
            u = batch["user_id"][k]
            pos = set(val_store.get_positive_items(u).tolist())
            assert set(np.flatnonzero(batch["pos_mask"][k]).tolist()) == pos
            excl = set(np.flatnonzero(batch["excl_mask"][k]).tolist())
            train_pos = set(train_store.get_positive_items(u).tolist())
            assert excl == train_pos
    assert users_seen == len(val_store.warm_users())


def test_worker_seed_folding_gives_distinct_streams():
    store = _store()
    s = PairwiseSampler(store, batch_size=64, seed=1)
    a = s.with_seed((1, 0)).sample()
    b = s.with_seed((1, 1)).sample()
    assert not (a["user_id"] == b["user_id"]).all()


def test_dataset_facade_prefetch():
    data = make_interactions()
    ds = Dataset(data, 40, 100, seed=0)
    n = 0
    for batch in ds.pairwise(batch_size=32, num_parallel_calls=2, take=5):
        assert batch["user_id"].shape == (32,)
        n += 1
    assert n == 5


def test_evaluation_sampler_device_masks_match_host_masks():
    import jax.numpy as jnp
    from openrec_tpu.metrics.ranking import ids_to_masks

    train = make_interactions(seed=0)
    val = make_interactions(seed=5)
    train_store = InteractionStore(train, 40, 100, seed=0)
    val_store = InteractionStore(val, 40, 100, seed=0)
    host = list(EvaluationSampler(val_store, 16,
                                  excl_stores=[train_store]))
    dev = list(EvaluationSampler(val_store, 16,
                                 excl_stores=[train_store],
                                 device_masks=True))
    assert len(host) == len(dev)
    for hb, db in zip(host, dev):
        np.testing.assert_array_equal(hb["user_id"], db["user_id"])
        pos, excl = ids_to_masks(jnp.asarray(db["pos_ids"]),
                                 jnp.asarray(db["excl_ids"]), 100)
        # padded (invalid) rows differ by convention (host marks all
        # excluded); compare valid rows only
        v = hb["valid"]
        np.testing.assert_array_equal(np.asarray(pos)[v],
                                      hb["pos_mask"][v])
        np.testing.assert_array_equal(np.asarray(excl)[v],
                                      hb["excl_mask"][v])


def test_evaluation_sampler_device_masks_multi_excl_stores():
    """Regression: with >=2 excl stores the id path must concatenate all
    stores' exclusions (reference tf2 dataset.py:78-81), not clobber them,
    and pad to the summed width — id-path masks == mask-path masks."""
    import jax.numpy as jnp
    from openrec_tpu.metrics.ranking import ids_to_masks

    train = make_interactions(seed=0)
    val = make_interactions(seed=5)
    test = make_interactions(seed=9)
    train_store = InteractionStore(train, 40, 100, seed=0)
    val_store = InteractionStore(val, 40, 100, seed=0)
    test_store = InteractionStore(test, 40, 100, seed=0)
    host = list(EvaluationSampler(test_store, 16,
                                  excl_stores=[train_store, val_store]))
    dev = list(EvaluationSampler(test_store, 16,
                                 excl_stores=[train_store, val_store],
                                 device_masks=True))
    assert len(host) == len(dev)
    saw_multi = False
    for hb, db in zip(host, dev):
        np.testing.assert_array_equal(hb["user_id"], db["user_id"])
        pos, excl = ids_to_masks(jnp.asarray(db["pos_ids"]),
                                 jnp.asarray(db["excl_ids"]), 100)
        v = hb["valid"]
        np.testing.assert_array_equal(np.asarray(pos)[v],
                                      hb["pos_mask"][v])
        np.testing.assert_array_equal(np.asarray(excl)[v],
                                      hb["excl_mask"][v])
        # the scenario is only exercised if some user has exclusions in
        # both stores
        n_excl = (db["excl_ids"][v] >= 0).sum(axis=1)
        n_first = np.array([
            len(train_store.get_positive_items(u))
            for u in db["user_id"][v]])
        saw_multi |= bool((n_excl > n_first).any())
    assert saw_multi


def test_chronological_sampler_sequential_finite():
    """Legacy chronological mode (reference legacy pairwise_sampler.py:
    24-44): raw-data order, no shuffle, one epoch, partial batch dropped."""
    data = make_interactions()
    store = InteractionStore(data, 40, 100, seed=0)
    n = store.total_records()
    bs = 37
    s = PairwiseSampler(store, batch_size=bs, seed=3, chronological=True,
                        use_native=False)
    batches = list(s)
    assert len(batches) == n // bs
    got_u = np.concatenate([b["user_id"] for b in batches])
    got_p = np.concatenate([b["p_item_id"] for b in batches])
    lim = len(batches) * bs
    np.testing.assert_array_equal(got_u, data["user_id"][:lim])
    np.testing.assert_array_equal(got_p, data["item_id"][:lim])
    # negatives are never positives
    assert not store.is_positive(got_u, np.concatenate(
        [b["n_item_id"] for b in batches])).any()
    # deterministic under the same seed after reset
    s2 = PairwiseSampler(store, batch_size=bs, seed=3, chronological=True,
                         use_native=False)
    b2 = next(iter(s2))
    np.testing.assert_array_equal(b2["n_item_id"],
                                  batches[0]["n_item_id"])


def test_chronological_stratified_pointwise():
    """Legacy PointwiseSampler(chronological=True) counterpart: positives
    stream sequentially (unshuffled) and the epoch is finite."""
    data = make_interactions()
    store = InteractionStore(data, 40, 100, seed=0)
    s = StratifiedPointwiseSampler(store, batch_size=40, pos_ratio=0.5,
                                   seed=2, chronological=True)
    batches = list(s)
    assert len(batches) == store.total_records() // 20   # 20 pos per batch
    got_u = np.concatenate([b["user_id"][b["label"] == 1]
                            for b in batches])
    np.testing.assert_array_equal(got_u, data["user_id"][:len(got_u)])


def test_chronological_explicit_through_dataset_facade():
    data = make_interactions(timestamps=True)
    label = np.zeros(len(data), dtype=[("user_id", np.int32),
                                       ("item_id", np.int32),
                                       ("label", np.float32)])
    label["user_id"], label["item_id"] = data["user_id"], data["item_id"]
    label["label"] = np.arange(len(data), dtype=np.float32)
    ds = Dataset(label, 40, 100, seed=0)
    out = list(ds.explicit(batch_size=50, chronological=True))
    got = np.concatenate([b["label"] for b in out])
    np.testing.assert_array_equal(got, label["label"][:len(got)])
    assert len(out) == len(label) // 50


def test_regression_eval_sampler_covers_all_records():
    from openrec_tpu.data.samplers import RegressionEvalSampler
    data = make_interactions()
    label = np.zeros(len(data), dtype=[("user_id", np.int32),
                                       ("item_id", np.int32),
                                       ("label", np.float32)])
    label["user_id"], label["item_id"] = data["user_id"], data["item_id"]
    label["label"] = np.arange(len(data), dtype=np.float32)
    store = InteractionStore(label, 40, 100, seed=0)
    s = RegressionEvalSampler(store, batch_size=64)
    labels, n_valid = [], 0
    for b in s:
        assert b["user_id"].shape == (64,)
        labels.append(b["label"][b["valid"]])
        n_valid += int(b["valid"].sum())
    assert n_valid == len(label)
    np.testing.assert_array_equal(np.concatenate(labels), label["label"])


def test_prefetcher_two_workers_stress():
    """Concurrent workers must not corrupt shared state (regression for a
    race in the shared epoch-permutation stream)."""
    data = make_interactions()
    ds = Dataset(data, 40, 100, seed=0)
    n = 0
    for batch in ds.pairwise(batch_size=257, num_parallel_calls=2,
                             take=300):
        assert batch["user_id"].shape == (257,)
        n += 1
    assert n == 300
