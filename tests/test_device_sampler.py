"""On-device samplers: validity + fused device train loop."""

import jax
import jax.numpy as jnp
import numpy as np

from openrec_tpu.data.device_sampler import (
    DevicePairwiseSampler, DevicePointwiseSampler)
from openrec_tpu.data.store import InteractionStore
from openrec_tpu.models import BPR, WRMF
from openrec_tpu.training import Trainer
from tests.conftest import make_interactions, make_low_rank


def _store():
    return InteractionStore(make_interactions(), 40, 100, seed=0)


def test_device_pairwise_valid():
    store = _store()
    s = DevicePairwiseSampler(store, batch_size=256)
    batch = jax.jit(s.sample)(jax.random.PRNGKey(0))
    u = np.asarray(batch["user_id"])
    p = np.asarray(batch["p_item_id"])
    n = np.asarray(batch["n_item_id"])
    assert store.is_positive(u, p).all()
    assert not store.is_positive(u, n).any()
    # different keys → different batches
    b2 = jax.jit(s.sample)(jax.random.PRNGKey(1))
    assert not (np.asarray(b2["user_id"]) == u).all()


def test_device_pointwise_valid():
    store = _store()
    s = DevicePointwiseSampler(store, batch_size=200, pos_ratio=0.3)
    batch = jax.jit(s.sample)(jax.random.PRNGKey(0))
    u = np.asarray(batch["user_id"])
    i = np.asarray(batch["item_id"])
    lab = np.asarray(batch["label"])
    assert lab.sum() == 60
    assert store.is_positive(u[lab == 1], i[lab == 1]).all()
    assert not store.is_positive(u[lab == 0], i[lab == 0]).any()


def test_device_loop_learns_low_rank():
    train, test = make_low_rank()
    train_store = InteractionStore(train, 64, 256, seed=0)
    test_ds_store = InteractionStore(test, 64, 256, seed=0)
    model = BPR(total_users=64, total_items=256, dim_user_embed=16,
                dim_item_embed=16, l2_weight=1e-4)
    tr = Trainer(model, lr=0.05, seed=0)
    s = DevicePairwiseSampler(train_store, batch_size=512)
    for _ in range(5):
        losses = tr.train_steps_device(s, 200)
    assert np.isfinite(np.asarray(losses)).all()
    assert tr.global_step == 1000

    from openrec_tpu.data.samplers import EvaluationSampler
    ev = EvaluationSampler(test_ds_store, 32, excl_stores=[train_store])
    res = tr.evaluate(ev, at=(50,))
    assert res["AUC"] > 0.8, res


def test_device_pointwise_bitmap_fast_path():
    """The pointwise sampler shares the bitmap/int32 membership index."""
    store = _store()
    s = DevicePointwiseSampler(store, batch_size=200, pos_ratio=0.3,
                               membership="bitmap")
    assert s.membership == "bitmap"
    assert s._index._key_dtype == jnp.int32      # 40*100 pairs fit int32
    batch = jax.jit(s.sample)(jax.random.PRNGKey(0))
    u = np.asarray(batch["user_id"])
    i = np.asarray(batch["item_id"])
    lab = np.asarray(batch["label"])
    assert store.is_positive(u[lab == 1], i[lab == 1]).all()
    assert not store.is_positive(u[lab == 0], i[lab == 0]).any()
    s2 = DevicePointwiseSampler(store, batch_size=200,
                                membership="searchsorted")
    rng = np.random.default_rng(0)
    qu = jnp.asarray(rng.integers(0, 40, 500).astype(np.int32))
    qi = jnp.asarray(rng.integers(0, 100, 500).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(s.is_positive(qu, qi)),
                                  np.asarray(s2.is_positive(qu, qi)))


def test_device_temporal_matches_host_semantics():
    from openrec_tpu.data.device_sampler import DeviceTemporalSampler

    data = make_interactions(timestamps=True)
    store = InteractionStore(data, 40, 100, seed=0, sortby="ts")
    L = 5
    s = DeviceTemporalSampler(store, batch_size=128, max_seq_len=L)
    batch = jax.jit(s.sample)(jax.random.PRNGKey(0))
    seq = np.asarray(batch["seq_item_id"])
    seq_len = np.asarray(batch["seq_len"])
    labels = np.asarray(batch["label"])
    users = np.asarray(batch["user_id"])
    assert seq.shape == (128, L)
    for k in range(128):
        hist = store.get_positive_items(users[k], sort=True).tolist()
        assert len(hist) > 1
        # label is some position p in [1, len-1]; window is the L items
        # preceding it, zero-padded on the right
        p = hist.index(labels[k]) if labels[k] in hist else -1
        # labels may repeat in hist; find the position matching the window
        matched = False
        for p in range(1, len(hist)):
            if hist[p] != labels[k]:
                continue
            want_len = min(p, L)
            want = hist[p - want_len:p]
            if seq_len[k] == want_len and \
                    seq[k][:want_len].tolist() == want:
                matched = True
                break
        assert matched, (k, hist, seq[k], labels[k])
        assert (seq[k][seq_len[k]:] == 0).all()


def test_device_sampler_per_shard_streams_distinct():
    """fold_in(axis_index) — the mesh-aware stream split — must give each
    data shard a distinct sample stream."""
    store = _store()
    s = DevicePairwiseSampler(store, batch_size=64)
    key = jax.random.PRNGKey(7)
    b0 = s.sample(jax.random.fold_in(key, 0))
    b1 = s.sample(jax.random.fold_in(key, 1))
    assert not (np.asarray(b0["user_id"]) ==
                np.asarray(b1["user_id"])).all()


def test_parallel_device_train_step():
    """On-device sampling inside the GSPMD step over an 8-device mesh."""
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from openrec_tpu.parallel import (
        make_mesh, make_parallel_device_train_step)
    from openrec_tpu.training.optim import lazy_adam

    train, test = make_low_rank()
    train_store = InteractionStore(train, 64, 256, seed=0)
    model = BPR(total_users=64, total_items=256, dim_user_embed=16,
                dim_item_embed=16, l2_weight=1e-4)
    mesh = make_mesh(data=4, model=2)
    s = DevicePairwiseSampler(train_store, batch_size=128)  # per shard
    step_fn, init_fn = make_parallel_device_train_step(
        model, lazy_adam(0.05), mesh, s, steps_per_call=50)
    params, opt_state, _ = init_fn(jax.random.PRNGKey(0))
    first = None
    for i in range(6):
        params, opt_state, losses = step_fn(params, opt_state,
                                            jax.random.PRNGKey(i))
        if first is None:
            first = float(np.asarray(losses)[0])
    last = float(np.asarray(losses)[-1])
    assert np.isfinite(np.asarray(losses)).all()
    assert last < first, (first, last)    # it actually learns

    # quality: the parallel device-sampled path reaches the same AUC bar
    # as the single-device loop test above
    test_store = InteractionStore(test, 64, 256, seed=0)
    from openrec_tpu.data.samplers import EvaluationSampler
    from openrec_tpu.metrics import AUC, DictMean
    ev = EvaluationSampler(test_store, 32, excl_stores=[train_store])
    acc = DictMean({"AUC": []})
    gathered = jax.device_get(params)
    score = jax.jit(model.score)
    for b in ev:
        pred = score(gathered, {"user_id": jnp.asarray(b["user_id"])})
        acc.update_state(
            {"AUC": np.asarray(AUC(jnp.asarray(b["pos_mask"]), pred,
                                   jnp.asarray(b["excl_mask"])))},
            valid=b["valid"])
    assert acc.result()["AUC"] > 0.8, acc.result()


def test_device_pairwise_bitmap_membership():
    store = _store()
    s = DevicePairwiseSampler(store, batch_size=256, membership="bitmap")
    assert s.membership == "bitmap"
    batch = jax.jit(s.sample)(jax.random.PRNGKey(0))
    u = np.asarray(batch["user_id"])
    assert store.is_positive(u, np.asarray(batch["p_item_id"])).all()
    assert not store.is_positive(u, np.asarray(batch["n_item_id"])).any()
    # bitmap and searchsorted agree on membership queries
    s2 = DevicePairwiseSampler(store, batch_size=256,
                               membership="searchsorted")
    rng = np.random.default_rng(0)
    qu = jnp.asarray(rng.integers(0, 40, 500).astype(np.int32))
    qi = jnp.asarray(rng.integers(0, 100, 500).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(s.is_positive(qu, qi)),
                                  np.asarray(s2.is_positive(qu, qi)))


def test_device_sampler_state_is_numpy_not_device_arrays():
    """Regression (PERF_NOTES r4 'donation poisoning'): a device-array
    jit closure constant is fetched back to the host at lowering time,
    which permanently disables buffer donation process-wide on the axon
    backend. Sampler state must stay numpy."""
    import jax

    from openrec_tpu.data.device_sampler import (
        DevicePairwiseSampler, DevicePointwiseSampler,
        DeviceTemporalSampler)
    from tests.conftest import make_interactions
    from openrec_tpu.data import InteractionStore

    data = make_interactions(timestamps=True)
    store = InteractionStore(data, 40, 100, seed=0, sortby="ts")
    samplers = [DevicePairwiseSampler(store, 8),
                DevicePairwiseSampler(store, 8,
                                      membership="searchsorted"),
                DevicePointwiseSampler(store, 8),
                DeviceTemporalSampler(store, 8, max_seq_len=4)]
    for s in samplers:
        objs = [s] + ([s._index] if hasattr(s, "_index") else [])
        for obj in objs:
            for name, v in obj.__dict__.items():
                assert not isinstance(v, jax.Array), (
                    type(s).__name__, name, type(v))
