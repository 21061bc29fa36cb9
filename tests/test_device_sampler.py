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
