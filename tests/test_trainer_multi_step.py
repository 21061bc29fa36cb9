"""Fused multi-step training == sequential single steps."""

import numpy as np

from openrec_tpu.data.samplers import PairwiseSampler
from openrec_tpu.data.store import InteractionStore
from openrec_tpu.models import BPR, UCML
from openrec_tpu.training import Trainer
from tests.conftest import make_interactions


def _batches(n, seed=0):
    store = InteractionStore(make_interactions(), 40, 100, seed=seed)
    s = PairwiseSampler(store, batch_size=32, seed=seed)
    return [s.sample() for _ in range(n)]


def test_multi_step_matches_sequential():
    batches = _batches(6)
    model = BPR(total_users=40, total_items=100, dim_user_embed=8,
                dim_item_embed=8)

    tr_seq = Trainer(model, lr=0.01, seed=0)
    seq_losses = [float(tr_seq.train_step(b)[0]) for b in batches]

    tr_multi = Trainer(model, lr=0.01, seed=0)
    multi_losses = np.asarray(tr_multi.train_step_multi(batches))

    np.testing.assert_allclose(multi_losses, seq_losses, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tr_multi.params["item_embed"]),
                               np.asarray(tr_seq.params["item_embed"]),
                               rtol=1e-5, atol=1e-7)
    assert tr_multi.global_step == tr_seq.global_step == 6


def test_multi_step_runs_post_step_hooks():
    batches = _batches(4)
    model = UCML(total_users=40, total_items=100, dim_user_embed=8,
                 dim_item_embed=8, l2_weight=0.0)
    tr = Trainer(model, lr=0.05, seed=0)
    tr.train_step_multi(batches)
    touched = np.unique(np.concatenate(
        [np.concatenate([b["p_item_id"], b["n_item_id"]])
         for b in batches[-1:]]))
    norms = np.linalg.norm(
        np.asarray(tr.params["item_embed"])[touched], axis=1)
    assert norms.max() <= 1.0 + 1e-4


def test_train_loop_with_steps_per_call():
    store = InteractionStore(make_interactions(), 40, 100, seed=0)
    s = PairwiseSampler(store, batch_size=32, seed=0)
    model = BPR(total_users=40, total_items=100, dim_user_embed=8,
                dim_item_embed=8)
    tr = Trainer(model, lr=0.01, seed=0)
    tr.train(total_iter=20, train_batches=iter(s), steps_per_call=5)
    assert tr.global_step == 20


def test_trainer_sparse_tables_mode():
    specs = {"user_embed": ["user_id"],
             "item_embed": ["p_item_id", "n_item_id"],
             "item_bias": ["p_item_id", "n_item_id"]}
    batches = _batches(6)
    model = BPR(total_users=40, total_items=100, dim_user_embed=8,
                dim_item_embed=8, l2_weight=0.0)
    tr = Trainer(model, lr=0.01, seed=0, sparse_tables=specs)
    losses = [float(tr.train_step(b)[0]) for b in batches[:3]]
    assert np.isfinite(losses).all()
    # fused path with sparse core
    ls = tr.train_step_multi(batches[3:])
    assert np.isfinite(np.asarray(ls)).all()
    assert tr.global_step == 6
    # device loop with sparse core
    from openrec_tpu.data.device_sampler import DevicePairwiseSampler
    from openrec_tpu.data.store import InteractionStore
    store = InteractionStore(make_interactions(), 40, 100, seed=0)
    s = DevicePairwiseSampler(store, batch_size=32)
    ls = tr.train_steps_device(s, 5)
    assert np.isfinite(np.asarray(ls)).all()
    assert tr.global_step == 11


def test_train_flat_feed_matches_manual_flat():
    """feed='flat' (the public fused live path, VERDICT r4 #3) is
    bit-identical to hand-feeding train_step_multi_flat."""
    from openrec_tpu.models import BPR as _BPR

    store = InteractionStore(make_interactions(), 40, 100, seed=0)
    s = PairwiseSampler(store, batch_size=5 * 32, seed=0)
    flat_batches = [s.sample() for _ in range(4)]
    model = _BPR(total_users=40, total_items=100, dim_user_embed=8,
                 dim_item_embed=8)

    tr_a = Trainer(model, lr=0.01, seed=0)
    for b in flat_batches:
        tr_a.train_step_multi_flat(b, 5)

    tr_b = Trainer(model, lr=0.01, seed=0)
    tr_b.train(total_iter=20, train_batches=iter(flat_batches),
               steps_per_call=5, feed="flat", verbose=False)
    assert tr_b.global_step == 20
    np.testing.assert_array_equal(np.asarray(tr_a.params["item_embed"]),
                                  np.asarray(tr_b.params["item_embed"]))


def test_train_auto_detects_stacked_feed():
    """feed='auto' recognizes [k, B, ...] payloads and routes them
    through the fused dispatch — same math as train_step_multi."""
    batches = _batches(20)
    k = 5
    stacked = [{key: np.stack([b[key] for b in batches[i:i + k]])
                for key in batches[0]} for i in range(0, 20, k)]
    model = BPR(total_users=40, total_items=100, dim_user_embed=8,
                dim_item_embed=8)

    tr_a = Trainer(model, lr=0.01, seed=0)
    for i in range(0, 20, k):
        tr_a.train_step_multi(batches[i:i + k])

    tr_b = Trainer(model, lr=0.01, seed=0)
    tr_b.train(total_iter=20, train_batches=iter(stacked),
               steps_per_call=k, verbose=False)
    assert tr_b.global_step == 20
    np.testing.assert_array_equal(np.asarray(tr_a.params["item_embed"]),
                                  np.asarray(tr_b.params["item_embed"]))


def test_train_verbose_false_is_silent(capsys):
    store = InteractionStore(make_interactions(), 40, 100, seed=0)
    s = PairwiseSampler(store, batch_size=32, seed=0)
    model = BPR(total_users=40, total_items=100, dim_user_embed=8,
                dim_item_embed=8)
    tr = Trainer(model, lr=0.01, seed=0)
    tr.train(total_iter=4, train_batches=iter(s), steps_per_call=2,
             verbose=False)
    assert capsys.readouterr().out == ""
