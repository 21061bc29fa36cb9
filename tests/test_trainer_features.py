"""Harness capabilities added for legacy-trainer parity:

- regression (MSE) evaluation mode (reference legacy/utils/evaluators/
  {evaluator,mse}.py + itr_mlp_model_trainer.py:50-76);
- update_interval/update_fn hook (ItrMLPModelTrainer's update_itr,
  itr_mlp_model_trainer.py:46-47) driving model.update_embeddings;
- per-user eval score dump (implicit_model_trainer.py:150-175);
- Trainer.train(scorer=...) interval eval through the chunked path.
"""

import os

import numpy as np
import jax

from conftest import make_interactions
from openrec_tpu.data import Dataset, InteractionStore
from openrec_tpu.data.samplers import EvaluationSampler, RegressionEvalSampler
from openrec_tpu.models import BPR, ItrMLP, PMF
from openrec_tpu.training import Trainer

AT = (5, 20)


def _rating_data(n_users=30, n_items=60, seed=0):
    base = make_interactions(num_users=n_users, num_items=n_items,
                             per_user=6, seed=seed)
    data = np.zeros(len(base), dtype=[("user_id", np.int32),
                                      ("item_id", np.int32),
                                      ("label", np.float32)])
    data["user_id"], data["item_id"] = base["user_id"], base["item_id"]
    rng = np.random.default_rng(seed)
    data["label"] = rng.uniform(0, 1, len(base)).astype(np.float32)
    return data


def test_regression_eval_matches_numpy_oracle():
    data = _rating_data()
    store = InteractionStore(data, 30, 60, seed=0)
    model = PMF(total_users=30, total_items=60, dim_user_embed=8, dim_item_embed=8)
    tr = Trainer(model, lr=0.01, seed=0)
    res = tr.evaluate(RegressionEvalSampler(store, batch_size=32))
    # numpy oracle: score rows, gather item, mean squared error
    rows = np.asarray(tr._score(
        tr.params, {"user_id": jax.numpy.asarray(data["user_id"])}))
    pred = rows[np.arange(len(data)), data["item_id"]]
    want = np.mean((pred - data["label"]) ** 2)
    np.testing.assert_allclose(float(res["MSE"]), want, rtol=1e-5)


def test_regression_eval_inside_train_loop():
    data = _rating_data()
    ds = Dataset(data, 30, 60, seed=0)
    model = PMF(total_users=30, total_items=60, dim_user_embed=8, dim_item_embed=8)
    tr = Trainer(model, lr=0.01, seed=0)
    res = tr.train(total_iter=4,
                   train_batches=ds.explicit(batch_size=16),
                   eval_samplers={"val": ds.regression_evaluation(32)},
                   eval_interval=2)
    assert "val" in res and np.isfinite(float(res["val"]["MSE"]))


def test_update_interval_hook_matches_manual_protocol():
    """Trainer.train(update_interval=k) must equal the hand-rolled loop:
    k steps, update_embeddings, k steps ... (same seeds)."""
    data = _rating_data(seed=3)
    model = ItrMLP(total_users=30, total_items=60, dim_embed=8)

    def manual():
        ds = Dataset(data, 30, 60, seed=0)
        tr = Trainer(model, lr=1e-3, seed=0)
        it = iter(ds.explicit(batch_size=16, chronological=True))
        upd = jax.jit(model.update_embeddings)
        for i in range(1, 7):
            tr.train_step(next(it))
            if i % 3 == 0:
                tr.params = upd(tr.params)
        return tr.params

    def via_hook():
        ds = Dataset(data, 30, 60, seed=0)
        tr = Trainer(model, lr=1e-3, seed=0)
        tr.train(total_iter=6,
                 train_batches=ds.explicit(batch_size=16,
                                           chronological=True),
                 update_interval=3)
        return tr.params

    a, b = manual(), via_hook()
    for k in ("user_embed", "item_embed", "user_mlp"):
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(a[k])[0]),
            np.asarray(jax.tree_util.tree_leaves(b[k])[0]),
            rtol=1e-6, err_msg=k)
    # the update hook actually forward-propagated touched rows: without
    # it the (frozen) tables never move
    ds = Dataset(data, 30, 60, seed=0)
    tr = Trainer(model, lr=1e-3, seed=0)
    frozen = np.asarray(tr.params["user_embed"])
    tr.train(total_iter=6,
             train_batches=ds.explicit(batch_size=16, chronological=True))
    np.testing.assert_array_equal(np.asarray(tr.params["user_embed"]),
                                  frozen)
    assert not np.allclose(np.asarray(a["user_embed"]), frozen)


def test_eval_score_dump(tmp_path):
    train = make_interactions(num_users=20, num_items=50, per_user=5,
                              seed=0)
    val = make_interactions(num_users=20, num_items=50, per_user=4, seed=1)
    train_store = InteractionStore(train, 20, 50, seed=0)
    val_store = InteractionStore(val, 20, 50, seed=0)
    model = BPR(total_users=20, total_items=50, dim_user_embed=8,
                dim_item_embed=8)
    tr = Trainer(model, lr=0.01, seed=0)
    path = str(tmp_path / "scores.npz")
    tr.evaluate(EvaluationSampler(val_store, 8, excl_stores=[train_store]),
                at=AT, dump_path=path)
    dump = np.load(path)
    assert sorted(dump["user_ids"].tolist()) == \
        sorted(val_store.warm_users().tolist())
    assert dump["scores"].shape == (len(dump["user_ids"]), 50)
    # dumped rows are the model's actual score rows
    want = np.asarray(tr._score(
        tr.params, {"user_id": jax.numpy.asarray(dump["user_ids"])}))
    np.testing.assert_allclose(dump["scores"], want, rtol=1e-6)


def test_train_with_scorer_interval_eval():
    """Trainer.train(scorer=...) runs interval eval through the chunked
    giant-catalog path and returns the same metrics as the dense path."""
    from openrec_tpu.modules.embedding import embedding_lookup
    from openrec_tpu.serving import CachedDotProductScorer

    train = make_interactions(num_users=25, num_items=70, per_user=6,
                              seed=2)
    val = make_interactions(num_users=25, num_items=70, per_user=4, seed=3)
    train_ds = Dataset(train, 25, 70, seed=0)
    val_store = InteractionStore(val, 25, 70, seed=0)
    train_store = train_ds.store
    model = BPR(total_users=25, total_items=70, dim_user_embed=8,
                dim_item_embed=8)

    def run(scorer):
        tr = Trainer(model, lr=0.01, seed=0)
        return tr.train(
            total_iter=4,
            train_batches=train_ds.pairwise(batch_size=32),
            eval_samplers={"val": EvaluationSampler(
                val_store, 8, excl_stores=[train_store],
                device_masks=True)},
            eval_interval=4, at=AT, scorer=scorer, eval_chunk=32)

    dense = run(None)
    scorer = CachedDotProductScorer(
        model, 25, 70,
        extract_user_vecs=lambda p, i: embedding_lookup(p["user_embed"], i),
        extract_item_vecs=lambda p, i: embedding_lookup(p["item_embed"], i),
        extract_item_bias=lambda p, i: embedding_lookup(p["item_bias"], i))
    chunked = run(scorer)
    for k in dense["val"]:
        np.testing.assert_allclose(np.asarray(chunked["val"][k]),
                                   np.asarray(dense["val"][k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_defer_metrics_matches_host_path(tmp_path):
    """defer_metrics=True (all metrics on device, one fetch at the end —
    the donation-poisoning-safe mode, docs/PERF_NOTES.md) must produce
    numerically identical loss/eval records to the default host path."""
    import json

    train = make_interactions(num_users=25, num_items=70, per_user=6,
                              seed=4)
    val = make_interactions(num_users=25, num_items=70, per_user=4, seed=5)
    train_ds = Dataset(train, 25, 70, seed=0)
    val_store = InteractionStore(val, 25, 70, seed=0)
    model = BPR(total_users=25, total_items=70, dim_user_embed=8,
                dim_item_embed=8)

    # one deterministic batch list reused by both runs
    it = iter(train_ds.pairwise(batch_size=32, num_parallel_calls=1))
    batches = [next(it) for _ in range(8)]

    def run(defer, log):
        tr = Trainer(model, lr=0.01, seed=0, log_file=str(log))
        res = tr.train(
            total_iter=8, train_batches=list(batches),
            eval_samplers={"val": EvaluationSampler(
                val_store, 8, excl_stores=[train_ds.store])},
            eval_interval=4, at=AT, defer_metrics=defer)
        with open(log) as f:
            recs = [json.loads(line) for line in f]
        return res, recs

    host_res, host_recs = run(False, tmp_path / "host.jsonl")
    dev_res, dev_recs = run(True, tmp_path / "dev.jsonl")

    assert len(host_recs) == len(dev_recs) == 2
    for hr, dr in zip(host_recs, dev_recs):
        assert hr["step"] == dr["step"]
        np.testing.assert_allclose(dr["loss"], hr["loss"], rtol=1e-5)
        for k in hr["eval"]["val"]:
            np.testing.assert_allclose(
                np.asarray(dr["eval"]["val"][k]),
                np.asarray(hr["eval"]["val"][k]),
                rtol=1e-5, atol=1e-6, err_msg=k)
    for k in host_res["val"]:
        np.testing.assert_allclose(np.asarray(dev_res["val"][k]),
                                   np.asarray(host_res["val"][k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_profile_writes_trace(tmp_path):
    """Trainer.profile produces a device trace directory (the tracing
    subsystem the reference lacks — SURVEY.md §5.1; VERDICT r4 weak #5)."""
    import numpy as np

    from openrec_tpu.data.samplers import PairwiseSampler
    from openrec_tpu.data.store import InteractionStore
    from openrec_tpu.models import BPR
    from openrec_tpu.training import Trainer
    from tests.conftest import make_interactions

    store = InteractionStore(make_interactions(), 40, 100, seed=0)
    s = PairwiseSampler(store, batch_size=32, seed=0)
    model = BPR(total_users=40, total_items=100, dim_user_embed=8,
                dim_item_embed=8)
    tr = Trainer(model, lr=0.01, seed=0)
    trace_dir = tmp_path / "trace"
    out = tr.profile(iter(s), steps=3, trace_dir=str(trace_dir))
    assert out == str(trace_dir)
    produced = [p for p in trace_dir.rglob("*") if p.is_file()]
    assert produced, "profiler wrote no trace files"
    # params advanced by the profiled steps (compile step + 3 traced)
    assert tr.global_step == 4


def test_evaluate_shows_progress_on_tty(monkeypatch, capsys):
    """Long evals print an in-place progress line when stdout is a tty
    (parity with the reference's tqdm bar,
    implicit_model_trainer.py:137). Tty-gated so piped logs stay clean."""
    import sys

    import numpy as np

    from openrec_tpu.data import Dataset
    from openrec_tpu.models import BPR
    from openrec_tpu.training import Trainer
    from tests.conftest import make_interactions

    ds = Dataset(make_interactions(), 40, 100, seed=0)
    model = BPR(total_users=40, total_items=100, dim_user_embed=8,
                dim_item_embed=8)
    tr = Trainer(model, lr=0.01, seed=0)
    monkeypatch.setattr(sys.stdout, "isatty", lambda: True)
    # the progress line is throttled to one repaint per 0.5s; make every
    # clock read advance a full second so even a fast CPU eval paints it
    counter = {"t": 0.0}

    def fake_time():
        counter["t"] += 1.0
        return counter["t"]

    monkeypatch.setattr("openrec_tpu.training.trainer.time.time",
                        fake_time)
    res = tr.evaluate(ds.evaluation(batch_size=8), at=(10,))
    out = capsys.readouterr().out
    assert "eval batch" in out
    assert np.isfinite(res["AUC"])
