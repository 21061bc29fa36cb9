"""ParallelTrainer: the Trainer harness over a data x model mesh."""

import numpy as np
import jax
import pytest

from conftest import make_low_rank
from openrec_tpu import ParallelTrainer
from openrec_tpu.data import Dataset, InteractionStore
from openrec_tpu.data.samplers import EvaluationSampler
from openrec_tpu.models import BPR
from openrec_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _setup():
    train, test = make_low_rank()
    train_ds = Dataset(train, 64, 256, seed=0)
    test_store = InteractionStore(test, 64, 256, seed=0)
    model = BPR(total_users=64, total_items=256, dim_user_embed=16,
                dim_item_embed=16, l2_weight=1e-4)
    return train_ds, test_store, model


def test_parallel_trainer_trains_evals_checkpoints(tmp_path):
    train_ds, test_store, model = _setup()
    mesh = make_mesh(data=4, model=2)
    pt = ParallelTrainer(model, mesh, lr=0.05, seed=0,
                         save_model_dir=str(tmp_path))
    res = pt.train(
        total_iter=200,
        train_batches=train_ds.pairwise(batch_size=256),
        eval_samplers={"val": EvaluationSampler(
            test_store, 32, excl_stores=[train_ds.store])},
        eval_interval=100, save_interval=100, at=(50,))
    assert float(res["val"]["AUC"]) > 0.75, res
    # tables actually sharded over the model axis
    spec = pt.params["item_embed"].sharding.spec
    assert spec[0] == "model", spec

    # restore into a FRESH trainer on a DIFFERENT mesh layout
    mesh2 = make_mesh(data=2, model=4)
    pt2 = ParallelTrainer(model, mesh2, lr=0.05, seed=1,
                          save_model_dir=str(tmp_path))
    pt2.restore()
    np.testing.assert_allclose(np.asarray(pt2.params["item_embed"]),
                               np.asarray(pt.params["item_embed"]),
                               rtol=1e-6)

    # id-batch (device_masks) eval path agrees with the mask path
    got = pt.evaluate(EvaluationSampler(test_store, 32,
                                        excl_stores=[train_ds.store],
                                        device_masks=True), at=(50,))
    np.testing.assert_allclose(float(got["AUC"]),
                               float(res["val"]["AUC"]), rtol=1e-5)


def test_parallel_trainer_device_sampled_loop():
    from openrec_tpu.data.device_sampler import DevicePairwiseSampler

    train_ds, test_store, model = _setup()
    mesh = make_mesh(data=4, model=2)
    pt = ParallelTrainer(model, mesh, lr=0.05, seed=0)
    sampler = DevicePairwiseSampler(train_ds.store, batch_size=64)
    first = None
    for i in range(4):
        losses = pt.train_steps_device(sampler, 50)
        if first is None:
            first = float(np.asarray(losses)[0])
    assert pt.global_step == 200
    assert np.isfinite(np.asarray(losses)).all()
    assert float(np.asarray(losses)[-1]) < first


def test_parallel_trainer_multi_step_matches_single_device():
    """Host-fed fused K-step on the mesh (train_step_multi /
    train_step_multi_flat) == the single-device Trainer on the same
    batches (VERDICT r3 #3: the mesh path used to raise)."""
    from openrec_tpu import Trainer
    from openrec_tpu.data.samplers import PairwiseSampler

    train_ds, test_store, model = _setup()
    sampler = PairwiseSampler(train_ds.store, batch_size=64, seed=3)
    it = iter(sampler)
    batches = [next(it) for _ in range(12)]

    mesh = make_mesh(data=4, model=2)
    pt = ParallelTrainer(model, mesh, lr=0.05, seed=0)
    single = Trainer(model, lr=0.05, seed=0)

    # fused K=4 dispatches on both paths
    for i in range(0, 8, 4):
        pt.train_step_multi(batches[i:i + 4])
        single.train_step_multi(batches[i:i + 4])
    # and the flat-feed variant (one k*B batch)
    flat = {k: np.concatenate([b[k] for b in batches[8:]])
            for k in batches[0]}
    losses_p = pt.train_step_multi_flat(flat, 4)
    losses_s = single.train_step_multi_flat(flat, 4)
    assert pt.global_step == single.global_step == 12

    np.testing.assert_allclose(np.asarray(losses_p), np.asarray(losses_s),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pt.params["item_embed"]),
                               np.asarray(single.params["item_embed"]),
                               rtol=1e-4, atol=1e-6)
    # stacked batches actually shard over 'data' (not replicated):
    # verified indirectly by params staying sharded through the fused step
    assert pt.params["item_embed"].sharding.spec[0] == "model"


def test_parallel_trainer_multi_step_sparse_tables():
    """Fused K-step with sparse_tables on the mesh == single-device
    sparse trainer on the same batches."""
    from openrec_tpu import Trainer
    from openrec_tpu.models import DLRM
    from openrec_tpu.training.sparse import dlrm_fused_table_spec

    mesh = make_mesh(data=4, model=2)
    model = DLRM(m_spa=8, ln_emb=(64, 128, 32), ln_bot=(8, 8),
                 ln_top=(16, 1), dim_dense=3, loss_func="bce",
                 fused_tables=True)
    spec = dlrm_fused_table_spec(model)
    pt = ParallelTrainer(model, mesh, lr=0.01, seed=0,
                         sparse_tables=spec)
    single = Trainer(model, lr=0.01, seed=0, sparse_tables=spec)
    rng = np.random.default_rng(0)
    B = 32

    def mk():
        return {
            "dense_features": rng.normal(size=(B, 3)).astype(np.float32),
            "sparse_features": np.stack(
                [rng.integers(0, c, B) for c in (64, 128, 32)],
                axis=1).astype(np.int32),
            "label": rng.integers(0, 2, B).astype(np.float32),
        }

    batches = [mk() for _ in range(4)]
    lp = pt.train_step_multi(batches)
    ls = single.train_step_multi(batches)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ls), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pt.params["embed_fused"]),
                               np.asarray(single.params["embed_fused"]),
                               rtol=1e-4, atol=1e-6)


def test_parallel_trainer_sparse_tables():
    from openrec_tpu.models import DLRM
    from openrec_tpu.training.sparse import dlrm_fused_table_spec

    mesh = make_mesh(data=4, model=2)
    model = DLRM(m_spa=8, ln_emb=(64, 128, 32), ln_bot=(8, 8),
                 ln_top=(16, 1), dim_dense=3, loss_func="bce",
                 fused_tables=True)
    pt = ParallelTrainer(model, mesh, lr=0.01, seed=0,
                         sparse_tables=dlrm_fused_table_spec(model))
    assert pt.params["embed_fused"].sharding.spec[0] == "model"
    rng = np.random.default_rng(0)
    B = 32
    batch = {
        "dense_features": rng.normal(size=(B, 3)).astype(np.float32),
        "sparse_features": np.stack(
            [rng.integers(0, c, B) for c in (64, 128, 32)],
            axis=1).astype(np.int32),
        "label": rng.integers(0, 2, B).astype(np.float32),
    }
    losses = [float(pt.train_step(batch)[0]) for _ in range(5)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_parallel_trainer_fused_flat_feed():
    """The public flat feed (train(feed='flat')) on the mesh: payloads
    shard over 'data' via the sharding hook and match the per-step
    oracle's math (same seed → same rng stream → identical params)."""
    import jax
    import numpy as np

    from openrec_tpu.data.samplers import PairwiseSampler
    from openrec_tpu.data.store import InteractionStore
    from openrec_tpu.models import BPR
    from openrec_tpu.parallel.mesh import make_mesh
    from openrec_tpu.training.parallel_trainer import ParallelTrainer
    from tests.conftest import make_interactions

    mesh = make_mesh(data=4, model=2)
    store = InteractionStore(make_interactions(), 40, 100, seed=0)
    k, B = 3, 32
    s = PairwiseSampler(store, batch_size=k * B, seed=0)
    flat_batches = [s.sample() for _ in range(4)]
    model = BPR(total_users=40, total_items=100, dim_user_embed=8,
                dim_item_embed=8)

    tr_a = ParallelTrainer(model, mesh, lr=0.01, seed=0)
    for b in flat_batches:
        stacked = {key: np.asarray(v).reshape((k, -1))
                   for key, v in b.items()}
        tr_a._dispatch_multi(stacked, k)

    tr_b = ParallelTrainer(model, mesh, lr=0.01, seed=0)
    tr_b.train(total_iter=k * 4, train_batches=iter(flat_batches),
               steps_per_call=k, feed="flat", verbose=False)
    assert tr_b.global_step == k * 4
    np.testing.assert_array_equal(np.asarray(tr_a.params["item_embed"]),
                                  np.asarray(tr_b.params["item_embed"]))
    # payloads actually sharded: the feed hook produces a data-axis spec
    sh = tr_b._multi_feed_sharding()
    assert sh.spec == jax.sharding.PartitionSpec(None, "data")
