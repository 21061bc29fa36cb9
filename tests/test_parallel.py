"""Distributed layer on an 8-device CPU mesh — same pjit/shard_map code
paths as a real TPU slice (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from openrec_tpu.parallel import (
    batch_sharding, make_mesh, make_parallel_eval_step,
    make_parallel_train_step, pad_rows, sharded_lookup, sharded_scores,
    sharded_topk, shard_params)
from openrec_tpu.parallel.mesh import MODEL_AXIS, row_sharding
from openrec_tpu.data.pipeline import to_device
from openrec_tpu.models import BPR, DLRM
from openrec_tpu.training.optim import lazy_adam

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_sharded_lookup_matches_dense():
    mesh = make_mesh(data=2, model=4)
    rng = np.random.default_rng(0)
    V = pad_rows(100, 4)
    table_np = rng.normal(size=(V, 8)).astype(np.float32)
    ids_np = rng.integers(0, 100, size=(16,)).astype(np.int32)
    table = jax.device_put(table_np, row_sharding(mesh))
    rows = sharded_lookup(table, jnp.asarray(ids_np), mesh)
    np.testing.assert_allclose(np.asarray(rows), table_np[ids_np],
                               rtol=1e-6)


def test_sharded_lookup_gradients_flow():
    mesh = make_mesh(data=2, model=4)
    rng = np.random.default_rng(1)
    V = pad_rows(64, 4)
    table_np = rng.normal(size=(V, 4)).astype(np.float32)
    ids = jnp.asarray([3, 3, 10, 63])

    def loss_sharded(t):
        return jnp.sum(sharded_lookup(t, ids, mesh) ** 2)

    def loss_dense(t):
        return jnp.sum(jnp.take(t, ids, axis=0) ** 2)

    table = jax.device_put(table_np, row_sharding(mesh))
    g_sharded = jax.grad(loss_sharded)(table)
    g_dense = jax.grad(loss_dense)(jnp.asarray(table_np))
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_dense),
                               rtol=1e-5)


def test_sharded_scores_and_topk_match_dense():
    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(2)
    I = pad_rows(200, 8)
    V = rng.normal(size=(I, 16)).astype(np.float32)
    b = rng.normal(size=(I, 1)).astype(np.float32)
    U = rng.normal(size=(8, 16)).astype(np.float32)
    Vd = jax.device_put(V, row_sharding(mesh))
    bd = jax.device_put(b, row_sharding(mesh))
    scores = sharded_scores(jnp.asarray(U), Vd, bd, mesh)
    want = U @ V.T + b.reshape(1, -1)
    np.testing.assert_allclose(np.asarray(scores), want, rtol=1e-5)

    vals, idx = sharded_topk(scores, 10, mesh)
    dense_vals, dense_idx = jax.lax.top_k(jnp.asarray(want), 10)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(dense_vals),
                               rtol=1e-5)
    # indices can differ on exact ties; scores at those indices must match
    np.testing.assert_allclose(
        np.take_along_axis(want, np.asarray(idx), axis=1),
        np.asarray(dense_vals), rtol=1e-5)

    # approx phase-1 (TPU PartialReduce serving path): returned scores
    # must be exact at their ids; set recall vs dense exact >= 0.95.
    a_vals, a_idx = sharded_topk(scores, 10, mesh, approx=True)
    np.testing.assert_allclose(
        np.take_along_axis(want, np.asarray(a_idx), axis=1),
        np.asarray(a_vals), rtol=1e-5)
    di, ai = np.asarray(dense_idx), np.asarray(a_idx)
    recall = np.mean([len(set(di[r]) & set(ai[r])) / 10
                      for r in range(di.shape[0])])
    assert recall >= 0.95, recall


def test_sharded_pallas_topk():
    """Row-sharded fused Pallas retrieval (interpret mode off-TPU).

    Small case: <=128 rows per shard means every item sits in its own
    strided bucket, so the result must EXACTLY match the dense top-k.
    Large case: returned scores exact at their ids, recall >= 0.9.
    """
    from openrec_tpu.parallel import sharded_pallas_topk

    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(7)

    # exact regime (25 rows/shard -> all-distinct buckets)
    I, D, k = pad_rows(200, 8), 16, 10
    V = rng.normal(size=(I, D)).astype(np.float32)
    b = rng.normal(size=(I, 1)).astype(np.float32)
    U = rng.normal(size=(8, D)).astype(np.float32)
    vals, idx = sharded_pallas_topk(
        jnp.asarray(U), jax.device_put(V, row_sharding(mesh)),
        jax.device_put(b, row_sharding(mesh)), k, mesh)
    want = U @ V.T + b.reshape(1, -1)
    dv, di = jax.lax.top_k(jnp.asarray(want), k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(dv), rtol=1e-5)
    np.testing.assert_allclose(
        np.take_along_axis(want, np.asarray(idx), axis=1),
        np.asarray(dv), rtol=1e-5)

    # collision regime (2048 rows/shard), no bias
    I2 = 8 * 2048
    V2 = rng.normal(size=(I2, D)).astype(np.float32)
    U2 = rng.normal(size=(8, D)).astype(np.float32)
    vals2, idx2 = sharded_pallas_topk(
        jnp.asarray(U2), jax.device_put(V2, row_sharding(mesh)),
        None, k, mesh)
    want2 = U2 @ V2.T
    np.testing.assert_allclose(
        np.take_along_axis(want2, np.asarray(idx2), axis=1),
        np.asarray(vals2), rtol=1e-5)
    di2 = np.asarray(jax.lax.top_k(jnp.asarray(want2), k)[1])
    recall = np.mean([len(set(di2[r]) & set(np.asarray(idx2)[r])) / k
                      for r in range(8)])
    assert recall >= 0.9, recall

    # two-level variant (per_bucket=2): scores exact at their ids and
    # recall at least the top-1 kernel's on the same data
    vals3, idx3 = sharded_pallas_topk(
        jnp.asarray(U2), jax.device_put(V2, row_sharding(mesh)),
        None, k, mesh, per_bucket=2)
    np.testing.assert_allclose(
        np.take_along_axis(want2, np.asarray(idx3), axis=1),
        np.asarray(vals3), rtol=1e-5)
    recall2 = np.mean([len(set(di2[r]) & set(np.asarray(idx3)[r])) / k
                       for r in range(8)])
    assert recall2 >= recall, (recall, recall2)


def test_dp_train_step_matches_single_device():
    """Pure data parallelism must be numerically identical to one device."""
    mesh = make_mesh(data=8, model=1)
    model = BPR(total_users=32, total_items=64, dim_user_embed=8,
                dim_item_embed=8, l2_weight=0.0)
    tx = lazy_adam(0.01)
    step_fn, init_fn = make_parallel_train_step(
        model, tx, mesh, rules=())          # fully replicated params
    params, opt_state, _ = init_fn(jax.random.PRNGKey(0))

    rng = np.random.default_rng(3)
    batch_np = {
        "user_id": rng.integers(0, 32, 64).astype(np.int32),
        "p_item_id": rng.integers(0, 64, 64).astype(np.int32),
        "n_item_id": rng.integers(0, 64, 64).astype(np.int32),
    }
    batch = to_device(batch_np, batch_sharding(mesh))
    params2, _, loss_dp, _ = step_fn(params, opt_state, batch,
                                     jax.random.PRNGKey(1))

    # single-device oracle
    params_s = model.init(jax.random.PRNGKey(0))
    opt_s = tx.init(params_s)

    def loss_fn(p):
        return model.loss(p, {k: jnp.asarray(v)
                              for k, v in batch_np.items()})
    (loss_ref, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params_s)
    updates, _ = tx.update(grads, opt_s, params_s)
    params_ref = optax.apply_updates(params_s, updates)

    np.testing.assert_allclose(float(loss_dp), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(params2["item_embed"]),
                               np.asarray(params_ref["item_embed"]),
                               rtol=1e-4, atol=1e-6)


def test_model_parallel_dlrm_step_runs_and_is_finite():
    mesh = make_mesh(data=4, model=2)
    model = DLRM(m_spa=8, ln_emb=(64, 64, 256), ln_bot=(16, 8),
                 ln_top=(32, 1), dim_dense=4, loss_func="bce")
    tx = lazy_adam(1e-3)
    step_fn, init_fn = make_parallel_train_step(model, tx, mesh)
    params, opt_state, shardings = init_fn(jax.random.PRNGKey(0))
    # tables actually sharded on the model axis
    spec = shardings["embed_tables"][2].spec
    assert spec[0] == MODEL_AXIS

    rng = np.random.default_rng(4)
    B = 32
    batch = to_device({
        "dense_features": rng.normal(size=(B, 4)).astype(np.float32),
        "sparse_features": np.stack(
            [rng.integers(0, n, B) for n in (64, 64, 256)],
            axis=1).astype(np.int32),
        "label": rng.integers(0, 2, B).astype(np.float32),
    }, batch_sharding(mesh))
    for i in range(3):
        params, opt_state, loss, _ = step_fn(params, opt_state, batch,
                                             jax.random.PRNGKey(i))
    assert np.isfinite(float(loss))


def test_parallel_eval_step():
    mesh = make_mesh(data=8, model=1)
    model = BPR(total_users=32, total_items=64, dim_user_embed=8,
                dim_item_embed=8)
    params = model.init(jax.random.PRNGKey(0))
    eval_step = make_parallel_eval_step(model, mesh, at=(10,))
    rng = np.random.default_rng(5)
    B = 16
    out = eval_step(params,
                    jnp.asarray(rng.integers(0, 32, B).astype(np.int32)),
                    jnp.asarray(rng.random((B, 64)) < 0.1),
                    jnp.asarray(rng.random((B, 64)) < 0.05))
    assert out["AUC"].shape == (B,)
    assert np.isfinite(np.asarray(out["AUC"])).all()


def test_parallel_sparse_step_matches_single_device():
    from openrec_tpu.parallel.train import make_parallel_sparse_train_step
    from openrec_tpu.training.sparse import (
        dlrm_fused_table_spec, make_sparse_train_step)

    mesh = make_mesh(data=4, model=2)
    # row counts divisible by the model axis
    kw = dict(m_spa=8, ln_emb=(64, 128, 32), ln_bot=(8, 8), ln_top=(16, 1),
              dim_dense=3, loss_func="bce", fused_tables=True)
    model = DLRM(**kw)
    spec = dlrm_fused_table_spec(model)

    step_fn, init_fn = make_parallel_sparse_train_step(
        model, spec, mesh, learning_rate=0.01)
    params, opt_state, shardings = init_fn(jax.random.PRNGKey(0))
    assert shardings["embed_fused"].spec[0] == MODEL_AXIS

    rng = np.random.default_rng(0)
    B = 32
    batch_np = {
        "dense_features": rng.normal(size=(B, 3)).astype(np.float32),
        "sparse_features": np.stack(
            [rng.integers(0, c, B) for c in (64, 128, 32)],
            axis=1).astype(np.int32),
        "label": rng.integers(0, 2, B).astype(np.float32),
    }
    batch = to_device(batch_np, batch_sharding(mesh))
    for i in range(3):
        params, opt_state, loss = step_fn(params, opt_state, batch,
                                          jax.random.PRNGKey(i))
    assert np.isfinite(float(loss))

    # single-device oracle
    init_o, step_o, _ = make_sparse_train_step(model, spec,
                                               learning_rate=0.01)
    p = model.init(jax.random.PRNGKey(0))
    st = init_o(p)
    b = {k: jnp.asarray(v) for k, v in batch_np.items()}
    for i in range(3):
        p, st, loss_o = step_o(p, st, b, jax.random.PRNGKey(i))
    np.testing.assert_allclose(float(loss), float(loss_o), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(params["embed_fused"]),
                               np.asarray(p["embed_fused"]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["mlp_top"][0]["w"]),
                               np.asarray(p["mlp_top"][0]["w"]),
                               rtol=1e-4, atol=1e-6)


def test_device_sparse_step_matches_single_device_oracle():
    """make_parallel_device_sparse_train_step (on-device per-shard
    sampling + distributed O(batch) sparse step): on a data=1, model=4
    mesh the rng protocol is reproducible on one device — replaying
    sample(fold_in(r_sample, shard)) concatenated over shards through the
    unsharded sparse step must give numerically identical params."""
    from openrec_tpu.data.device_sampler import DevicePairwiseSampler
    from openrec_tpu.data import InteractionStore
    from openrec_tpu.parallel import make_parallel_device_sparse_train_step
    from openrec_tpu.training.sparse import make_sparse_train_step
    from conftest import make_interactions

    mesh = make_mesh(data=2, model=4)
    store = InteractionStore(make_interactions(num_users=24, num_items=64,
                                               per_user=6, seed=9),
                             24, 64, seed=0)
    model = BPR(total_users=24, total_items=64, dim_user_embed=8,
                dim_item_embed=8, l2_weight=0.0)
    sampler = DevicePairwiseSampler(store, batch_size=16)
    specs = {"user_embed": ["user_id"],
             "item_embed": ["p_item_id", "n_item_id"],
             "item_bias": ["p_item_id", "n_item_id"]}

    step_fn, init_fn = make_parallel_device_sparse_train_step(
        model, specs, mesh, sampler, learning_rate=0.01)
    params, opt_state, _ = init_fn(jax.random.PRNGKey(0))

    # single-device oracle with the same init and rng protocol
    o_init, o_step, _ = make_sparse_train_step(model, specs,
                                               learning_rate=0.01)
    o_params = model.init(jax.random.PRNGKey(0))
    o_opt = o_init(o_params)

    rng = jax.random.PRNGKey(42)
    for i in range(3):
        rng, step_rng = jax.random.split(rng)
        params, opt_state, losses = step_fn(params, opt_state, step_rng)
        assert losses.shape == (1,)     # uniform [k] shape (advisor r2)
        r_sample, r_loss = jax.random.split(step_rng)
        shard_batches = [sampler.sample(jax.random.fold_in(r_sample, s))
                         for s in range(2)]
        batch = {k: jnp.concatenate([b[k] for b in shard_batches])
                 for k in shard_batches[0]}
        o_params, o_opt, o_loss = o_step(o_params, o_opt, batch, r_loss)
        np.testing.assert_allclose(float(losses[0]), float(o_loss),
                                   rtol=1e-5)

    for k in params:
        np.testing.assert_allclose(np.asarray(params[k]),
                                   np.asarray(o_params[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)

    # scanned variant (small sharded tables) executes too
    step2, _ = make_parallel_device_sparse_train_step(
        model, specs, mesh, sampler, steps_per_call=3, learning_rate=0.01)
    params, opt_state, losses = step2(params, opt_state, rng)
    assert losses.shape == (3,)
    assert np.isfinite(np.asarray(losses)).all()


def test_parallel_trainer_device_sampled_sparse():
    """ParallelTrainer.train_steps_device with sparse_tables set routes
    through the device-sampled sparse step and trains."""
    from openrec_tpu.data.device_sampler import DevicePairwiseSampler
    from openrec_tpu.data import InteractionStore
    from openrec_tpu.training.parallel_trainer import ParallelTrainer
    from conftest import make_interactions

    mesh = make_mesh(data=2, model=4)
    store = InteractionStore(make_interactions(num_users=24, num_items=64,
                                               per_user=6, seed=9),
                             24, 64, seed=0)
    model = BPR(total_users=24, total_items=64, dim_user_embed=8,
                dim_item_embed=8, l2_weight=0.0)
    specs = {"user_embed": ["user_id"],
             "item_embed": ["p_item_id", "n_item_id"],
             "item_bias": ["p_item_id", "n_item_id"]}
    tr = ParallelTrainer(model, mesh, lr=0.01, sparse_tables=specs)
    sampler = DevicePairwiseSampler(store, batch_size=8)
    before = np.asarray(tr.params["user_embed"]).copy()
    losses = tr.train_steps_device(sampler, 1)
    assert losses.shape == (1,)
    assert np.isfinite(float(losses[0]))
    assert tr.global_step == 1
    assert not np.allclose(np.asarray(tr.params["user_embed"]), before)
