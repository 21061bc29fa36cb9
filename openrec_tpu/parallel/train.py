"""Distributed train/eval step builders (pjit-style, GSPMD partitioning).

Design (SURVEY.md §7): batch shards over 'data', embedding tables shard rows
over 'model', dense towers replicate. One jit with sharding annotations —
XLA GSPMD inserts the collectives (grad psum over 'data', gather exchange
over 'model'), which ride ICI within a slice and DCN across hosts.

There is no reference counterpart (the reference is single-process,
single-device; SURVEY.md §2.9); the spec comes from the model zoo's needs.
"""

from __future__ import annotations

from functools import partial

import jax
import optax

from openrec_tpu.parallel.mesh import (
    DEFAULT_RULES, batch_sharding, replicated, shard_params)


def _opt_state_shardings(init_callable, params, param_shardings, mesh):
    """Moment buffers (same shape as a param) inherit that param's
    sharding; everything else (step counters etc.) replicates."""
    shapes = jax.eval_shape(init_callable, params)
    by_shape = {}
    for spec, leaf in zip(jax.tree_util.tree_leaves(param_shardings),
                          jax.tree_util.tree_leaves(params)):
        by_shape.setdefault(leaf.shape, spec)

    def pick(shape_struct):
        return by_shape.get(shape_struct.shape, replicated(mesh))

    return jax.tree_util.tree_map(pick, shapes)


def make_parallel_train_step(model, tx, mesh, rules=DEFAULT_RULES):
    """Returns (step_fn, init_fn).

    init_fn(rng) -> (params, opt_state, param_shardings) on the mesh.
    step_fn(params, opt_state, batch, rng)
                 -> (params, opt_state, loss, aux).

    Feed batches with `to_device(batch, batch_sharding(mesh))` so each host
    only transfers its shard; jit also accepts unplaced arrays and shards
    them on entry.
    """

    def init_fn(rng):
        params = model.init(rng)
        params, param_shardings = shard_params(params, mesh, rules)
        opt_state = jax.jit(
            tx.init,
            out_shardings=_opt_state_shardings(tx.init, params,
                                               param_shardings,
                                               mesh))(params)
        return params, opt_state, param_shardings

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, batch, rng):
        def loss_fn(p):
            return model.loss(p, batch, rng)
        (total, aux), grads = jax.value_and_grad(loss_fn,
                                                 has_aux=True)(params)
        grads = model.grad_transform(grads, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = model.post_step(params, batch)
        return params, opt_state, total, aux

    return step_fn, init_fn


def make_parallel_device_train_step(model, tx, mesh, sampler,
                                    steps_per_call: int = 1,
                                    rules=DEFAULT_RULES):
    """Distributed training with ON-DEVICE per-shard sampling: each data
    shard folds its mesh axis index into the step rng and draws a disjoint
    sample stream (the reference's duplicate-batch race fixed on device —
    SURVEY.md §5.2), so pod-scale input needs zero host CPU and zero
    host↔device transfers beyond one rng key per call.

    sampler: a Device*Sampler (data/device_sampler.py); its batch_size is
    PER data shard — the global batch is batch_size * mesh.shape['data'].

    Returns (step_fn, init_fn):
      init_fn(rng) -> (params, opt_state, param_shardings)
      step_fn(params, opt_state, rng) -> (params, opt_state, losses[k])
    """
    from jax.sharding import PartitionSpec as P

    from openrec_tpu.parallel.mesh import DATA_AXIS

    def init_fn(rng):
        params = model.init(rng)
        params, param_shardings = shard_params(params, mesh, rules)
        opt_state = jax.jit(
            tx.init,
            out_shardings=_opt_state_shardings(tx.init, params,
                                               param_shardings,
                                               mesh))(params)
        return params, opt_state, param_shardings

    keys = sorted(jax.eval_shape(
        lambda r: sampler.sample(r), jax.random.PRNGKey(0)).keys())

    def _sample_shard(rng):
        idx = jax.lax.axis_index(DATA_AXIS)
        batch = sampler.sample(jax.random.fold_in(rng, idx))
        return tuple(batch[k] for k in keys)

    sample_global = jax.shard_map(
        _sample_shard, mesh=mesh, in_specs=(P(None),),
        out_specs=tuple(P(DATA_AXIS) for _ in keys),
        check_vma=False)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, rng):
        def body(carry, step_rng):
            params, opt_state = carry
            r_sample, r_loss = jax.random.split(step_rng)
            batch = dict(zip(keys, sample_global(r_sample)))

            def loss_fn(p):
                return model.loss(p, batch, r_loss)
            (total, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            grads = model.grad_transform(grads, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = model.post_step(params, batch)
            return (params, opt_state), total

        rngs = jax.random.split(rng, steps_per_call)
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), rngs)
        return params, opt_state, losses

    return step_fn, init_fn


def make_parallel_device_sparse_train_step(model, table_specs, mesh,
                                           sampler,
                                           steps_per_call: int = 1,
                                           rules=DEFAULT_RULES, **hyper):
    """Giant-table pod-scale loop: per-shard ON-DEVICE sampling feeding
    the distributed O(batch) sparse step — input needs zero host CPU and
    zero host↔device transfers beyond one rng key per dispatch.

    Tables (and their Adam moments) row-shard over 'model'; each 'data'
    shard folds its mesh axis index into the rng and draws a disjoint
    batch stream (the same duplicate-batch-race fix as
    make_parallel_device_train_step); the sparse gather/scatter on the
    sharded row axis partitions via GSPMD.

    sampler: a Device*Sampler (data/device_sampler.py); its batch_size is
    PER data shard.

    steps_per_call > 1 scans the step — fine for sharded SMALL tables,
    but never scan multi-GB-per-shard tables: XLA copies scan carries it
    cannot alias (docs/PERF_NOTES.md). Keep the default 1 (per-step async
    pipelining) for Criteo-scale models.

    Returns (step_fn, init_fn):
      init_fn(rng) -> (params, opt_state, param_shardings)
      step_fn(params, opt_state, rng) -> (params, opt_state, losses[k])
      (losses always has shape [steps_per_call], matching
      make_parallel_device_train_step.)
    """
    from jax.sharding import PartitionSpec as P

    from openrec_tpu.parallel.mesh import DATA_AXIS
    from openrec_tpu.training.sparse import make_sparse_train_step

    init_state, _, step_core = make_sparse_train_step(model, table_specs,
                                                      **hyper)

    def init_fn(rng):
        params = model.init(rng)
        params, param_shardings = shard_params(params, mesh, rules)
        opt_state = jax.jit(
            init_state,
            out_shardings=_opt_state_shardings(init_state, params,
                                               param_shardings, mesh))(
            params)
        return params, opt_state, param_shardings

    keys = sorted(jax.eval_shape(
        lambda r: sampler.sample(r), jax.random.PRNGKey(0)).keys())

    def _sample_shard(rng):
        idx = jax.lax.axis_index(DATA_AXIS)
        batch = sampler.sample(jax.random.fold_in(rng, idx))
        return tuple(batch[k] for k in keys)

    sample_global = jax.shard_map(
        _sample_shard, mesh=mesh, in_specs=(P(None),),
        out_specs=tuple(P(DATA_AXIS) for _ in keys),
        check_vma=False)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, rng):
        def body(carry, step_rng):
            params, opt_state = carry
            r_sample, r_loss = jax.random.split(step_rng)
            batch = dict(zip(keys, sample_global(r_sample)))
            params, opt_state, loss = step_core(params, opt_state, batch,
                                                r_loss)
            return (params, opt_state), loss

        if steps_per_call == 1:
            # No scan for the single-step giant-table path (XLA copies
            # scan carries it cannot alias — docs/PERF_NOTES.md), but
            # keep the return shape [k]-uniform with
            # make_parallel_device_train_step so callers can always
            # index losses[i].
            (params, opt_state), loss = body((params, opt_state), rng)
            return params, opt_state, loss[None]
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            jax.random.split(rng, steps_per_call))
        return params, opt_state, losses

    return step_fn, init_fn


def make_parallel_sparse_train_step(model, table_specs, mesh,
                                    rules=DEFAULT_RULES, **hyper):
    """Distributed O(batch) sparse step: tables (and their Adam moments)
    row-shard over 'model', batches shard over 'data'; the gather/scatter
    pair on the sharded row axis is partitioned by GSPMD (routing rides
    ICI), and dense-tower grads psum over 'data'.

    Returns (step_fn, init_fn) like make_parallel_train_step.
    """
    from openrec_tpu.training.sparse import make_sparse_train_step

    _, _, step_core = make_sparse_train_step(model, table_specs, **hyper)

    init_state, _, _ = make_sparse_train_step(model, table_specs, **hyper)

    def init_fn(rng):
        params = model.init(rng)
        params, param_shardings = shard_params(params, mesh, rules)
        opt_state = jax.jit(
            init_state,
            out_shardings=_opt_state_shardings(init_state, params,
                                               param_shardings, mesh))(
            params)
        return params, opt_state, param_shardings

    step_fn = jax.jit(step_core, donate_argnums=(0, 1))
    return step_fn, init_fn


def make_parallel_eval_step(model, mesh, at=(50, 100)):
    """Eval step with users sharded over 'data': each device scores its
    users against the (possibly row-sharded) catalog and computes metrics;
    per-user outputs gather back to the host."""
    from openrec_tpu.metrics import AUC, NDCG, Precision, Recall

    bs = batch_sharding(mesh)
    at = tuple(at)

    @partial(jax.jit, in_shardings=(None, bs, bs, bs))
    def eval_step(params, user_id, pos_mask, excl_mask):
        pred = model.score(params, {"user_id": user_id})
        return {
            "AUC": AUC(pos_mask, pred, excl_mask),
            "Recall": Recall(pos_mask, pred, excl_mask, at=at),
            "NDCG": NDCG(pos_mask, pred, excl_mask, at=at),
            "Precision": Precision(pos_mask, pred, excl_mask, at=at),
        }

    return eval_step
