"""ParallelTrainer — the Trainer harness over a jax.sharding.Mesh.

Gives the multi-chip path the same UX as the single-device Trainer
(iteration loop, interval eval/save, colored logging, JSONL, score dump):
batches shard over the 'data' axis, embedding tables row-shard over
'model' (parallel/train.py builders), checkpoints write per-process
shards with a manifest and restore into ANY mesh layout
(parallel/checkpoint.py).

No reference counterpart (the reference is single-process/single-device —
SURVEY.md §2.9); this is the pod-scale face of the harness.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from openrec_tpu.training.trainer import Trainer


class ParallelTrainer(Trainer):

    def __init__(self, model, mesh, optimizer=None, lr: float = 1e-3,
                 seed: int = 0,
                 save_model_dir: Optional[str] = None,
                 init_model_dir: Optional[str] = None,
                 max_to_keep: int = 10,
                 log_file: Optional[str] = None,
                 sparse_tables=None, rules=None):
        from openrec_tpu.parallel.mesh import DEFAULT_RULES, batch_sharding
        from openrec_tpu.parallel.train import (
            make_parallel_sparse_train_step, make_parallel_train_step)
        from openrec_tpu.training.optim import lazy_adam

        if rules is None:
            rules = DEFAULT_RULES
        self.model = model
        self.mesh = mesh
        self.rules = rules
        self.sparse_tables = sparse_tables
        self.lr = lr
        self.tx = optimizer if optimizer is not None else lazy_adam(lr)
        self.rng = jax.random.PRNGKey(seed)
        self.save_model_dir = save_model_dir
        self.max_to_keep = max_to_keep
        self.log_file = log_file
        self._batch_sharding = batch_sharding(mesh)

        self._dense_tx = optimizer   # raw arg: sparse-step dense_tx must
                                     # match the opt_state built here
        if sparse_tables is not None:
            from openrec_tpu.training.sparse import make_sparse_train_step
            step_fn, init_fn = make_parallel_sparse_train_step(
                model, sparse_tables, mesh, rules=rules,
                learning_rate=lr, dense_tx=optimizer)
            # step_core for the fused K-step path (_step_body under scan);
            # same math as the per-step parallel sparse step.
            _, _, self._sparse_core = make_sparse_train_step(
                model, sparse_tables, learning_rate=lr,
                dense_tx=optimizer)
        else:
            step_fn, init_fn = make_parallel_train_step(
                model, self.tx, mesh, rules=rules)
        self.rng, init_rng = jax.random.split(self.rng)
        self.params, self.opt_state, self.param_shardings = \
            init_fn(init_rng)
        self._step = step_fn
        if init_model_dir is not None:
            self._warm_start(init_model_dir)
        self._score = jax.jit(self.model.score)
        self._eval_step_cache = {}
        self._multi_step_cache = {}
        self.global_step = 0

    # ------------------------------------------------------------------ #

    def _shardings_of(self, tree):
        return jax.tree_util.tree_map(lambda x: x.sharding, tree)

    def _warm_start(self, init_model_dir):
        from openrec_tpu.parallel import sharded_checkpoint as pc
        step = pc.latest_step(init_model_dir)
        if step is None:
            return
        import os
        step_dir = os.path.join(init_model_dir, f"ckpt-{step}")
        tree = pc.restore_sharded(
            step_dir, {"params": self.params},
            {"params": self._shardings_of(self.params)}, optimistic=True)
        self.params = tree["params"]
        self._log(f"warm-started from {step_dir}")

    def train_step(self, batch: dict):
        """One optimizer step; the batch shards over the 'data' axis on
        the way in (each host transfers only its slice)."""
        from openrec_tpu.data.pipeline import to_device
        self.rng, step_rng = jax.random.split(self.rng)
        batch = to_device(batch, self._batch_sharding)
        if self.sparse_tables is not None:
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, batch, step_rng)
            aux = {"loss": loss}
        else:
            self.params, self.opt_state, loss, aux = self._step(
                self.params, self.opt_state, batch, step_rng)
        self.global_step += 1
        return loss, aux

    def _dispatch_multi(self, stacked: dict, k: int):
        """Host-fed fused K-step on the mesh: the [k, B, ...] stacked
        batches shard over 'data' on dim 1 (each host/device transfers
        only its slice of every step's batch) and a lax.scan runs the k
        steps in ONE dispatch — the same dispatch-RTT amortization as the
        single-device train_step_multi_flat, same math (scan of
        _step_body; sparse_tables route through the sparse step_core).

        Giant-table caveat: scan carries of multi-GB sharded tables are
        copied per iteration by XLA (docs/PERF_NOTES.md) — keep
        steps_per_call=1 (plain train_step) for Criteo-scale tables; this
        path is for the small/medium-table regime where step fusion wins.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from openrec_tpu.parallel.mesh import DATA_AXIS

        if k not in self._multi_step_cache:
            self._multi_step_cache[k] = self._build_multi_step(k)
        stacked_sharding = NamedSharding(self.mesh, P(None, DATA_AXIS))
        # device_put directly: for host arrays it transfers the shards;
        # for jax.Arrays (e.g. a device-sampled or pre-sharded feed) it
        # reshards ON DEVICE — np.asarray here would be a device→host
        # fetch, which permanently disables buffer donation on the axon
        # backend (docs/PERF_NOTES.md "donation poisoning"; ADVICE r4).
        stacked = {key: jax.device_put(v, stacked_sharding)
                   for key, v in stacked.items()}
        self.rng, step_rng = jax.random.split(self.rng)
        self.params, self.opt_state, losses = self._multi_step_cache[k](
            self.params, self.opt_state, stacked, step_rng)
        self.global_step += k
        return losses

    def _multi_feed_sharding(self):
        """[k, B, ...] fused-feed payloads shard dim 1 over 'data' on
        the way in (each device receives only its slice per step)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from openrec_tpu.parallel.mesh import DATA_AXIS
        return NamedSharding(self.mesh, P(None, DATA_AXIS))

    def train_steps_device(self, sampler, k: int, fused: bool = True):
        """K steps with on-device PER-SHARD sampling (each data shard
        draws a disjoint stream — parallel/train.py
        make_parallel_device_train_step). With sparse_tables set, routes
        through the distributed O(batch) sparse step
        (make_parallel_device_sparse_train_step) — keep k=1 for
        multi-GB-per-shard tables (scan carries copy; PERF_NOTES).

        `fused` exists for base-Trainer signature compatibility; the
        mesh path always fuses (per-shard sampling must run inside
        shard_map, so there is no separate sample dispatch)."""
        from openrec_tpu.parallel.train import (
            make_parallel_device_sparse_train_step,
            make_parallel_device_train_step)
        key = (id(sampler), k)
        if key not in self._multi_step_cache:
            if self.sparse_tables is not None:
                step_fn, _ = make_parallel_device_sparse_train_step(
                    self.model, self.sparse_tables, self.mesh, sampler,
                    steps_per_call=k, rules=self.rules,
                    learning_rate=self.lr, dense_tx=self._dense_tx)
            else:
                step_fn, _ = make_parallel_device_train_step(
                    self.model, self.tx, self.mesh, sampler,
                    steps_per_call=k, rules=self.rules)
            self._multi_step_cache[key] = step_fn
        self.rng, loop_rng = jax.random.split(self.rng)
        self.params, self.opt_state, losses = self._multi_step_cache[key](
            self.params, self.opt_state, loop_rng)
        self.global_step += k
        return losses

    # ------------------------------------------------------------------ #

    def _default_eval_step(self, at, from_ids: bool = False):
        """Eval step with users sharded over 'data' (each device scores
        its user slice against the possibly row-sharded catalog)."""
        key = (tuple(at), from_ids)
        if key not in self._eval_step_cache:
            from functools import partial

            from openrec_tpu.metrics import AUC, NDCG, Precision, Recall
            model = self.model
            at = tuple(at)
            bs = self._batch_sharding

            def metrics(params, user_id, pos, excl):
                pred = model.score(params, {"user_id": user_id})
                return {
                    "AUC": AUC(pos, pred, excl),
                    "Recall": Recall(pos, pred, excl, at=at),
                    "NDCG": NDCG(pos, pred, excl, at=at),
                    "Precision": Precision(pos, pred, excl, at=at),
                }

            if from_ids:
                from openrec_tpu.metrics.ranking import ids_to_masks
                total_items = getattr(model, "total_items")

                @partial(jax.jit, in_shardings=(None, bs, bs, bs))
                def eval_step(params, user_id, pos_ids, excl_ids):
                    pos, excl = ids_to_masks(pos_ids, excl_ids,
                                             total_items)
                    return metrics(params, user_id, pos, excl)
            else:
                eval_step = jax.jit(metrics,
                                    in_shardings=(None, bs, bs, bs))
            self._eval_step_cache[key] = eval_step
        return self._eval_step_cache[key]

    # ------------------------------------------------------------------ #

    def save(self, step: Optional[int] = None):
        from openrec_tpu.parallel import sharded_checkpoint as pc
        assert self.save_model_dir, "save_model_dir not set"
        return pc.save_sharded(
            self.save_model_dir,
            step if step is not None else self.global_step,
            {"params": self.params, "opt_state": self.opt_state},
            max_to_keep=self.max_to_keep)

    def restore(self, path: Optional[str] = None,
                optimistic: bool = False):
        from openrec_tpu.parallel import sharded_checkpoint as pc
        import os
        if path is None:
            step = pc.latest_step(self.save_model_dir)
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoint found in {self.save_model_dir!r}")
            path = os.path.join(self.save_model_dir, f"ckpt-{step}")
        tree = {"params": self.params, "opt_state": self.opt_state}
        shardings = self._shardings_of(tree)
        tree = pc.restore_sharded(path, tree, shardings,
                                  optimistic=optimistic)
        self.params = tree["params"]
        self.opt_state = tree["opt_state"]
        return path


def _as_np(x):
    return np.asarray(x)
