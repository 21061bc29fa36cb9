"""Training & evaluation harness.

Parity: tf1 ModelTrainer (openrec/tf1/model_trainer.py:7-97 — iteration
loop, eval_iter/save_iter, pluggable per-iteration functions, colored
console logging) + the tf2 example loops (tf2_examples/bpr_citeulike.py:33-67)
+ legacy ImplicitModelTrainer's full/sampled eval modes.

TPU re-design: one jitted step function (value_and_grad → optimizer →
optional post-step projection, all fused into a single XLA program with
donated buffers), an async dispatch loop (loss fetched with a 1-step lag so
host logging never syncs the device), and vmapped full-catalog evaluation.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial
from typing import Callable, Optional

import jax
import numpy as np
import optax

from openrec_tpu import checkpoint as ckpt_lib
from openrec_tpu.metrics import (AUC, NDCG, DeviceDictMean, DeviceMean,
                                 DictMean, Mean, Precision, Recall)


def _color(text, code):
    if not sys.stdout.isatty():
        return text
    return f"\033[{code}m{text}\033[0m"


class Trainer:

    def __init__(self, model, optimizer=None, lr: float = 1e-3, seed: int = 0,
                 save_model_dir: Optional[str] = None,
                 init_model_dir: Optional[str] = None,
                 max_to_keep: int = 10,
                 log_file: Optional[str] = None,
                 sparse_tables=None):
        """
        model: a Recommender.
        optimizer: an optax GradientTransformation. Default lazy_adam(lr)
          — rows-touched updates, the production sparse-embedding
          semantics (O(batch) HBM per step, censor invariants preserved
          between touches). For EXACT keras-Adam trajectory parity with
          the reference (which decays+applies moments densely — see
          training/optim.py module docstring) pass
          optimizer=keras_adam(lr); identical per-step, different over
          trajectories on rows absent from a batch.
        init_model_dir: warm-start checkpoint dir; loaded optimistically
          (shape-matched subset) like reference recommender.py:495-498.
        sparse_tables: optional table specs (training/sparse.py) switching
          the step to O(batch) gather→Adam→scatter updates — the big-table
          production path (docs/PERF_NOTES.md). Uses Adam(lr); the
          `optimizer` arg then only applies to dense (non-table) params.
        """
        from openrec_tpu.training.optim import lazy_adam
        self.model = model
        self.sparse_tables = sparse_tables
        self.lr = lr
        self.tx = optimizer if optimizer is not None else lazy_adam(lr)
        self.rng = jax.random.PRNGKey(seed)
        self.save_model_dir = save_model_dir
        self.max_to_keep = max_to_keep
        self.log_file = log_file

        self.rng, init_rng = jax.random.split(self.rng)
        self.params = model.init(init_rng)
        if init_model_dir is not None:
            path = ckpt_lib.latest_checkpoint(init_model_dir)
            if path is not None:
                self.params = ckpt_lib.restore(
                    path, {"params": self.params},
                    optimistic=True)["params"]
                self._log(f"warm-started from {path}")
        if sparse_tables is not None:
            from openrec_tpu.training.sparse import make_sparse_train_step
            init_fn, step_fn, self._sparse_core = make_sparse_train_step(
                model, sparse_tables, learning_rate=lr,
                dense_tx=optimizer)
            self.opt_state = init_fn(self.params)
            self._sparse_step = step_fn
        else:
            self.opt_state = self.tx.init(self.params)
        self._step = self._build_step()
        self._score = jax.jit(self.model.score)
        self._eval_step_cache = {}
        self._multi_step_cache = {}
        self.global_step = 0

    # ------------------------------------------------------------------ #

    def _build_step(self):
        model, tx = self.model, self.tx

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, batch, rng):
            def loss_fn(p):
                total, aux = model.loss(p, batch, rng)
                return total, aux
            (total, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            grads = model.grad_transform(grads, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = model.post_step(params, batch)
            return params, opt_state, total, aux

        return step

    def train_step(self, batch: dict):
        """One optimizer step on a numpy/jnp batch dict."""
        self.rng, step_rng = jax.random.split(self.rng)
        batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}
        if self.sparse_tables is not None:
            self.params, self.opt_state, loss = self._sparse_step(
                self.params, self.opt_state, batch, step_rng)
            aux = {"loss": loss}
        else:
            self.params, self.opt_state, loss, aux = self._step(
                self.params, self.opt_state, batch, step_rng)
        self.global_step += 1
        return loss, aux

    def _step_body(self, params, opt_state, batch, step_rng):
        """One optimizer step as pure code (used inline and under scan)."""
        if self.sparse_tables is not None:
            params, opt_state, total = self._sparse_core(
                params, opt_state, batch, step_rng)
            return params, opt_state, total
        model, tx = self.model, self.tx

        def loss_fn(p):
            return model.loss(p, batch, step_rng)
        (total, _), grads = jax.value_and_grad(loss_fn,
                                               has_aux=True)(params)
        grads = model.grad_transform(grads, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = model.post_step(params, batch)
        return params, opt_state, total

    def _build_multi_step(self, k: int):

        @partial(jax.jit, donate_argnums=(0, 1))
        def multi_step(params, opt_state, stacked, rng):
            rngs = jax.random.split(rng, k)

            def body(carry, xs):
                params, opt_state = carry
                batch, step_rng = xs
                params, opt_state, total = self._step_body(
                    params, opt_state, batch, step_rng)
                return (params, opt_state), total

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (stacked, rngs))
            return params, opt_state, losses

        return multi_step

    def _build_device_loop(self, sampler, k: int):
        # Pre-generate all K batches' RNG in one vectorized pass when the
        # sampler supports it (sample_stacked): per-step threefry calls
        # inside the scan serialize the VPU and were the measured limiter
        # of this path (docs/PERF_NOTES.md).
        stacked_sampling = hasattr(sampler, "sample_stacked")

        @partial(jax.jit, donate_argnums=(0, 1))
        def device_loop(params, opt_state, rng):
            r_sample, r_loop = jax.random.split(rng)
            rngs = jax.random.split(r_loop, k)

            if stacked_sampling:
                stacked = sampler.sample_stacked(r_sample, k)

                def body(carry, xs):
                    params, opt_state = carry
                    batch, step_rng = xs
                    params, opt_state, total = self._step_body(
                        params, opt_state, batch, step_rng)
                    return (params, opt_state), total

                (params, opt_state), losses = jax.lax.scan(
                    body, (params, opt_state), (stacked, rngs))
            else:
                def body(carry, step_rng):
                    params, opt_state = carry
                    r_s, r_loss = jax.random.split(step_rng)
                    batch = sampler.sample(r_s)
                    params, opt_state, total = self._step_body(
                        params, opt_state, batch, r_loss)
                    return (params, opt_state), total

                (params, opt_state), losses = jax.lax.scan(
                    body, (params, opt_state), rngs)
            return params, opt_state, losses

        return device_loop

    def train_steps_device(self, sampler, k: int, fused: bool = False):
        """K optimizer steps with ON-DEVICE batch sampling; the host only
        supplies an RNG key. `sampler` is a Device*Sampler
        (openrec_tpu.data.device_sampler).

        When the sampler supports sample_stacked, sampling runs as its
        OWN device dispatch feeding the same fused K-step program the
        host paths use (two async dispatches per call, data stays on
        device) — 730M+ ex/s end-to-end at bench scale with K=400
        (docs/PERF_NOTES.md r4). `fused=True` forces
        the single-program scan (the parallel mesh path still fuses —
        per-shard sampling must run inside shard_map)."""
        if not fused and hasattr(sampler, "sample_stacked"):
            skey = (id(sampler), k, "sample")
            if skey not in self._multi_step_cache:
                self._multi_step_cache[skey] = jax.jit(
                    lambda rng: sampler.sample_stacked(rng, k))
            self.rng, s_rng = jax.random.split(self.rng)
            stacked = self._multi_step_cache[skey](s_rng)
            return self._dispatch_multi(stacked, k)
        key = (id(sampler), k)
        if key not in self._multi_step_cache:
            self._multi_step_cache[key] = self._build_device_loop(sampler,
                                                                  k)
        self.rng, loop_rng = jax.random.split(self.rng)
        self.params, self.opt_state, losses = self._multi_step_cache[key](
            self.params, self.opt_state, loop_rng)
        self.global_step += k
        return losses

    def train_step_multi(self, batches: list):
        """K optimizer steps in ONE device dispatch (lax.scan over stacked
        batches). Identical math to K train_step calls; removes K-1 host
        round-trips — the dominant cost on TPU for small models. Returns
        the per-step loss vector."""
        k = len(batches)
        stacked = {key: np.stack([b[key] for b in batches])
                   for key in batches[0]}
        return self._dispatch_multi(stacked, k)

    def train_step_multi_flat(self, flat_batch: dict, k: int):
        """Like train_step_multi, but takes ONE flat batch of k·B examples
        (e.g. a single sampler call with batch_size=k*B) and splits it into
        k sequential steps of B on device — the cheapest host path: one
        sampler call, no stacking."""
        stacked = {key: np.asarray(v).reshape(
            (k, -1) + np.asarray(v).shape[1:])
            for key, v in flat_batch.items()}
        return self._dispatch_multi(stacked, k)

    def _dispatch_multi(self, stacked: dict, k: int):
        if k not in self._multi_step_cache:
            self._multi_step_cache[k] = self._build_multi_step(k)
        stacked = {key: jax.numpy.asarray(v) for key, v in stacked.items()}
        self.rng, step_rng = jax.random.split(self.rng)
        self.params, self.opt_state, losses = self._multi_step_cache[k](
            self.params, self.opt_state, stacked, step_rng)
        self.global_step += k
        return losses

    def _multi_feed_sharding(self):
        """Sharding for [k, B, ...] fused-feed payloads (None on one
        device; ParallelTrainer shards dim 1 over the data axis)."""
        return None

    def _make_fused_feed(self, it, k: int, feed: str):
        """(it, fused_feed) for train(steps_per_call=k, feed=...): wraps
        the batch iterator into a double-buffered device stream of
        [k, B, ...] stacked payloads (docs/PERF_NOTES.md: the measured-
        best live host path — one transfer per k steps, overlapping the
        previous dispatch). Returns fused_feed=None for per-step feeds
        (with the peeked batch pushed back onto `it`)."""
        import itertools

        from openrec_tpu.data.pipeline import device_iterator

        try:
            first = next(it)
        except StopIteration:
            return iter(()), iter(())     # empty stream: loop exits
        if feed == "auto":
            feed = ("stacked"
                    if all(np.ndim(v) >= 2 and np.shape(v)[0] == k
                           for v in first.values())
                    else "per_step")
        if feed == "per_step":
            return itertools.chain([first], it), None

        def _restack(b):
            if feed == "flat":
                return {key: np.asarray(v).reshape(
                    (k, -1) + np.asarray(v).shape[1:])
                    for key, v in b.items()}
            return b

        stream = map(_restack, itertools.chain([first], it))
        return it, device_iterator(stream,
                                   sharding=self._multi_feed_sharding(),
                                   prefetch=2)

    # ------------------------------------------------------------------ #

    def _default_eval_step(self, at, from_ids: bool = False):
        key = (tuple(at), from_ids)
        if key not in self._eval_step_cache:
            model = self.model
            at = tuple(at)

            def metrics(params, user_id, pos_mask, excl_mask):
                pred = model.score(params, {"user_id": user_id})
                return {
                    "AUC": AUC(pos_mask, pred, excl_mask),
                    "Recall": Recall(pos_mask, pred, excl_mask, at=at),
                    "NDCG": NDCG(pos_mask, pred, excl_mask, at=at),
                    "Precision": Precision(pos_mask, pred, excl_mask,
                                           at=at),
                }

            if from_ids:
                from openrec_tpu.metrics.ranking import ids_to_masks
                total_items = getattr(model, "total_items")

                @jax.jit
                def eval_step(params, user_id, pos_ids, excl_ids):
                    pos_mask, excl_mask = ids_to_masks(pos_ids, excl_ids,
                                                       total_items)
                    return metrics(params, user_id, pos_mask, excl_mask)
            else:
                eval_step = jax.jit(metrics)
            self._eval_step_cache[key] = eval_step
        return self._eval_step_cache[key]

    def _regression_eval_step(self):
        """Per-pair MSE step for the legacy 'regression' etype (reference
        legacy/utils/evaluators/{evaluator,mse}.py + the ItrMLP trainer's
        _evaluate loop, itr_mlp_model_trainer.py:50-76): serve the score
        row, gather the rated item, square the error per record."""
        if "regression" not in self._eval_step_cache:
            model = self.model

            @jax.jit
            def step(params, user_id, item_id, label):
                import jax.numpy as jnp
                pred = model.score(params, {"user_id": user_id})
                pred = jnp.take_along_axis(
                    pred, item_id[:, None].astype(jnp.int32), axis=1)[:, 0]
                return {"MSE": jnp.square(pred - label)}

            self._eval_step_cache["regression"] = step
        return self._eval_step_cache["regression"]

    def evaluate(self, eval_sampler, at=(50, 100),
                 eval_fn: Callable = None, scorer=None,
                 eval_chunk: int = 16384,
                 dump_path: Optional[str] = None,
                 defer_metrics: bool = False) -> dict:
        """Run one epoch of an EvaluationSampler; returns metric means.
        Accepts mask batches, id batches (device_masks=True), or
        per-record regression batches (RegressionEvalSampler → MSE).

        scorer: optional CachedDotProductScorer — switches id batches to
        the chunked giant-catalog path (O(B·eval_chunk) memory instead of
        a [B, total_items] score row; see metrics/chunked.py).

        dump_path: optional .npz path; dumps every evaluated user's raw
        full-catalog score row (plus user ids) for offline analysis — the
        reference's per-user score pickle (implicit_model_trainer.py:
        150-175). Not supported together with `scorer` (the chunked path
        exists precisely to never materialize those rows).

        defer_metrics: accumulate ON DEVICE and return a dict of device
        arrays instead of numpy — no device→host fetch happens, so a
        surrounding giant-table training loop keeps its buffer donation
        (docs/PERF_NOTES.md "donation poisoning"). Fetch the returned
        dict with jax.device_get(...) after the timed region. The scorer
        path is safe under defer_metrics: CachedDotProductScorer's cache
        re-extraction is fully device-resident (scorer.py _extract_all
        concatenates on device, no np.asarray)."""
        acc = None
        if defer_metrics:
            assert dump_path is None, \
                "dump_path fetches scores to host; incompatible with " \
                "defer_metrics"
            acc = DeviceDictMean()
        if scorer is not None:
            # params changed since the last eval epoch (the reference's
            # _model_updated flag, fast_dot_product_server.py:132-141)
            scorer.mark_dirty()
            assert dump_path is None, \
                "dump_path requires the dense scoring path (no scorer)"
        dump_users, dump_scores = [], []
        # live progress for long evals (the reference's tqdm bar,
        # implicit_model_trainer.py:137) — tty-only, overwritten in place
        show_progress = sys.stdout.isatty() and not defer_metrics
        try:
            n_total = len(eval_sampler)
        except TypeError:
            n_total = None
        t_prog = time.time()
        progress_shown = False
        for i_batch, batch in enumerate(eval_sampler):
            if show_progress and time.time() - t_prog > 0.5:
                t_prog = time.time()
                progress_shown = True
                frac = (f"{i_batch + 1}/{n_total}" if n_total
                        else f"{i_batch + 1}")
                print(f"  eval batch {frac}", end="\r", flush=True)
            if eval_fn is not None:
                out = eval_fn(self.params, batch["user_id"],
                              batch["pos_mask"], batch["excl_mask"])
            elif "label" in batch and "item_id" in batch:
                step = self._regression_eval_step()
                out = step(self.params,
                           jax.numpy.asarray(batch["user_id"]),
                           jax.numpy.asarray(batch["item_id"]),
                           jax.numpy.asarray(batch["label"]))
            elif scorer is not None and "pos_ids" in batch:
                out = scorer.eval_metrics(
                    self.params, batch["user_id"], batch["pos_ids"],
                    batch["excl_ids"], at=tuple(at), chunk=eval_chunk)
            elif "pos_ids" in batch:
                step = self._default_eval_step(at, from_ids=True)
                out = step(self.params, batch["user_id"],
                           batch["pos_ids"], batch["excl_ids"])
            else:
                step = self._default_eval_step(at)
                out = step(self.params, batch["user_id"],
                           batch["pos_mask"], batch["excl_mask"])
            if not defer_metrics:
                out = jax.device_get(out)
                if acc is None:
                    acc = DictMean({k: list(np.asarray(v).shape[1:])
                                    for k, v in out.items()})
            acc.update_state(out, valid=batch.get("valid"))
            if dump_path is not None:
                rows = np.asarray(self._score(
                    self.params,
                    {"user_id": jax.numpy.asarray(batch["user_id"])}))
                valid = np.asarray(batch.get(
                    "valid", np.ones(len(batch["user_id"]), bool)))
                dump_users.append(np.asarray(batch["user_id"])[valid])
                dump_scores.append(rows[valid])
        if progress_shown:
            print("\r\x1b[K", end="", flush=True)   # clear the progress line
        if dump_path is not None:
            os.makedirs(os.path.dirname(dump_path) or ".", exist_ok=True)
            np.savez(dump_path,
                     user_ids=np.concatenate(dump_users)
                     if dump_users else np.empty(0, np.int32),
                     scores=np.concatenate(dump_scores)
                     if dump_scores else np.empty((0, 0), np.float32))
        if defer_metrics:
            return acc.result_device() if acc._sums else {}
        return acc.result() if acc is not None else {}

    # ------------------------------------------------------------------ #

    def _log(self, msg, color=None):
        line = msg if color is None else _color(msg, color)
        print(line, flush=True)

    def _log_jsonl(self, record: dict):
        if self.log_file:
            os.makedirs(os.path.dirname(self.log_file) or ".", exist_ok=True)
            def _default(o):
                if hasattr(o, "tolist"):
                    return o.tolist()
                return float(o)
            with open(self.log_file, "a") as f:
                f.write(json.dumps(record, default=_default) + "\n")

    def train(self, total_iter: int, train_batches,
              eval_samplers: Optional[dict] = None,
              eval_interval: Optional[int] = None,
              save_interval: Optional[int] = None,
              at=(50, 100),
              eval_fn: Callable = None,
              train_iter_hook: Callable = None,
              steps_per_call: int = 1,
              scorer=None, eval_chunk: int = 16384,
              update_interval: Optional[int] = None,
              update_fn: Callable = None,
              defer_metrics: bool = False,
              feed: str = "auto",
              verbose: bool = True) -> dict:
        """Iteration-driven loop (reference model_trainer.py:60-97).

        train_batches: iterable of batch dicts (e.g. Dataset.pairwise(...)).
        eval_samplers: {name: EvaluationSampler} evaluated every
          eval_interval iterations.
        train_iter_hook: optional f(trainer, batch) replacing the default
          step (the analog of a custom train_iter_func).
        steps_per_call: fuse this many optimizer steps into one device
          dispatch (see train_step_multi); intervals should be multiples.
        feed: how train_batches maps onto fused dispatches when
          steps_per_call = k > 1 (ignored at k=1 / for device samplers):
          - 'per_step': each yielded dict is ONE step's batch; k dicts
            are stacked in python per dispatch (the r4 behavior).
          - 'flat': each yielded dict is ONE DISPATCH's payload as flat
            [k·B] arrays (e.g. a single sampler call with
            batch_size=k*B); reshaped to [k, B] zero-copy. The fastest
            measured live host path (docs/PERF_NOTES.md) — one sampler
            call and one host→device transfer per k steps, no python
            stacking.
          - 'stacked': each yielded dict is already [k, B, ...].
          - 'auto': 'stacked' if every value's leading dim == k with
            ndim ≥ 2, else 'per_step'. ('flat' cannot be auto-detected
            — a flat [k·B] array is indistinguishable from one bigger
            per-step batch; request it explicitly.)
          'flat'/'stacked' payloads flow through device_iterator
          double-buffering so the transfer of call i+1 overlaps the
          device steps of call i; total_iter must be a multiple of k.
        verbose: False silences console lines (JSONL logging unaffected)
          — for harnesses that own stdout (e.g. bench.py).
        scorer: optional CachedDotProductScorer passed to interval evals —
          id-batch (device_masks) eval then runs the chunked giant-catalog
          path in O(B·eval_chunk) memory.
        update_interval/update_fn: every update_interval iterations apply
          params ← update_fn(params) — the ItrMLP temporal protocol
          (reference itr_mlp_model_trainer.py:46-47 calls
          model.update_embeddings() every update_itr). update_fn defaults
          to jit(model.update_embeddings); intervals should be multiples
          of steps_per_call.
        defer_metrics: keep loss and eval metrics ON DEVICE for the whole
          run and fetch everything once at the end — no device→host
          transfer happens inside the loop, so giant-table sparse/donated
          steps keep their in-place updates (docs/PERF_NOTES.md "donation
          poisoning": one float(loss) fetch makes every later Criteo-scale
          step copy 6.5GB, 0.6→63 ms/step). Interval console lines then
          show it/s only; the full records (and JSONL) are emitted after
          the loop. Note save_interval still fetches params to write the
          checkpoint — mid-run checkpointing costs donation from that
          point on; prefer saving at the end when throughput matters.
        Returns the last eval results.
        """
        eval_samplers = eval_samplers or {}
        avg_loss = DeviceMean() if defer_metrics else Mean()
        deferred = []        # (step, it/s, device loss, device eval dict)
        last_results = {}
        t_start = time.time()
        log = self._log if verbose else (lambda *a, **k: None)
        # A Device*Sampler (data/device_sampler.py) trains with sampling
        # fused into the device program; anything else is a batch iterable.
        device_sampler = (train_batches
                          if hasattr(train_batches, "sample")
                          and not hasattr(train_batches, "__iter__")
                          else None)
        it = iter(train_batches) if device_sampler is None else None
        assert steps_per_call == 1 or train_iter_hook is None, \
            "train_iter_hook requires steps_per_call=1"
        assert feed in ("auto", "per_step", "flat", "stacked"), feed
        fused_feed = None
        if device_sampler is None and steps_per_call > 1 \
                and feed != "per_step":
            it, fused_feed = self._make_fused_feed(it, steps_per_call,
                                                   feed)
            assert fused_feed is None or total_iter % steps_per_call == 0, \
                "flat/stacked feeds need total_iter % steps_per_call == 0"
        if update_interval and update_fn is None:
            update_fn = jax.jit(self.model.update_embeddings)

        log(_color(f"[openrec_tpu] start training "
                   f"{type(self.model).__name__} for {total_iter} "
                   "iterations", "1;34"))
        i = 0
        while i < total_iter:
            chunk = min(steps_per_call, total_iter - i)
            i += chunk
            try:
                if device_sampler is not None:
                    loss = self.train_steps_device(device_sampler, chunk)
                elif fused_feed is not None:
                    loss = self._dispatch_multi(next(fused_feed), chunk)
                elif chunk > 1:
                    loss = self.train_step_multi(
                        [next(it) for _ in range(chunk)])
                elif train_iter_hook is not None:
                    loss = train_iter_hook(self, next(it))
                else:
                    loss, _ = self.train_step(next(it))
            except StopIteration:
                # finite stream (e.g. chronological epoch) exhausted —
                # the reference's samplers simply stop producing
                log(f"train stream exhausted at iter "
                    f"{self.global_step}")
                break
            avg_loss.update_state(loss if defer_metrics
                                  else jax.device_get(loss))

            if update_interval and i % update_interval == 0:
                self.params = update_fn(self.params)

            if save_interval and self.save_model_dir \
                    and i % save_interval == 0:
                self.save()

            if eval_interval and i % eval_interval == 0:
                if defer_metrics:
                    jax.block_until_ready(loss)   # honest it/s boundary
                dt = time.time() - t_start
                its_per_s = eval_interval / dt if dt > 0 else float("inf")
                results = {}
                for name, sampler in eval_samplers.items():
                    results[name] = self.evaluate(
                        sampler, at=at, eval_fn=eval_fn, scorer=scorer,
                        eval_chunk=eval_chunk, defer_metrics=defer_metrics)
                last_results = results
                if defer_metrics:
                    deferred.append((self.global_step, its_per_s,
                                     avg_loss.result_device(), results))
                    log(f"Iter {self.global_step}  "
                        f"({its_per_s:.1f} it/s)  "
                        "[metrics on device, fetched at end]")
                    avg_loss = DeviceMean()
                    t_start = time.time()
                    continue
                msg = (f"Iter {self.global_step}  "
                       f"loss {avg_loss.result():.4f}  "
                       f"({its_per_s:.1f} it/s)")
                for name, res in results.items():
                    parts = []
                    for key, val in res.items():
                        v = np.asarray(val)
                        parts.append(f"{key}={np.array2string(v, precision=4)}")
                    msg += f"  [{name}] " + " ".join(parts)
                log(_color(msg, "32"))
                self._log_jsonl({"step": self.global_step,
                                 "loss": avg_loss.result(),
                                 "iters_per_s": its_per_s,
                                 "eval": results})
                avg_loss.reset_states()
                t_start = time.time()

        if hasattr(train_batches, "stop"):
            train_batches.stop()
        if deferred:
            # ONE fetch for the whole run, after the timed region.
            fetched = jax.device_get([(l, r) for _, _, l, r in deferred])
            for (step, its, _, _), (lv, res) in zip(deferred, fetched):
                res = {name: {k: np.asarray(v) for k, v in d.items()}
                       for name, d in res.items()}
                msg = f"Iter {step}  loss {float(lv):.4f}  ({its:.1f} it/s)"
                for name, d in res.items():
                    parts = [f"{k}={np.array2string(np.asarray(v), precision=4)}"
                             for k, v in d.items()]
                    msg += f"  [{name}] " + " ".join(parts)
                log(_color(msg, "32"))
                self._log_jsonl({"step": step, "loss": float(lv),
                                 "iters_per_s": its, "eval": res})
                last_results = res
        return last_results

    def evaluate_temporal(self, eval_sampler, at=(50, 100)) -> dict:
        """Next-item evaluation for sequence models: per user, rank the
        held-out label among the full catalog (the tf1 flow —
        TemporalEvaluationSampler feeding EvalManager.full_eval,
        reference model_trainer.py:34-58). Returns AUC/Recall@K/NDCG@K
        means over users (label = the single positive; no exclusions)."""
        import jax.numpy as jnp

        at_arr = tuple(at)
        key = ("temporal", at_arr)
        if key not in self._eval_step_cache:
            model = self.model

            @jax.jit
            def step(params, batch, labels):
                pred = model.score(params, batch)          # [B, I]
                I = pred.shape[1]
                label_score = jnp.take_along_axis(
                    pred, labels[:, None], axis=1)[:, 0]
                rank_above = jnp.sum(pred > label_score[:, None], axis=1)
                auc = (I - 1 - rank_above) / (I - 1)
                rec = jnp.stack([(rank_above < k).astype(jnp.float32)
                                 for k in at_arr], axis=1)
                ndcg = jnp.stack(
                    [(rank_above < k)
                     / (jnp.log(rank_above + 2.0) / jnp.log(2.0))
                     for k in at_arr], axis=1)
                return {"AUC": auc, "Recall": rec, "NDCG": ndcg}
            self._eval_step_cache[key] = step

        acc = DictMean({"AUC": [], "Recall": [len(at_arr)],
                        "NDCG": [len(at_arr)]})
        for batch in eval_sampler.epoch():
            labels = jax.numpy.asarray(batch["label"])
            feed = {k: jax.numpy.asarray(v) for k, v in batch.items()
                    if k not in ("label", "valid")}
            out = self._eval_step_cache[key](self.params, feed, labels)
            acc.update_state(jax.device_get(out), valid=batch.get("valid"))
        return acc.result()

    # ------------------------------------------------------------------ #

    def profile(self, train_batches, steps: int = 20,
                trace_dir: str = "/tmp/openrec_tpu_trace"):
        """Capture a device trace over `steps` train steps (the tracing
        subsystem the reference lacks, SURVEY.md §5.1). View with
        TensorBoard's profile plugin or xprof."""
        it = iter(train_batches)
        self.train_step(next(it))                    # compile outside trace
        jax.block_until_ready(self.params)
        with jax.profiler.trace(trace_dir):
            for _ in range(steps):
                self.train_step(next(it))
            jax.block_until_ready(self.params)
        self._log(f"trace written to {trace_dir}")
        return trace_dir

    # ------------------------------------------------------------------ #

    def save(self, step: Optional[int] = None):
        assert self.save_model_dir, "save_model_dir not set"
        return ckpt_lib.save(self.save_model_dir,
                             step if step is not None else self.global_step,
                             {"params": self.params,
                              "opt_state": self.opt_state},
                             max_to_keep=self.max_to_keep)

    def restore(self, path: Optional[str] = None, optimistic: bool = False):
        if path is None:
            path = ckpt_lib.latest_checkpoint(self.save_model_dir)
            if path is None:
                raise FileNotFoundError(
                    f"no checkpoint found in {self.save_model_dir!r}")
        tree = {"params": self.params, "opt_state": self.opt_state}
        tree = ckpt_lib.restore(path, tree, optimistic=optimistic)
        self.params = tree["params"]
        self.opt_state = tree["opt_state"]
        return path
