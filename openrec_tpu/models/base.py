"""Recommender protocol — one params pytree, pure functions.

This replaces the reference's dual-graph Recommender machinery
(openrec/tf1/recommenders/recommender.py:297-506: separate train/serve
tf.Graphs synced through checkpoint files) with a single source of truth:

  params = model.init(rng)                       # pytree of arrays
  loss, aux = model.loss(params, batch)          # jit/grad-able
  scores = model.score(params, batch)            # full-catalog serving
  params = model.post_step(params, batch)        # optional projection hooks

The train/serve decoupling the reference bought with checkpoint round-trips
(recommender.py:452-458) is free here — the same pytree feeds two jitted
functions.

Models are frozen dataclasses (hashable ⇒ safe as jit static args).
"""

from __future__ import annotations

import dataclasses

import jax


@dataclasses.dataclass(frozen=True)
class Recommender:
    """Base class; subclasses define init/loss/score."""

    def init(self, rng) -> dict:
        raise NotImplementedError

    def loss(self, params: dict, batch: dict, rng=None):
        """Returns (total_loss, aux_dict). aux carries per-part losses."""
        raise NotImplementedError

    def score(self, params: dict, batch: dict):
        """Full-catalog scores [B, total_items] for serving/evaluation."""
        raise NotImplementedError

    def post_step(self, params: dict, batch: dict) -> dict:
        """Applied after each optimizer step (e.g. CML norm censoring —
        the analog of the reference's post-training ops,
        legacy recommender.py:630-638). Default: identity."""
        return params

    def grad_transform(self, grads: dict, batch: dict) -> dict:
        """Per-model gradient post-processing hook (the analog of legacy
        `_grad_post_processing`, recommender.py:601-616 — e.g. VisualBPR
        rescales its item-MLP grads by 1/batch)."""
        return grads

    # Convenience: jitted single-device step builders. Distributed variants
    # live in openrec_tpu/parallel/.

    def make_loss_fn(self):
        def loss_fn(params, batch, rng=None):
            return self.loss(params, batch, rng)
        return loss_fn

    def make_score_fn(self):
        return jax.jit(lambda params, batch: self.score(params, batch))
