"""PMF — probabilistic matrix factorization on pointwise labels.

Parity: tf1 recommenders/pmf.py:6-85 with legacy interactions/
pointwise_mse.py:74-86, whose loss is tf.nn.l2_loss(w·(label-pred)) =
½·Σ(w·diff)² — note the weight sits *inside* the square there, unlike the
tf2 WRMF loss (pointwise_mse_loss.py:31). Embeddings use normal init
(pmf.py:37 `init='normal'`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from openrec_tpu.models.base import Recommender
from openrec_tpu.modules.embedding import embedding_lookup


@dataclasses.dataclass(frozen=True)
class PMF(Recommender):
    total_users: int
    total_items: int
    dim_user_embed: int
    dim_item_embed: int
    a: float = 1.0
    b: float = 1.0
    sigmoid: bool = False
    l2_reg: float = 0.0

    def init(self, rng):
        r_u, r_i = jax.random.split(rng)
        # tf1 LatentFactor 'normal' init: truncated_normal(stddev=0.01)
        # (openrec/tf1/modules/extractions/latent_factor.py:14-16).
        return {
            "user_embed": 0.01 * jax.random.truncated_normal(
                r_u, -2.0, 2.0, (self.total_users, self.dim_user_embed)),
            "item_embed": 0.01 * jax.random.truncated_normal(
                r_i, -2.0, 2.0, (self.total_items, self.dim_item_embed)),
            "item_bias": jnp.zeros((self.total_items, 1)),
        }

    def loss(self, params, batch, rng=None):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        item_vec = embedding_lookup(params["item_embed"], batch["item_id"])
        item_bias = embedding_lookup(params["item_bias"], batch["item_id"])
        label = batch["label"]
        pred = jnp.sum(user_vec * item_vec, axis=1) \
            + jnp.reshape(item_bias, (-1,))
        if self.sigmoid:
            pred = jax.nn.sigmoid(pred)
        weight = (self.a - self.b) * label + self.b
        task = 0.5 * jnp.sum((weight * (label - pred)) ** 2)
        reg = self.l2_reg * (0.5 * jnp.sum(user_vec ** 2)
                             + 0.5 * jnp.sum(item_vec ** 2))
        return task + reg, {"loss": task, "l2_loss": reg}

    def score(self, params, batch):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        scores = user_vec @ params["item_embed"].T \
            + jnp.reshape(params["item_bias"], (-1,))
        if self.sigmoid:
            scores = jax.nn.sigmoid(scores)
        return scores
