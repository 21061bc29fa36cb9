"""BPR — Bayesian Personalized Ranking matrix factorization.

Parity: openrec/tf2/recommenders/bpr.py:5-43 (loss = pairwise log loss on
u·v+b; the tf2 example differentiates loss+l2 jointly since
tape.gradient sums tuple targets — we expose that as l2_weight, default 1.0)
and tf1 recommenders/bpr.py:6-103, legacy recommenders/bpr.py:5-146.
Serving: full-catalog u·Vᵀ + b (bpr.py:39-43).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from openrec_tpu.models.base import Recommender
from openrec_tpu.modules.embedding import embedding_init, embedding_lookup
from openrec_tpu.modules.losses import l2_half, pairwise_log_loss


@dataclasses.dataclass(frozen=True)
class BPR(Recommender):
    total_users: int
    total_items: int
    dim_user_embed: int
    dim_item_embed: int
    l2_weight: float = 1.0

    def init(self, rng):
        r_u, r_i = jax.random.split(rng)
        return {
            "user_embed": embedding_init(r_u, self.total_users,
                                         self.dim_user_embed),
            "item_embed": embedding_init(r_i, self.total_items,
                                         self.dim_item_embed),
            "item_bias": jnp.zeros((self.total_items, 1)),
        }

    def loss(self, params, batch, rng=None):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        # One gather (and one backward scatter) for pos+neg instead of two:
        # fewer serialized HBM ops per step, identical values.
        pn = jnp.concatenate([batch["p_item_id"], batch["n_item_id"]])
        vecs = embedding_lookup(params["item_embed"], pn)
        biases = embedding_lookup(params["item_bias"], pn)
        B = batch["p_item_id"].shape[0]
        p_vec, n_vec = vecs[:B], vecs[B:]
        p_bias, n_bias = biases[:B], biases[B:]
        task = pairwise_log_loss(user_vec, p_vec, n_vec, p_bias, n_bias)
        l2 = l2_half(user_vec, p_vec, n_vec)
        return task + self.l2_weight * l2, {"loss": task, "l2_loss": l2}

    def score(self, params, batch):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        return user_vec @ params["item_embed"].T \
            + jnp.reshape(params["item_bias"], (-1,))
