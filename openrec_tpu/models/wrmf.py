"""WRMF — weighted regularized matrix factorization (Hu et al. 2008).

Parity: openrec/tf2/recommenders/wrmf.py:5-40 (pointwise weighted MSE on
u·v + b over stratified pointwise samples).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from openrec_tpu.models.base import Recommender
from openrec_tpu.modules.embedding import embedding_init, embedding_lookup
from openrec_tpu.modules.losses import l2_half, pointwise_mse_loss


@dataclasses.dataclass(frozen=True)
class WRMF(Recommender):
    total_users: int
    total_items: int
    dim_user_embed: int
    dim_item_embed: int
    a: float = 1.0
    b: float = 1.0
    sigmoid: bool = False
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
        item_vec = embedding_lookup(params["item_embed"], batch["item_id"])
        item_bias = embedding_lookup(params["item_bias"], batch["item_id"])
        task = pointwise_mse_loss(user_vec, item_vec, item_bias,
                                  batch["label"], a=self.a, b=self.b,
                                  sigmoid=self.sigmoid)
        l2 = l2_half(user_vec, item_vec)
        return task + self.l2_weight * l2, {"loss": task, "l2_loss": l2}

    def score(self, params, batch):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        return user_vec @ params["item_embed"].T \
            + jnp.reshape(params["item_bias"], (-1,))
