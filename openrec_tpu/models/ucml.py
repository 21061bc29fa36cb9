"""UCML / CML — collaborative metric learning.

Parity: openrec/tf2/recommenders/ucml.py:5-53 (hinge on negative squared
euclidean distances + bias; post-step unit-ball censoring of touched rows —
`censor_vec` there, our `post_step` here), tf1 recommenders/ucml.py:6-70
(censor ops under operations_id='censor_embedding'), legacy
recommenders/cml.py:5-31.
Serving: -‖u - V‖² + b full catalog (ucml.py:50-53).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from openrec_tpu.models.base import Recommender
from openrec_tpu.modules.embedding import (
    censor_norm, embedding_init, embedding_lookup)
from openrec_tpu.modules.losses import l2_half, pairwise_eudist_hinge_loss


@dataclasses.dataclass(frozen=True)
class UCML(Recommender):
    total_users: int
    total_items: int
    dim_user_embed: int
    dim_item_embed: int
    margin: float = 0.5
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
        pn = jnp.concatenate([batch["p_item_id"], batch["n_item_id"]])
        vecs = embedding_lookup(params["item_embed"], pn)
        biases = embedding_lookup(params["item_bias"], pn)
        B = batch["p_item_id"].shape[0]
        p_vec, n_vec = vecs[:B], vecs[B:]
        p_bias, n_bias = biases[:B], biases[B:]
        task = pairwise_eudist_hinge_loss(user_vec, p_vec, n_vec,
                                          p_bias, n_bias, self.margin)
        l2 = l2_half(user_vec, p_vec, n_vec)
        return task + self.l2_weight * l2, {"loss": task, "l2_loss": l2}

    def post_step(self, params, batch):
        params = dict(params)
        params["user_embed"] = censor_norm(params["user_embed"],
                                           batch["user_id"])
        item_ids = jnp.concatenate([batch["p_item_id"],
                                    batch["n_item_id"]])
        params["item_embed"] = censor_norm(params["item_embed"], item_ids)
        return params

    def score(self, params, batch):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        # -‖u-v‖² = 2u·Vᵀ - ‖u‖² - ‖V‖²: the matmul form keeps the [B, I]
        # scoring on the MXU (same trick the reference's serve path uses,
        # legacy interactions/pairwise_eu_dist.py:80-86).
        item = params["item_embed"]
        sq_u = jnp.sum(user_vec ** 2, axis=1, keepdims=True)
        sq_v = jnp.sum(item ** 2, axis=1)
        scores = 2.0 * (user_vec @ item.T) - sq_u - sq_v[None, :]
        return scores + jnp.reshape(params["item_bias"], (-1,))


# CML is the legacy name for the same model (legacy recommenders/cml.py).
CML = UCML
