"""NBPR — BPR with K negatives and WARP-style rank weighting.

Parity: legacy recommenders/nbpr.py:6-71 + interactions/ns_log.py:36-54.
Batch: user_id, p_item_id, n_item_id [B, K] (NPairwiseSampler).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from openrec_tpu.models.base import Recommender
from openrec_tpu.modules.embedding import embedding_init, embedding_lookup
from openrec_tpu.modules.losses import l2_half, multi_neg_log_loss


@dataclasses.dataclass(frozen=True)
class NBPR(Recommender):
    total_users: int
    total_items: int
    dim_embed: int
    l2_weight: float = 0.0

    def init(self, rng):
        r_u, r_i = jax.random.split(rng)
        return {
            "user_embed": embedding_init(r_u, self.total_users,
                                         self.dim_embed),
            "item_embed": embedding_init(r_i, self.total_items,
                                         self.dim_embed),
            "item_bias": jnp.zeros((self.total_items, 1)),
        }

    def loss(self, params, batch, rng=None):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        p_vec = embedding_lookup(params["item_embed"], batch["p_item_id"])
        n_vecs = embedding_lookup(params["item_embed"], batch["n_item_id"])
        p_bias = embedding_lookup(params["item_bias"], batch["p_item_id"])
        n_biases = embedding_lookup(params["item_bias"], batch["n_item_id"])
        task = multi_neg_log_loss(user_vec, p_vec, n_vecs, p_bias, n_biases,
                                  self.total_items)
        l2 = l2_half(user_vec, p_vec, n_vecs)
        return task + self.l2_weight * l2, {"loss": task, "l2_loss": l2}

    def score(self, params, batch):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        return user_vec @ params["item_embed"].T \
            + jnp.reshape(params["item_bias"], (-1,))


@dataclasses.dataclass(frozen=True)
class WCML(Recommender):
    """WCML — multi-negative collaborative metric learning.

    Parity: legacy recommenders/wcml.py:7-116 + interactions/
    ns_eu_dist.py:39-56; post-training norm censoring like CML.
    """
    total_users: int
    total_items: int
    dim_embed: int
    margin: float = 0.5
    l2_weight: float = 0.0

    def init(self, rng):
        r_u, r_i = jax.random.split(rng)
        return {
            "user_embed": embedding_init(r_u, self.total_users,
                                         self.dim_embed),
            "item_embed": embedding_init(r_i, self.total_items,
                                         self.dim_embed),
            "item_bias": jnp.zeros((self.total_items, 1)),
        }

    def loss(self, params, batch, rng=None):
        from openrec_tpu.modules.losses import multi_neg_eudist_loss
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        p_vec = embedding_lookup(params["item_embed"], batch["p_item_id"])
        n_vecs = embedding_lookup(params["item_embed"], batch["n_item_id"])
        p_bias = embedding_lookup(params["item_bias"], batch["p_item_id"])
        n_biases = embedding_lookup(params["item_bias"], batch["n_item_id"])
        task = multi_neg_eudist_loss(user_vec, p_vec, n_vecs, p_bias,
                                     n_biases, self.total_items,
                                     margin=self.margin)
        l2 = l2_half(user_vec, p_vec, n_vecs)
        return task + self.l2_weight * l2, {"loss": task, "l2_loss": l2}

    def post_step(self, params, batch):
        from openrec_tpu.modules.embedding import censor_norm
        params = dict(params)
        params["user_embed"] = censor_norm(params["user_embed"],
                                           batch["user_id"])
        item_ids = jnp.concatenate([batch["p_item_id"],
                                    batch["n_item_id"].reshape(-1)])
        params["item_embed"] = censor_norm(params["item_embed"], item_ids)
        return params

    def score(self, params, batch):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        item = params["item_embed"]
        sq_u = jnp.sum(user_vec ** 2, axis=1, keepdims=True)
        sq_v = jnp.sum(item ** 2, axis=1)
        return 2.0 * (user_vec @ item.T) - sq_u - sq_v[None, :] \
            + jnp.reshape(params["item_bias"], (-1,))
