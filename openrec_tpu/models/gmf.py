"""GMF — generalized matrix factorization (NCF family).

Parity: openrec/tf2/recommenders/gmf.py:5-41 (logit = Dense_1(u⊙v) + b_i,
BCE-from-logits; l2 over user/item vecs and MLP weights) and legacy
interactions/pointwise_ge_ce.py:65-101.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from openrec_tpu.models.base import Recommender
from openrec_tpu.modules.embedding import embedding_init, embedding_lookup
from openrec_tpu.modules.losses import bce_logits_loss, l2_half
from openrec_tpu.modules.mlp import MLP


@dataclasses.dataclass(frozen=True)
class GMF(Recommender):
    total_users: int
    total_items: int
    dim_user_embed: int
    dim_item_embed: int
    l2_weight: float = 1.0

    @property
    def _mlp(self):
        return MLP(units=[1], use_bias=False)

    def init(self, rng):
        r_u, r_i, r_m = jax.random.split(rng, 3)
        return {
            "user_embed": embedding_init(r_u, self.total_users,
                                         self.dim_user_embed),
            "item_embed": embedding_init(r_i, self.total_items,
                                         self.dim_item_embed),
            "item_bias": jnp.zeros((self.total_items, 1)),
            "mlp": self._mlp.init(r_m, self.dim_item_embed),
        }

    def _logit(self, params, user_vec, item_vec, item_bias):
        out = self._mlp.apply(params["mlp"], user_vec * item_vec)
        return jnp.reshape(out + item_bias, (-1,))

    def loss(self, params, batch, rng=None):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        item_vec = embedding_lookup(params["item_embed"], batch["item_id"])
        item_bias = embedding_lookup(params["item_bias"], batch["item_id"])
        logit = self._logit(params, user_vec, item_vec, item_bias)
        task = bce_logits_loss(batch["label"], logit)
        l2 = l2_half(user_vec, item_vec) + self._mlp.l2(params["mlp"])
        return task + self.l2_weight * l2, {"loss": task, "l2_loss": l2}

    def score(self, params, batch):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        # Dense_1(u⊙v) with a single linear unit w reduces to (u*w)·Vᵀ — a
        # [B, D] x [D, I] matmul instead of materializing [B, I, D].
        w = params["mlp"][0]["w"][:, 0]                      # [D]
        logits = (user_vec * w[None, :]) @ params["item_embed"].T
        return logits + jnp.reshape(params["item_bias"], (-1,))
