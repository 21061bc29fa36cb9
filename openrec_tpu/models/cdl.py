"""CDL — collaborative deep learning (PMF + SDAE item content).

Parity: legacy recommenders/cdl.py:5-54 — PMF whose item vector is
Average(weight=2)(latent, SDAE.encode(item features)) = latent + code;
the SDAE reconstruction term joins the training loss
(legacy extractions/sdae.py:7-66).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from openrec_tpu.models.base import Recommender
from openrec_tpu.modules.embedding import embedding_lookup
from openrec_tpu.modules.losses import l2_half
from openrec_tpu.modules.sdae import SDAE


@dataclasses.dataclass(frozen=True, eq=False)
class CDL(Recommender):
    total_users: int
    total_items: int
    dim_embed: int
    item_features: object = None           # [total_items, dim_f]
    encoder_dims: Sequence[int] = ()       # hidden dims; code dim appended
    dropout: float = 0.0
    l2_reconst: float = 1.0
    a: float = 1.0
    b: float = 1.0
    sigmoid: bool = True
    l2_weight: float = 0.0

    @property
    def _sdae(self):
        return SDAE(in_dim=int(jnp.asarray(self.item_features).shape[1]),
                    dims=list(self.encoder_dims) + [self.dim_embed],
                    dropout=self.dropout, l2_reconst=self.l2_reconst)

    def _feat(self):
        return jnp.asarray(self.item_features)

    def init(self, rng):
        r_u, r_i, r_s = jax.random.split(rng, 3)
        return {
            "user_embed": 0.01 * jax.random.truncated_normal(
                r_u, -2.0, 2.0, (self.total_users, self.dim_embed)),
            "item_embed": 0.01 * jax.random.truncated_normal(
                r_i, -2.0, 2.0, (self.total_items, self.dim_embed)),
            "item_bias": jnp.zeros((self.total_items, 1)),
            "sdae": self._sdae.init(r_s),
        }

    def loss(self, params, batch, rng=None):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        emb = embedding_lookup(params["item_embed"], batch["item_id"])
        f = batch.get("item_feature")
        if f is None:
            f = self._feat()[batch["item_id"]]
        reconst, code = self._sdae.reconstruction_loss(params["sdae"], f,
                                                       rng=rng)
        item_vec = emb + code
        bias = embedding_lookup(params["item_bias"], batch["item_id"])
        label = batch["label"]
        pred = jnp.sum(user_vec * item_vec, axis=1) \
            + jnp.reshape(bias, (-1,))
        if self.sigmoid:
            pred = jax.nn.sigmoid(pred)
        weight = (self.a - self.b) * label + self.b
        task = 0.5 * jnp.sum((weight * (label - pred)) ** 2)
        l2 = l2_half(user_vec, item_vec)
        total = task + reconst + self.l2_weight * l2
        return total, {"loss": task, "reconst_loss": reconst, "l2_loss": l2}

    def score(self, params, batch):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        code = self._sdae.encode(params["sdae"], self._feat())
        item_full = params["item_embed"] + code
        scores = user_vec @ item_full.T \
            + jnp.reshape(params["item_bias"], (-1,))
        return jax.nn.sigmoid(scores) if self.sigmoid else scores
