"""User-feature recommenders.

Parity:
  UserPMF        legacy recommenders/user_pmf.py:5-51 — PMF with
                 user_vec = Average(weight=2)(latent, MLP(user features))
  UserVisualPMF  legacy recommenders/user_visual_pmf.py:5-49 — the same plus
                 the VisualPMF item pathway.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from openrec_tpu.models.base import Recommender
from openrec_tpu.modules.embedding import embedding_lookup
from openrec_tpu.modules.losses import l2_half
from openrec_tpu.modules.mlp import MLP


@dataclasses.dataclass(frozen=True, eq=False)
class UserPMF(Recommender):
    total_users: int
    total_items: int
    dim_embed: int
    user_features: object = None            # [total_users, dim_uf]
    mlp_units: Sequence[int] = ()
    a: float = 1.0
    b: float = 1.0
    sigmoid: bool = True
    dropout: Optional[float] = None
    l2_weight: float = 0.0

    @property
    def _user_mlp(self):
        return MLP(units=list(self.mlp_units) + [self.dim_embed],
                   activation="relu", out_activation=None,
                   dropout_rate=self.dropout)

    def _ufeat(self):
        return jnp.asarray(self.user_features)

    def init(self, rng):
        r_u, r_i, r_m = jax.random.split(rng, 3)
        return {
            "user_embed": 0.01 * jax.random.truncated_normal(
                r_u, -2.0, 2.0, (self.total_users, self.dim_embed)),
            "item_embed": 0.01 * jax.random.truncated_normal(
                r_i, -2.0, 2.0, (self.total_items, self.dim_embed)),
            "item_bias": jnp.zeros((self.total_items, 1)),
            "user_mlp": self._user_mlp.init(r_m, self._ufeat().shape[1]),
        }

    def _user_vec(self, params, user_ids, features=None, rng=None):
        emb = embedding_lookup(params["user_embed"], user_ids)
        f = features if features is not None else self._ufeat()[user_ids]
        proj = self._user_mlp.apply(params["user_mlp"], f,
                                    train=rng is not None, rng=rng)
        return emb + proj

    def loss(self, params, batch, rng=None):
        user_vec = self._user_vec(params, batch["user_id"],
                                  batch.get("user_feature"), rng)
        item_vec = embedding_lookup(params["item_embed"], batch["item_id"])
        bias = embedding_lookup(params["item_bias"], batch["item_id"])
        label = batch["label"]
        pred = jnp.sum(user_vec * item_vec, axis=1) \
            + jnp.reshape(bias, (-1,))
        if self.sigmoid:
            pred = jax.nn.sigmoid(pred)
        weight = (self.a - self.b) * label + self.b
        task = 0.5 * jnp.sum((weight * (label - pred)) ** 2)
        l2 = l2_half(user_vec, item_vec)
        return task + self.l2_weight * l2, {"loss": task, "l2_loss": l2}

    def score(self, params, batch):
        user_vec = self._user_vec(params, batch["user_id"])
        scores = user_vec @ params["item_embed"].T \
            + jnp.reshape(params["item_bias"], (-1,))
        return jax.nn.sigmoid(scores) if self.sigmoid else scores


@dataclasses.dataclass(frozen=True, eq=False)
class UserVisualPMF(UserPMF):
    item_features: object = None
    item_mlp_units: Sequence[int] = ()

    @property
    def _item_mlp(self):
        return MLP(units=list(self.item_mlp_units) + [self.dim_embed],
                   activation="relu", out_activation=None,
                   dropout_rate=self.dropout)

    def _ifeat(self):
        return jnp.asarray(self.item_features)

    def init(self, rng):
        params = super().init(rng)
        r_m = jax.random.fold_in(rng, 17)
        params["item_mlp"] = self._item_mlp.init(r_m,
                                                 self._ifeat().shape[1])
        return params

    def _item_vec(self, params, item_ids, features=None):
        emb = embedding_lookup(params["item_embed"], item_ids)
        f = features if features is not None else self._ifeat()[item_ids]
        return emb + self._item_mlp.apply(params["item_mlp"], f)

    def loss(self, params, batch, rng=None):
        user_vec = self._user_vec(params, batch["user_id"],
                                  batch.get("user_feature"), rng)
        item_vec = self._item_vec(params, batch["item_id"],
                                  batch.get("item_vfeature"))
        bias = embedding_lookup(params["item_bias"], batch["item_id"])
        label = batch["label"]
        pred = jnp.sum(user_vec * item_vec, axis=1) \
            + jnp.reshape(bias, (-1,))
        if self.sigmoid:
            pred = jax.nn.sigmoid(pred)
        weight = (self.a - self.b) * label + self.b
        task = 0.5 * jnp.sum((weight * (label - pred)) ** 2)
        l2 = l2_half(user_vec, item_vec)
        return task + self.l2_weight * l2, {"loss": task, "l2_loss": l2}

    def score(self, params, batch):
        user_vec = self._user_vec(params, batch["user_id"])
        proj = self._item_mlp.apply(params["item_mlp"], self._ifeat())
        item_full = params["item_embed"] + proj
        scores = user_vec @ item_full.T \
            + jnp.reshape(params["item_bias"], (-1,))
        return jax.nn.sigmoid(scores) if self.sigmoid else scores
