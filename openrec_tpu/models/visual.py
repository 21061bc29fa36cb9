"""Visual / feature-fusion recommenders.

Parity map:
  VBPR            tf1 recommenders/vbpr.py:6-58 — BPR whose item vector is
                  concat([item_embed(dim_item), MLP(visual)(dim_user-dim_item)])
  VisualBPR       legacy recommenders/visual_bpr.py:5-82 — BPR with
                  item_vec = latent + MLP(visual) (Average weight=2.0);
                  visual-MLP grads rescaled by 1/batch_size
                  (:74-82; NB the legacy scope check 'item_MLP' never matches
                  its actual 'item_visual_embed' scope — we apply the
                  intended rescale)
  VisualCML       legacy recommenders/visual_cml.py — VisualBPR with
                  euclidean hinge + censor
  VisualPMF       legacy recommenders/visual_pmf.py:5-53 — PMF + visual path
  VisualGMF       legacy recommenders/visual_gmf.py — GMF + visual path
  ConcatVisualBPR legacy recommenders/concat_visual_bpr.py:5-101 — item
                  vector concat([latent(dim-dim_ve), Linear(visual)(dim_ve)]),
                  visual-proj grads rescaled by 1/batch_size

The reference streams per-item feature rows through placeholders; here the
feature matrix lives on device (bfloat16 optional) and both train lookups
and full-catalog serving are gathers/matmuls from it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from openrec_tpu.models.base import Recommender
from openrec_tpu.modules.embedding import (
    censor_norm, embedding_init, embedding_lookup)
from openrec_tpu.modules.losses import (
    bce_logits_loss, l2_half, pairwise_eudist_hinge_loss, pairwise_log_loss)
from openrec_tpu.modules.mlp import MLP


def _scale_subtree(grads, key, factor):
    grads = dict(grads)
    grads[key] = jax.tree_util.tree_map(lambda g: g * factor, grads[key])
    return grads


@dataclasses.dataclass(frozen=True, eq=False)
class VBPR(Recommender):
    """tf1-macro VBPR: item vec = [id embedding ‖ MLP(visual features)]."""

    total_users: int
    total_items: int
    dim_user_embed: int
    dim_item_embed: int
    item_features: object = None            # [total_items, dim_v] array
    mlp_units: Optional[Sequence[int]] = None  # default single layer
    l2_weight: float = 0.001

    @property
    def _visual_mlp(self):
        units = (list(self.mlp_units) if self.mlp_units is not None
                 else [self.dim_user_embed - self.dim_item_embed])
        return MLP(units=units, activation="relu", out_activation=None)

    def _feat(self):
        return jnp.asarray(self.item_features)

    def init(self, rng):
        r_u, r_i, r_m = jax.random.split(rng, 3)
        dim_v = self._feat().shape[1]
        return {
            "user_embed": embedding_init(r_u, self.total_users,
                                         self.dim_user_embed),
            "item_embed": embedding_init(r_i, self.total_items,
                                         self.dim_item_embed),
            "item_bias": jnp.zeros((self.total_items, 1)),
            "visual_mlp": self._visual_mlp.init(r_m, dim_v),
        }

    def _item_vec(self, params, item_ids, vfeature=None):
        emb = embedding_lookup(params["item_embed"], item_ids)
        f = vfeature if vfeature is not None else self._feat()[item_ids]
        proj = self._visual_mlp.apply(params["visual_mlp"], f)
        return jnp.concatenate([emb, proj], axis=-1)

    def loss(self, params, batch, rng=None):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        p_vec = self._item_vec(params, batch["p_item_id"],
                               batch.get("p_item_vfeature"))
        n_vec = self._item_vec(params, batch["n_item_id"],
                               batch.get("n_item_vfeature"))
        p_bias = embedding_lookup(params["item_bias"], batch["p_item_id"])
        n_bias = embedding_lookup(params["item_bias"], batch["n_item_id"])
        task = pairwise_log_loss(user_vec, p_vec, n_vec, p_bias, n_bias)
        l2 = l2_half(user_vec, p_vec, n_vec)
        return task + self.l2_weight * l2, {"loss": task, "l2_loss": l2}

    def score(self, params, batch):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        proj = self._visual_mlp.apply(params["visual_mlp"], self._feat())
        item_full = jnp.concatenate([params["item_embed"], proj], axis=-1)
        return user_vec @ item_full.T \
            + jnp.reshape(params["item_bias"], (-1,))


@dataclasses.dataclass(frozen=True, eq=False)
class VisualBPR(Recommender):
    """legacy VisualBPR: item_vec = latent + MLP(visual); 1/B grad rescale."""

    total_users: int
    total_items: int
    dim_embed: int
    mlp_units: Sequence[int] = ()
    item_features: object = None
    dropout: Optional[float] = None
    l2_weight: float = 0.0

    @property
    def _visual_mlp(self):
        units = list(self.mlp_units) + [self.dim_embed]
        return MLP(units=units, activation="relu", out_activation=None,
                   dropout_rate=self.dropout)

    def _feat(self):
        return jnp.asarray(self.item_features)

    def init(self, rng):
        r_u, r_i, r_m = jax.random.split(rng, 3)
        return {
            "user_embed": embedding_init(r_u, self.total_users,
                                         self.dim_embed),
            "item_embed": embedding_init(r_i, self.total_items,
                                         self.dim_embed),
            "item_bias": jnp.zeros((self.total_items, 1)),
            "visual_mlp": self._visual_mlp.init(r_m, self._feat().shape[1]),
        }

    def _item_vec(self, params, item_ids, features=None, rng=None):
        emb = embedding_lookup(params["item_embed"], item_ids)
        f = features if features is not None else self._feat()[item_ids]
        proj = self._visual_mlp.apply(params["visual_mlp"], f,
                                      train=rng is not None, rng=rng)
        return emb + proj

    def loss(self, params, batch, rng=None):
        r1 = r2 = None
        if rng is not None and self.dropout:
            r1, r2 = jax.random.split(rng)
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        p_vec = self._item_vec(params, batch["p_item_id"],
                               batch.get("p_item_vfeature"), r1)
        n_vec = self._item_vec(params, batch["n_item_id"],
                               batch.get("n_item_vfeature"), r2)
        p_bias = embedding_lookup(params["item_bias"], batch["p_item_id"])
        n_bias = embedding_lookup(params["item_bias"], batch["n_item_id"])
        task = pairwise_log_loss(user_vec, p_vec, n_vec, p_bias, n_bias)
        l2 = l2_half(user_vec, p_vec, n_vec)
        return task + self.l2_weight * l2, {"loss": task, "l2_loss": l2}

    def grad_transform(self, grads, batch):
        return _scale_subtree(grads, "visual_mlp",
                              1.0 / batch["user_id"].shape[0])

    def score(self, params, batch):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        proj = self._visual_mlp.apply(params["visual_mlp"], self._feat())
        item_full = params["item_embed"] + proj
        return user_vec @ item_full.T \
            + jnp.reshape(params["item_bias"], (-1,))


@dataclasses.dataclass(frozen=True, eq=False)
class VisualCML(VisualBPR):
    """legacy VisualCML: VisualBPR pathway + euclidean hinge + censoring."""

    margin: float = 0.5

    def loss(self, params, batch, rng=None):
        r1 = r2 = None
        if rng is not None and self.dropout:
            r1, r2 = jax.random.split(rng)
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        p_vec = self._item_vec(params, batch["p_item_id"],
                               batch.get("p_item_vfeature"), r1)
        n_vec = self._item_vec(params, batch["n_item_id"],
                               batch.get("n_item_vfeature"), r2)
        p_bias = embedding_lookup(params["item_bias"], batch["p_item_id"])
        n_bias = embedding_lookup(params["item_bias"], batch["n_item_id"])
        task = pairwise_eudist_hinge_loss(user_vec, p_vec, n_vec, p_bias,
                                          n_bias, self.margin)
        l2 = l2_half(user_vec, p_vec, n_vec)
        return task + self.l2_weight * l2, {"loss": task, "l2_loss": l2}

    def post_step(self, params, batch):
        params = dict(params)
        params["user_embed"] = censor_norm(params["user_embed"],
                                           batch["user_id"])
        item_ids = jnp.concatenate([batch["p_item_id"], batch["n_item_id"]])
        params["item_embed"] = censor_norm(params["item_embed"], item_ids)
        return params

    def score(self, params, batch):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        proj = self._visual_mlp.apply(params["visual_mlp"], self._feat())
        item_full = params["item_embed"] + proj
        sq_u = jnp.sum(user_vec ** 2, axis=1, keepdims=True)
        sq_v = jnp.sum(item_full ** 2, axis=1)
        return 2.0 * (user_vec @ item_full.T) - sq_u - sq_v[None, :] \
            + jnp.reshape(params["item_bias"], (-1,))


@dataclasses.dataclass(frozen=True, eq=False)
class VisualPMF(Recommender):
    """legacy VisualPMF: PMF pointwise MSE, item_vec = latent + MLP(visual)."""

    total_users: int
    total_items: int
    dim_embed: int
    mlp_units: Sequence[int] = ()
    item_features: object = None
    a: float = 1.0
    b: float = 1.0
    sigmoid: bool = True
    dropout: Optional[float] = None
    l2_weight: float = 0.0

    @property
    def _visual_mlp(self):
        return MLP(units=list(self.mlp_units) + [self.dim_embed],
                   activation="relu", out_activation=None,
                   dropout_rate=self.dropout)

    def _feat(self):
        return jnp.asarray(self.item_features)

    def init(self, rng):
        r_u, r_i, r_m = jax.random.split(rng, 3)
        return {
            "user_embed": 0.01 * jax.random.truncated_normal(
                r_u, -2.0, 2.0, (self.total_users, self.dim_embed)),
            "item_embed": 0.01 * jax.random.truncated_normal(
                r_i, -2.0, 2.0, (self.total_items, self.dim_embed)),
            "item_bias": jnp.zeros((self.total_items, 1)),
            "visual_mlp": self._visual_mlp.init(r_m, self._feat().shape[1]),
        }

    def loss(self, params, batch, rng=None):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        emb = embedding_lookup(params["item_embed"], batch["item_id"])
        f = batch.get("item_vfeature")
        if f is None:
            f = self._feat()[batch["item_id"]]
        proj = self._visual_mlp.apply(params["visual_mlp"], f,
                                      train=rng is not None, rng=rng)
        item_vec = emb + proj
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

    def grad_transform(self, grads, batch):
        return _scale_subtree(grads, "visual_mlp",
                              1.0 / batch["user_id"].shape[0])

    def score(self, params, batch):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        proj = self._visual_mlp.apply(params["visual_mlp"], self._feat())
        item_full = params["item_embed"] + proj
        scores = user_vec @ item_full.T \
            + jnp.reshape(params["item_bias"], (-1,))
        return jax.nn.sigmoid(scores) if self.sigmoid else scores


@dataclasses.dataclass(frozen=True, eq=False)
class VisualGMF(Recommender):
    """legacy VisualGMF: GMF logit head, item_vec = latent + MLP(visual)."""

    total_users: int
    total_items: int
    dim_embed: int
    mlp_units: Sequence[int] = ()
    item_features: object = None
    l2_weight: float = 0.0

    @property
    def _visual_mlp(self):
        return MLP(units=list(self.mlp_units) + [self.dim_embed],
                   activation="relu", out_activation=None)

    @property
    def _ge_mlp(self):
        return MLP(units=[1], use_bias=False)

    def _feat(self):
        return jnp.asarray(self.item_features)

    def init(self, rng):
        r_u, r_i, r_m, r_g = jax.random.split(rng, 4)
        return {
            "user_embed": embedding_init(r_u, self.total_users,
                                         self.dim_embed),
            "item_embed": embedding_init(r_i, self.total_items,
                                         self.dim_embed),
            "item_bias": jnp.zeros((self.total_items, 1)),
            "visual_mlp": self._visual_mlp.init(r_m, self._feat().shape[1]),
            "mlp": self._ge_mlp.init(r_g, self.dim_embed),
        }

    def loss(self, params, batch, rng=None):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        emb = embedding_lookup(params["item_embed"], batch["item_id"])
        f = batch.get("item_vfeature")
        if f is None:
            f = self._feat()[batch["item_id"]]
        item_vec = emb + self._visual_mlp.apply(params["visual_mlp"], f)
        bias = embedding_lookup(params["item_bias"], batch["item_id"])
        logit = jnp.reshape(
            self._ge_mlp.apply(params["mlp"], user_vec * item_vec) + bias,
            (-1,))
        task = bce_logits_loss(batch["label"], logit, reduction="sum")
        l2 = l2_half(user_vec, item_vec)
        return task + self.l2_weight * l2, {"loss": task, "l2_loss": l2}

    def grad_transform(self, grads, batch):
        return _scale_subtree(grads, "visual_mlp",
                              1.0 / batch["user_id"].shape[0])

    def score(self, params, batch):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        proj = self._visual_mlp.apply(params["visual_mlp"], self._feat())
        item_full = params["item_embed"] + proj
        w = params["mlp"][0]["w"][:, 0]
        return (user_vec * w[None, :]) @ item_full.T \
            + jnp.reshape(params["item_bias"], (-1,))


@dataclasses.dataclass(frozen=True, eq=False)
class ConcatVisualBPR(Recommender):
    """legacy ConcatVisualBPR: item = [latent(dim-dim_ve) ‖ Linear(visual)]."""

    total_users: int
    total_items: int
    dim_embed: int
    dim_ve: int
    item_features: object = None
    l2_weight: float = 0.0

    @property
    def _proj(self):
        return MLP(units=[self.dim_ve], activation=None,
                   out_activation=None)

    def _feat(self):
        return jnp.asarray(self.item_features)

    def init(self, rng):
        r_u, r_i, r_m = jax.random.split(rng, 3)
        return {
            "user_embed": 0.01 * jax.random.truncated_normal(
                r_u, -2.0, 2.0, (self.total_users, self.dim_embed)),
            "item_embed": 0.01 * jax.random.truncated_normal(
                r_i, -2.0, 2.0,
                (self.total_items, self.dim_embed - self.dim_ve)),
            "item_bias": jnp.zeros((self.total_items, 1)),
            "visual_proj": self._proj.init(r_m, self._feat().shape[1]),
        }

    def _item_vec(self, params, item_ids, features=None):
        emb = embedding_lookup(params["item_embed"], item_ids)
        f = features if features is not None else self._feat()[item_ids]
        proj = self._proj.apply(params["visual_proj"], f)
        return jnp.concatenate([emb, proj], axis=-1)

    def loss(self, params, batch, rng=None):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        p_vec = self._item_vec(params, batch["p_item_id"],
                               batch.get("p_item_vfeature"))
        n_vec = self._item_vec(params, batch["n_item_id"],
                               batch.get("n_item_vfeature"))
        p_bias = embedding_lookup(params["item_bias"], batch["p_item_id"])
        n_bias = embedding_lookup(params["item_bias"], batch["n_item_id"])
        task = pairwise_log_loss(user_vec, p_vec, n_vec, p_bias, n_bias)
        l2 = l2_half(user_vec, p_vec, n_vec)
        return task + self.l2_weight * l2, {"loss": task, "l2_loss": l2}

    def grad_transform(self, grads, batch):
        return _scale_subtree(grads, "visual_proj",
                              1.0 / batch["user_id"].shape[0])

    def score(self, params, batch):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        proj = self._proj.apply(params["visual_proj"], self._feat())
        item_full = jnp.concatenate([params["item_embed"], proj], axis=-1)
        return user_vec @ item_full.T \
            + jnp.reshape(params["item_bias"], (-1,))
