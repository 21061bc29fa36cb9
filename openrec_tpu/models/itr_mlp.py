"""ItrMLP — temporal embedding forward-propagation recommender.

Parity: legacy recommenders/itr_mlp.py:8-106 + extractions/
temporal_latent_factor.py:7-91:
  - user/item embedding tables are FROZEN (non-trainable); a trainable MLP
    (batch-norm, relu output) transforms looked-up rows;
  - rows touched since the last update are tracked (visit flags);
  - `update_embeddings(params)` writes MLP(emb) back into the tables for
    all visited rows and clears the flags (forward_update_embeddings);
  - `pretrain_identity(params, rng)` pretrains both MLPs toward the
    identity map on uniform(-0.5, 0.5) inputs (pretrain_mlp_as_identity,
    20k Adam steps of batch 32);
  - interaction: PointwiseMSE with sigmoid (itr_mlp.py:99-105).

Functional re-design: visit flags are boolean vectors in the params pytree
(updated in post_step, all inside the jitted train step); freezing is
lax.stop_gradient on the table lookups.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from openrec_tpu.models.base import Recommender
from openrec_tpu.modules.embedding import embedding_lookup
from openrec_tpu.modules.mlp import MLP


@dataclasses.dataclass(frozen=True, eq=False)
class ItrMLP(Recommender):
    total_users: int
    total_items: int
    dim_embed: int
    user_dims: Sequence[int] = ()          # user MLP dims (last=dim_embed)
    item_dims: Sequence[int] = ()
    pretrained_user_embeddings: object = None
    pretrained_item_embeddings: object = None
    a: float = 1.0
    b: float = 1.0
    l2_weight: float = 0.0

    @property
    def _user_mlp(self):
        units = list(self.user_dims) or [self.dim_embed]
        return MLP(units=units, activation="relu", out_activation="relu",
                   batch_norm=True)

    @property
    def _item_mlp(self):
        units = list(self.item_dims) or [self.dim_embed]
        return MLP(units=units, activation="relu", out_activation="relu",
                   batch_norm=True)

    def init(self, rng):
        r_u, r_i = jax.random.split(rng)
        if self.pretrained_user_embeddings is not None:
            user_embed = jnp.asarray(self.pretrained_user_embeddings)
        else:
            user_embed = 0.01 * jax.random.truncated_normal(
                r_u, -2.0, 2.0, (self.total_users, self.dim_embed))
        if self.pretrained_item_embeddings is not None:
            item_embed = jnp.asarray(self.pretrained_item_embeddings)
        else:
            item_embed = 0.01 * jax.random.truncated_normal(
                r_i, -2.0, 2.0, (self.total_items, self.dim_embed))
        return {
            "user_embed": user_embed,          # frozen via stop_gradient
            "item_embed": item_embed,          # frozen via stop_gradient
            "user_flag": jnp.zeros((self.total_users,)),  # float 0/1: keeps optimizers happy
            "item_flag": jnp.zeros((self.total_items,)),
            "item_bias": jnp.zeros((self.total_items, 1)),
            "user_mlp": self._user_mlp.init(jax.random.fold_in(rng, 1),
                                            self.dim_embed),
            "item_mlp": self._item_mlp.init(jax.random.fold_in(rng, 2),
                                            self.dim_embed),
        }

    def _user_vec(self, params, user_ids):
        raw = jax.lax.stop_gradient(
            embedding_lookup(params["user_embed"], user_ids))
        return self._user_mlp.apply(params["user_mlp"], raw)

    def _item_vec(self, params, item_ids):
        raw = jax.lax.stop_gradient(
            embedding_lookup(params["item_embed"], item_ids))
        return self._item_mlp.apply(params["item_mlp"], raw)

    def loss(self, params, batch, rng=None):
        user_vec = self._user_vec(params, batch["user_id"])
        item_vec = self._item_vec(params, batch["item_id"])
        bias = embedding_lookup(params["item_bias"], batch["item_id"])
        label = batch["label"]
        pred = jax.nn.sigmoid(jnp.sum(user_vec * item_vec, axis=1)
                              + jnp.reshape(bias, (-1,)))
        weight = (self.a - self.b) * label + self.b
        task = 0.5 * jnp.sum((weight * (label - pred)) ** 2)
        return task, {"loss": task}

    def post_step(self, params, batch):
        # Track visited rows (temporal_latent_factor.py:36-39).
        params = dict(params)
        params["user_flag"] = params["user_flag"].at[
            batch["user_id"]].set(1.0)
        params["item_flag"] = params["item_flag"].at[
            batch["item_id"]].set(1.0)
        return params

    def update_embeddings(self, params):
        """forward_update_embeddings: table[visited] ← MLP(table[visited]);
        clear flags. Functional over full tables with a where-select (static
        shapes; untouched rows keep their value)."""
        params = dict(params)
        new_user = self._user_mlp.apply(params["user_mlp"],
                                        params["user_embed"])
        params["user_embed"] = jnp.where(params["user_flag"][:, None] > 0,
                                         new_user, params["user_embed"])
        new_item = self._item_mlp.apply(params["item_mlp"],
                                        params["item_embed"])
        params["item_embed"] = jnp.where(params["item_flag"][:, None] > 0,
                                         new_item, params["item_embed"])
        params["user_flag"] = jnp.zeros_like(params["user_flag"])
        params["item_flag"] = jnp.zeros_like(params["item_flag"])
        return params

    def pretrain_identity(self, params, rng, steps: int = 2000,
                          batch: int = 32, lr: float = 1e-3):
        """Pretrain both MLPs toward identity on U(-0.5, 0.5) inputs
        (temporal_latent_factor.py:82-88; step count configurable — the
        reference hardcodes 20000)."""
        params = dict(params)
        for key, mlp in (("user_mlp", self._user_mlp),
                         ("item_mlp", self._item_mlp)):
            tx = optax.adam(lr)
            mlp_params = params[key]
            opt_state = tx.init(mlp_params)

            @jax.jit
            def step(mlp_params, opt_state, x, mlp=mlp):
                def loss_fn(p):
                    out = mlp.apply(p, x)
                    return 0.5 * jnp.sum((out - x) ** 2)
                g = jax.grad(loss_fn)(mlp_params)
                updates, opt_state = tx.update(g, opt_state, mlp_params)
                return optax.apply_updates(mlp_params, updates), opt_state

            for i in range(steps):
                rng, sub = jax.random.split(rng)
                x = jax.random.uniform(sub, (batch, self.dim_embed),
                                       minval=-0.5, maxval=0.5)
                mlp_params, opt_state = step(mlp_params, opt_state, x)
            params[key] = mlp_params
        return params

    def score(self, params, batch):
        user_vec = self._user_vec(params, batch["user_id"])
        item_full = self._item_mlp.apply(params["item_mlp"],
                                         params["item_embed"])
        return jax.nn.sigmoid(
            user_vec @ item_full.T
            + jnp.reshape(params["item_bias"], (-1,)))
