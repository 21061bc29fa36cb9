"""NCF family: MLP-CE recommender and the GMF⊕MLP hybrid (NeuMF).

Parity:
  MLPRec  — tf1 modules/interactions/pointwise_mlp_ce.py:6-44 (MLP over
            [u ‖ v] (+extra), no output bias, sigmoid CE summed) used by
            legacy recommenders through PointwiseMLPCE.
  NeuMF   — legacy interactions/pointwise_ge_mlp_ce.py:8-88:
            logit = α·hᵀ(u_ge ⊙ v_ge) + (1-α)·MLP([u_mlp ‖ v_mlp]) + b_i,
            separate GE and MLP embedding tables.

Serving scores the full catalog. MLP towers over B×I pairs would need
[B·I, 2D] activations; serving therefore chunks items (matching the
reference's tile/cross-join serve graph, pointwise_ge_ce.py:87-101, which
also materializes user×item pairs).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from openrec_tpu.models.base import Recommender
from openrec_tpu.modules.embedding import embedding_init, embedding_lookup
from openrec_tpu.modules.losses import bce_logits_loss, l2_half
from openrec_tpu.modules.mlp import MLP


@dataclasses.dataclass(frozen=True)
class MLPRec(Recommender):
    """Pointwise MLP-CE: logit = MLP([u ‖ v]) + b_i."""

    total_users: int
    total_items: int
    dim_user_embed: int
    dim_item_embed: int
    mlp_units: Sequence[int] = (64, 1)     # last must be 1
    dropout: Optional[float] = None
    l2_weight: float = 0.0

    @property
    def _mlp(self):
        return MLP(units=list(self.mlp_units), activation="relu",
                   out_activation=None, dropout_rate=self.dropout)

    def init(self, rng):
        r_u, r_i, r_m = jax.random.split(rng, 3)
        params = {
            "user_embed": embedding_init(r_u, self.total_users,
                                         self.dim_user_embed),
            "item_embed": embedding_init(r_i, self.total_items,
                                         self.dim_item_embed),
            "item_bias": jnp.zeros((self.total_items, 1)),
            "mlp": self._mlp.init(
                r_m, self.dim_user_embed + self.dim_item_embed),
        }
        params["mlp"][-1].pop("b", None)     # bias_out=False
        return params

    def _mlp_logit(self, params, x, rng=None):
        n = len(params["mlp"])
        for i, layer in enumerate(params["mlp"]):
            x = x @ layer["w"]
            if "b" in layer:
                x = x + layer["b"]
            if i < n - 1:
                x = jax.nn.relu(x)
                if self.dropout and rng is not None:
                    rng, sub = jax.random.split(rng)
                    keep = 1.0 - self.dropout
                    mask = jax.random.bernoulli(sub, keep, x.shape)
                    x = jnp.where(mask, x / keep, 0.0)
        return x

    def loss(self, params, batch, rng=None):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        item_vec = embedding_lookup(params["item_embed"], batch["item_id"])
        bias = embedding_lookup(params["item_bias"], batch["item_id"])
        x = jnp.concatenate([user_vec, item_vec], axis=1)
        logit = jnp.reshape(self._mlp_logit(params, x, rng) + bias, (-1,))
        task = bce_logits_loss(batch["label"], logit, reduction="sum")
        l2 = l2_half(user_vec, item_vec)
        return task + self.l2_weight * l2, {"loss": task, "l2_loss": l2}

    def score(self, params, batch, item_chunk: int = 4096):
        user_vec = embedding_lookup(params["user_embed"], batch["user_id"])
        B = user_vec.shape[0]
        item = params["item_embed"]
        bias = jnp.reshape(params["item_bias"], (-1,))
        I = item.shape[0]

        def score_chunk(lo):
            v = jax.lax.dynamic_slice_in_dim(item, lo, item_chunk, axis=0)
            b = jax.lax.dynamic_slice_in_dim(bias, lo, item_chunk, axis=0)
            u_rep = jnp.repeat(user_vec, item_chunk, axis=0)
            v_rep = jnp.tile(v, (B, 1))
            x = jnp.concatenate([u_rep, v_rep], axis=1)
            logits = self._mlp_logit(params, x).reshape(B, item_chunk)
            return logits + b[None, :]

        n_chunks = -(-I // item_chunk)
        pad = n_chunks * item_chunk - I
        item = jnp.pad(item, ((0, pad), (0, 0)))
        bias = jnp.pad(bias, (0, pad))
        chunks = [score_chunk(c * item_chunk) for c in range(n_chunks)]
        return jnp.concatenate(chunks, axis=1)[:, :I]


@dataclasses.dataclass(frozen=True)
class NeuMF(Recommender):
    """GMF⊕MLP hybrid: α·hᵀ(u_ge⊙v_ge) + (1-α)·MLP([u_mlp‖v_mlp]) + b_i."""

    total_users: int
    total_items: int
    dim_ge_embed: int
    dim_mlp_embed: int
    mlp_units: Sequence[int] = (64, 1)
    alpha: float = 0.5
    dropout: Optional[float] = None
    l2_weight: float = 0.0

    @property
    def _mlp(self):
        return MLP(units=list(self.mlp_units), activation="relu",
                   out_activation=None, dropout_rate=self.dropout)

    @property
    def _ge(self):
        return MLP(units=[1], use_bias=False)

    def init(self, rng):
        r = jax.random.split(rng, 6)
        params = {
            "user_ge": embedding_init(r[0], self.total_users,
                                      self.dim_ge_embed),
            "item_ge": embedding_init(r[1], self.total_items,
                                      self.dim_ge_embed),
            "user_mlp_embed": embedding_init(r[2], self.total_users,
                                             self.dim_mlp_embed),
            "item_mlp_embed": embedding_init(r[3], self.total_items,
                                             self.dim_mlp_embed),
            "item_bias": jnp.zeros((self.total_items, 1)),
            "ge_h": self._ge.init(r[4], self.dim_ge_embed),
            "mlp": self._mlp.init(r[5], 2 * self.dim_mlp_embed),
        }
        params["mlp"][-1].pop("b", None)
        return params

    def _mlp_out(self, params, x, rng=None):
        n = len(params["mlp"])
        for i, layer in enumerate(params["mlp"]):
            x = x @ layer["w"]
            if "b" in layer:
                x = x + layer["b"]
            if i < n - 1:
                x = jax.nn.relu(x)
                if self.dropout and rng is not None:
                    rng, sub = jax.random.split(rng)
                    keep = 1.0 - self.dropout
                    mask = jax.random.bernoulli(sub, keep, x.shape)
                    x = jnp.where(mask, x / keep, 0.0)
        return x

    def _logit(self, params, user_id, item_id, rng=None):
        u_ge = embedding_lookup(params["user_ge"], user_id)
        v_ge = embedding_lookup(params["item_ge"], item_id)
        u_mlp = embedding_lookup(params["user_mlp_embed"], user_id)
        v_mlp = embedding_lookup(params["item_mlp_embed"], item_id)
        bias = embedding_lookup(params["item_bias"], item_id)
        ge = self._ge.apply(params["ge_h"], u_ge * v_ge)
        mlp = self._mlp_out(params,
                            jnp.concatenate([u_mlp, v_mlp], axis=1), rng)
        return jnp.reshape(self.alpha * ge + (1 - self.alpha) * mlp + bias,
                           (-1,))

    def loss(self, params, batch, rng=None):
        logit = self._logit(params, batch["user_id"], batch["item_id"],
                            rng)
        task = bce_logits_loss(batch["label"], logit, reduction="sum")
        u_ge = embedding_lookup(params["user_ge"], batch["user_id"])
        v_ge = embedding_lookup(params["item_ge"], batch["item_id"])
        l2 = l2_half(u_ge, v_ge)
        return task + self.l2_weight * l2, {"loss": task, "l2_loss": l2}

    def score(self, params, batch, item_chunk: int = 4096):
        user_id = batch["user_id"]
        B = user_id.shape[0]
        I = params["item_ge"].shape[0]
        # GE half is a matmul (same trick as GMF.score).
        u_ge = embedding_lookup(params["user_ge"], user_id)
        h = params["ge_h"][0]["w"][:, 0]
        ge = (u_ge * h[None, :]) @ params["item_ge"].T

        u_mlp = embedding_lookup(params["user_mlp_embed"], user_id)
        item_mlp = params["item_mlp_embed"]
        bias = jnp.reshape(params["item_bias"], (-1,))
        n_chunks = -(-I // item_chunk)
        pad = n_chunks * item_chunk - I
        item_mlp = jnp.pad(item_mlp, ((0, pad), (0, 0)))

        def mlp_chunk(lo):
            v = jax.lax.dynamic_slice_in_dim(item_mlp, lo, item_chunk,
                                             axis=0)
            u_rep = jnp.repeat(u_mlp, item_chunk, axis=0)
            v_rep = jnp.tile(v, (B, 1))
            x = jnp.concatenate([u_rep, v_rep], axis=1)
            return self._mlp_out(params, x).reshape(B, item_chunk)

        mlp = jnp.concatenate(
            [mlp_chunk(c * item_chunk) for c in range(n_chunks)],
            axis=1)[:, :I]
        return self.alpha * ge + (1 - self.alpha) * mlp + bias[None, :]
