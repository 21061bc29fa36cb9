"""Sequential recommenders — next-item prediction over user histories.

Parity map:
  RNNRec            tf1 recommenders/rnn_rec.py:6-67 + interactions/
                    rnn_softmax.py:3-31 — GRU/LSTM over item-embedding
                    sequence, softmax (full or sampled) over the catalog via
                    a separate output embedding [total_items, num_units]+bias.
  VanillaYouTubeRec tf1 recommenders/vanilla_youtube_rec.py:6-91 +
                    interactions/mlp_softmax.py:5-50 — masked mean-pool of
                    sequence embeddings (NB the reference divides by
                    max_seq_len, mlp_softmax.py:13-14 — reproduced) → MLP
                    [dim_item_embed, total_items] (no output bias) → softmax CE.
  YouTubeRec        tf1 recommenders/youtube_rec.py:6-94 — VanillaYouTubeRec
                    plus user demographic embeddings (gender, geo) concat'd
                    into the MLP input.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from openrec_tpu.models.base import Recommender
from openrec_tpu.modules.embedding import embedding_lookup
from openrec_tpu.modules.losses import sampled_softmax_loss, softmax_ce_loss
from openrec_tpu.modules.mlp import MLP, glorot_uniform
from openrec_tpu.modules.rnn import GRU, LSTM


def _normal_embed(rng, num, dim):
    """tf1 LatentFactor 'normal' init (truncated_normal(0.01))."""
    return 0.01 * jax.random.truncated_normal(rng, -2.0, 2.0, (num, dim))


@dataclasses.dataclass(frozen=True)
class RNNRec(Recommender):
    total_items: int
    dim_item_embed: int
    max_seq_len: int
    num_units: int
    cell_type: str = "gru"
    softmax_samples: Optional[int] = None   # sampled softmax when set
    # TF's sampled softmax defaults to the log-uniform (Zipf) candidate
    # sampler (rnn_softmax.py:24-26 leaves sampled_values=None); 'uniform'
    # is available for unranked catalogs.
    softmax_sample_distribution: str = "log_uniform"
    l2_weight: float = 0.0

    @property
    def _cell(self):
        if self.cell_type == "gru":
            return GRU(self.dim_item_embed, self.num_units)
        if self.cell_type == "lstm":
            return LSTM(self.dim_item_embed, self.num_units)
        raise ValueError("Invalid RNN cell type.")

    def init(self, rng):
        r_e, r_c, r_w = jax.random.split(rng, 3)
        return {
            "item_embed": _normal_embed(r_e, self.total_items,
                                        self.dim_item_embed),
            "cell": self._cell.init(r_c),
            "out_weight": glorot_uniform(r_w, (self.total_items,
                                               self.num_units)),
            "out_bias": jnp.zeros((self.total_items,)),
        }

    def _hidden(self, params, batch):
        seq_vecs = embedding_lookup(params["item_embed"],
                                    batch["seq_item_id"])
        return self._cell.apply(params["cell"], seq_vecs, batch["seq_len"])

    def loss(self, params, batch, rng=None):
        state = self._hidden(params, batch)
        if self.softmax_samples is not None:
            assert rng is not None, "sampled softmax needs an rng"
            task = sampled_softmax_loss(
                rng, params["out_weight"], params["out_bias"], state,
                batch["label"], num_sampled=self.softmax_samples,
                distribution=self.softmax_sample_distribution)
        else:
            logits = state @ params["out_weight"].T + params["out_bias"]
            task = softmax_ce_loss(logits, batch["label"])
        return task, {"loss": task}

    def score(self, params, batch):
        state = self._hidden(params, batch)
        return state @ params["out_weight"].T + params["out_bias"]


@dataclasses.dataclass(frozen=True)
class VanillaYouTubeRec(Recommender):
    total_items: int
    dim_item_embed: int
    max_seq_len: int
    mlp_units: Optional[Sequence[int]] = None   # default [dim_item, I]
    dropout: Optional[float] = None
    l2_weight: float = 0.0

    @property
    def _mlp(self):
        units = (list(self.mlp_units) if self.mlp_units is not None
                 else [self.dim_item_embed, self.total_items])
        # bias_out=False in the reference MLPSoftmax head.
        return MLP(units=units, activation="relu", out_activation=None,
                   dropout_rate=self.dropout)

    def _mlp_in_dim(self):
        return self.dim_item_embed

    def init(self, rng):
        r_e, r_m = jax.random.split(rng)
        params = {
            "item_embed": _normal_embed(r_e, self.total_items,
                                        self.dim_item_embed),
            "mlp": self._mlp.init(r_m, self._mlp_in_dim()),
        }
        # Drop the final layer's bias (reference bias_out=False).
        params["mlp"][-1].pop("b", None)
        return params

    def _mlp_logits(self, params, x, rng=None):
        # Final layer has no bias: apply layers manually mirrors MLP.apply
        # with a missing 'b' — MLP.apply handles absence via use_bias flag,
        # so run all but the head then the bias-free head.
        mlp = self._mlp
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

    def _pooled(self, params, batch):
        seq_vecs = embedding_lookup(params["item_embed"],
                                    batch["seq_item_id"])
        L = seq_vecs.shape[1]
        mask = (jnp.arange(L)[None, :]
                < batch["seq_len"][:, None]).astype(seq_vecs.dtype)
        # Reference divides by max_seq_len (reduce_mean over padded axis).
        return jnp.sum(seq_vecs * mask[:, :, None], axis=1) / L

    def _features(self, params, batch):
        return self._pooled(params, batch)

    def loss(self, params, batch, rng=None):
        x = self._features(params, batch)
        logits = self._mlp_logits(params, x, rng)
        task = softmax_ce_loss(logits, batch["label"])
        return task, {"loss": task}

    def score(self, params, batch):
        x = self._features(params, batch)
        return self._mlp_logits(params, x)


@dataclasses.dataclass(frozen=True)
class YouTubeRec(VanillaYouTubeRec):
    """VanillaYouTubeRec + user demographic embeddings (gender, geo)."""

    total_genders: int = 3
    total_geos: int = 100
    dim_gender_embed: int = 8
    dim_geo_embed: int = 8

    def _mlp_in_dim(self):
        return (self.dim_item_embed + self.dim_gender_embed
                + self.dim_geo_embed)

    def init(self, rng):
        params = super().init(rng)
        params["gender_embed"] = _normal_embed(
            jax.random.fold_in(rng, 3), self.total_genders,
            self.dim_gender_embed)
        params["geo_embed"] = _normal_embed(
            jax.random.fold_in(rng, 4), self.total_geos, self.dim_geo_embed)
        return params

    def _features(self, params, batch):
        pooled = self._pooled(params, batch)
        gender = embedding_lookup(params["gender_embed"],
                                  batch["user_gender"])
        geo = embedding_lookup(params["geo_embed"], batch["user_geo"])
        # Reference concat order: [user_vec, pooled_item]
        # (youtube_rec.py:57, mlp_softmax.py:16-17).
        return jnp.concatenate([gender, geo, pooled], axis=1)
