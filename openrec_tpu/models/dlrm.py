"""DLRM — deep learning recommendation model (Naumov et al.).

Parity: openrec/tf2/recommenders/dlrm.py:6-100 — per-feature embedding
tables (ln_emb), bottom MLP over dense features, pairwise dot interaction
(or concat), top MLP, MSE/BCE loss, loss_threshold prediction clipping.

TPU re-design notes:
  - all sparse tables share one lookup path; per-table gathers are batched
    by XLA into HBM gathers; the sharded variant (parallel/embedding.py)
    row-shards the concatenated table space over the mesh 'model' axis;
  - interaction is one [B, F, D] einsum on the MXU instead of a Python list
    of per-pair ops.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from openrec_tpu.models.base import Recommender
from openrec_tpu.modules.embedding import embedding_init
from openrec_tpu.modules.interactions import second_order_interaction
from openrec_tpu.modules.losses import bce_loss, mse_loss
from openrec_tpu.modules.mlp import MLP


@dataclasses.dataclass(frozen=True)
class DLRM(Recommender):
    m_spa: int                       # sparse embedding dim
    ln_emb: Sequence[int]            # rows per sparse table
    ln_bot: Sequence[int]            # bottom MLP units
    ln_top: Sequence[int]            # top MLP units (last = 1)
    dim_dense: int                   # number of dense input features
    arch_interaction_op: str = "dot"
    arch_interaction_itself: bool = False
    sigmoid_bot: bool = False
    sigmoid_top: bool = True
    loss_func: str = "mse"
    loss_threshold: float = 0.0
    # fused_tables: store all sparse tables as ONE [Σrows, m_spa] array
    # with per-table offsets — 26 gathers collapse into 1, the row axis
    # becomes a single shardable/sparse-updatable dimension.
    fused_tables: bool = False
    # 'bfloat16' runs the MLP towers and interaction on the MXU in bf16
    # (params and optimizer stay fp32; the prediction/loss are fp32).
    compute_dtype: str = "float32"

    def __post_init__(self):
        if self.arch_interaction_op not in ("dot", "cat"):
            raise ValueError(
                f"arch_interaction_op={self.arch_interaction_op} "
                "is not supported")
        if self.loss_func not in ("mse", "bce"):
            raise ValueError(f"loss_func={self.loss_func} is not supported")
        if self.arch_interaction_op == "dot" \
                and self.ln_bot[-1] != self.m_spa:
            raise ValueError(
                f"dot interaction requires ln_bot[-1] == m_spa "
                f"(got {self.ln_bot[-1]} vs {self.m_spa})")

    @property
    def _mlp_bot(self):
        return MLP(units=list(self.ln_bot), activation="relu",
                   out_activation="sigmoid" if self.sigmoid_bot else "relu")

    @property
    def _mlp_top(self):
        return MLP(units=list(self.ln_top), activation="relu",
                   out_activation="sigmoid" if self.sigmoid_top else "relu")

    def _top_in_dim(self):
        F = len(self.ln_emb) + 1     # sparse features + dense embedding
        if self.arch_interaction_op == "dot":
            k = 1 if not self.arch_interaction_itself else 0
            pairs = F * (F - 1) // 2 if k else F * (F + 1) // 2
            return self.ln_bot[-1] + pairs
        return len(self.ln_emb) * self.m_spa + self.ln_bot[-1]

    @property
    def table_offsets(self):
        import numpy as np
        return np.concatenate([[0], np.cumsum(self.ln_emb)])

    def init(self, rng):
        n_tables = len(self.ln_emb)
        rngs = jax.random.split(rng, n_tables + 2)
        params = {
            "mlp_bot": self._mlp_bot.init(rngs[-2], self.dim_dense),
            "mlp_top": self._mlp_top.init(rngs[-1], self._top_in_dim()),
        }
        if self.fused_tables:
            tables = [embedding_init(rngs[i], num, self.m_spa)
                      for i, num in enumerate(self.ln_emb)]
            params["embed_fused"] = jnp.concatenate(tables, axis=0)
        else:
            params["embed_tables"] = [
                embedding_init(rngs[i], num, self.m_spa)
                for i, num in enumerate(self.ln_emb)]
        return params

    def flat_sparse_ids(self, sparse_features):
        """[B, T] per-table ids → [B, T] ids into the fused row space."""
        offsets = jnp.asarray(self.table_offsets[:-1], jnp.int32)
        return sparse_features + offsets[None, :]

    def predict(self, params, dense_features, sparse_features):
        """dense: [B, dim_dense]; sparse: [B, num_tables] int → [B] preds."""
        from openrec_tpu.modules.embedding import embedding_lookup
        cdt = jnp.dtype(self.compute_dtype)
        if cdt != jnp.float32:
            dense_features = dense_features.astype(cdt)
            params = dict(params)
            for key in ("mlp_bot", "mlp_top"):
                params[key] = jax.tree_util.tree_map(
                    lambda x: x.astype(cdt), params[key])
        if self.fused_tables:
            flat = self.flat_sparse_ids(sparse_features)      # [B, T]
            rows = embedding_lookup(params["embed_fused"],
                                    flat.reshape(-1))
            rows = rows.reshape(sparse_features.shape[0],
                                len(self.ln_emb), self.m_spa)
            sparse_vecs = [rows[:, i, :] for i in range(len(self.ln_emb))]
        else:
            sparse_vecs = [embedding_lookup(tbl, sparse_features[:, i])
                           for i, tbl in enumerate(params["embed_tables"])]
        if cdt != jnp.float32:
            sparse_vecs = [v.astype(cdt) for v in sparse_vecs]
        dense_vec = self._mlp_bot.apply(params["mlp_bot"], dense_features)

        if self.arch_interaction_op == "dot":
            inter = second_order_interaction(
                sparse_vecs + [dense_vec],
                self_interaction=self.arch_interaction_itself)
            top_in = jnp.concatenate([dense_vec, inter], axis=1)
        else:
            top_in = jnp.concatenate(sparse_vecs + [dense_vec], axis=1)

        pred = self._mlp_top.apply(params["mlp_top"], top_in)
        pred = pred.astype(jnp.float32)
        if 0.0 < self.loss_threshold < 1.0:
            pred = jnp.clip(pred, self.loss_threshold,
                            1.0 - self.loss_threshold)
        return jnp.reshape(pred, (-1,))

    def loss(self, params, batch, rng=None):
        pred = self.predict(params, batch["dense_features"],
                            batch["sparse_features"])
        if self.loss_func == "mse":
            task = mse_loss(batch["label"], pred)
        else:
            task = bce_loss(batch["label"], pred)
        return task, {"loss": task}

    def score(self, params, batch):
        return self.predict(params, batch["dense_features"],
                            batch["sparse_features"])


def criteo_dlrm(counts, dim_embed=4, ln_bot=(8, 4), ln_top=(128, 64, 1),
                **kw) -> DLRM:
    """The reference Criteo config (tf2_examples/dlrm_criteo.py:9-14,29-38)."""
    return DLRM(m_spa=dim_embed, ln_emb=tuple(int(c) for c in counts),
                ln_bot=tuple(ln_bot), ln_top=tuple(ln_top), dim_dense=13,
                loss_func="bce", **kw)
