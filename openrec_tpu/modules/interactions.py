"""Interaction blocks (feature crossing / scoring heads).

Parity targets:
  - SecondOrderFeatureInteraction (openrec/tf2/modules/
    second_order_feature_interaction.py:4-34): DLRM pairwise dot-interaction.
    NOTE: the reference composes a lower-triangular matrix with a
    strictly-upper boolean mask, which selects entries that its own
    LinearOperatorLowerTriangular already zeroed; since the Gram matrix is
    symmetric, the intended values are the pairwise dot products — we return
    those (the same fix as facebookresearch/dlrm's tril_indices selection).
  - masked mean-pool sequence encoder (tf1 modules/interactions/
    mlp_softmax.py:13-15).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def second_order_interaction(features, self_interaction: bool = False):
    """Pairwise dot products between feature vectors.

    features: [B, F, D] stacked features (or list of [B, D]).
    Returns [B, F*(F-1)/2] (or F*(F+1)/2 with self_interaction).
    """
    if isinstance(features, (list, tuple)):
        features = jnp.stack(features, axis=1)
    gram = jnp.einsum("bfd,bgd->bfg", features, features)
    F = features.shape[1]
    k = 0 if self_interaction else 1
    iu = np.triu_indices(F, k=k)
    return gram[:, iu[0], iu[1]]


def masked_mean_pool(seq_vecs, seq_len):
    """Mean over the first seq_len positions of each row.

    seq_vecs: [B, L, D]; seq_len: [B] int. Matches tf1 mlp_softmax.py:13-15
    (sum over valid positions / seq_len).
    """
    L = seq_vecs.shape[1]
    mask = (jnp.arange(L)[None, :] < seq_len[:, None]).astype(seq_vecs.dtype)
    summed = jnp.sum(seq_vecs * mask[:, :, None], axis=1)
    denom = jnp.maximum(seq_len.astype(seq_vecs.dtype), 1.0)
    return summed / denom[:, None]
