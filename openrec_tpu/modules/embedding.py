"""Embedding tables as plain arrays + pure functions.

Capability parity with the reference's LatentFactor family:
  - uniform / zero init        (openrec/tf2/modules/latent_factor.py:4-16)
  - norm censoring             (latent_factor.py:17-23; legacy
                                extractions/latent_factor.py:44-80)
  - fixed (non-trainable) look-up tables (legacy extractions/look_up.py)
  - temporal MLP-transformed tables (legacy temporal_latent_factor.py) live
    in models/itr_mlp.py on top of these primitives.

A table is just a [num, dim] jnp array in the params pytree; lookup is
jnp.take (XLA lowers it to a dynamic-gather that the TPU executes out of
HBM); censoring is a functional scatter returning a new table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def embedding_init(rng, num: int, dim: int, zero_init: bool = False,
                   scale: float = 0.05, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform(-scale, scale) like keras 'uniform', or zeros."""
    if zero_init:
        return jnp.zeros((num, dim), dtype=dtype)
    return jax.random.uniform(rng, (num, dim), dtype=dtype,
                              minval=-scale, maxval=scale)


def embedding_lookup(table, ids) -> jnp.ndarray:
    # SubTable views (training/sparse.py) carry their own id remapping.
    if hasattr(table, "lookup"):
        return table.lookup(ids)
    # mode='clip': out-of-range ids clamp to the nearest row instead of
    # producing NaN fills (jnp.take's default 'fill' mode); also lowers to
    # the cheapest TPU gather.
    return jnp.take(table, ids, axis=0, mode="clip")


def censor_norm(table: jnp.ndarray, ids, eps: float = 0.1) -> jnp.ndarray:
    """Project rows `ids` onto the unit ball: row /= max(‖row‖, eps).

    Mirrors tf2 LatentFactor.censor (latent_factor.py:17-23). Duplicate ids
    are safe — the update is a pure function of the original row.
    """
    rows = jnp.take(table, ids, axis=0)
    norm = jnp.linalg.norm(rows, axis=-1, keepdims=True)
    return table.at[ids].set(rows / jnp.maximum(norm, eps))


def censor_max_norm(table: jnp.ndarray, ids, max_norm: float = 1.0
                    ) -> jnp.ndarray:
    """Clip rows to ‖row‖ ≤ max_norm (legacy censor_l2_norm_op semantics,
    legacy extractions/latent_factor.py:44-80)."""
    rows = jnp.take(table, ids, axis=0)
    norm = jnp.linalg.norm(rows, axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return table.at[ids].set(rows * scale)
