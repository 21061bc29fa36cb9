"""Fusion modules — combine module outputs into one representation.

Parity: legacy fusions/average.py:4-34 (weighted elementwise mean) and
legacy fusions/concat.py:4-33 (feature concatenation).
"""

from __future__ import annotations

import jax.numpy as jnp


def average_fusion(tensors, weight=1.0):
    """weight · Σtensors / len(tensors) — exactly legacy Average
    (fusions/average.py:28-33; its models pass weight=2.0 with two inputs,
    i.e. an elementwise sum)."""
    return weight * sum(tensors) / len(tensors)


def concat_fusion(tensors, axis=-1):
    return jnp.concatenate(tensors, axis=axis)
