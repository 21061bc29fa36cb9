"""Stacked denoising autoencoder (CDL's item-content pathway).

Parity: legacy extractions/sdae.py:7-66 — encoder MLP, decoder MLP (mirrored
dims), reconstruction term l2_reconst * ‖dec(enc(x)) - x‖², plus optional
input corruption (denoising) via dropout on the input.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from openrec_tpu.modules.mlp import MLP


@dataclasses.dataclass(frozen=True)
class SDAE:
    in_dim: int
    dims: Sequence[int]           # encoder dims; last entry = code dim
    dropout: float = 0.0          # input corruption rate
    l2_reconst: float = 1.0

    def _encoder(self):
        return MLP(units=list(self.dims), activation="relu",
                   out_activation=None)

    def _decoder(self):
        dec_dims = list(self.dims[-2::-1]) + [self.in_dim]
        return MLP(units=dec_dims, activation="relu", out_activation=None)

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        return {"encoder": self._encoder().init(r1, self.in_dim),
                "decoder": self._decoder().init(r2, self.dims[-1])}

    def encode(self, params, x):
        return self._encoder().apply(params["encoder"], x)

    def reconstruction_loss(self, params, x, rng=None):
        corrupted = x
        if self.dropout > 0.0 and rng is not None:
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(rng, keep, x.shape)
            corrupted = jnp.where(mask, x / keep, 0.0)
        code = self.encode(params, corrupted)
        recon = self._decoder().apply(params["decoder"], code)
        return self.l2_reconst * jnp.sum((recon - x) ** 2), code
