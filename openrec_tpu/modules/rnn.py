"""Recurrent sequence encoders (GRU / LSTM) via lax.scan.

Parity: tf1 modules/interactions/rnn_softmax.py:14-18 runs a
GRUCell/LSTMCell dynamic_rnn over padded item sequences and reads the final
valid state. Here the scan is compiled once with static [B, L] shapes; the
"final valid state" is selected with a mask inside the scan (no dynamic
shapes), which is the XLA-friendly analog of sequence_length in dynamic_rnn.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from openrec_tpu.modules.mlp import glorot_uniform


@dataclasses.dataclass(frozen=True)
class GRU:
    dim_in: int
    dim_hidden: int

    def init(self, rng):
        r = jax.random.split(rng, 3)
        d_in, d_h = self.dim_in, self.dim_hidden
        return {
            "wz": glorot_uniform(r[0], (d_in + d_h, d_h)),
            "wr": glorot_uniform(r[1], (d_in + d_h, d_h)),
            "wh": glorot_uniform(r[2], (d_in + d_h, d_h)),
            "bz": jnp.zeros((d_h,)),
            "br": jnp.zeros((d_h,)),
            "bh": jnp.zeros((d_h,)),
        }

    def step(self, params, h, x):
        xh = jnp.concatenate([x, h], axis=-1)
        z = jax.nn.sigmoid(xh @ params["wz"] + params["bz"])
        r = jax.nn.sigmoid(xh @ params["wr"] + params["br"])
        xrh = jnp.concatenate([x, r * h], axis=-1)
        h_tilde = jnp.tanh(xrh @ params["wh"] + params["bh"])
        return (1.0 - z) * h + z * h_tilde

    def apply(self, params, seq_vecs, seq_len):
        """seq_vecs: [B, L, D_in]; seq_len: [B] → final valid state [B, H]."""
        B, L, _ = seq_vecs.shape

        def scan_fn(carry, t_and_x):
            t, x_t = t_and_x
            h_new = self.step(params, carry, x_t)
            keep = (t < seq_len)[:, None]
            return jnp.where(keep, h_new, carry), None

        h0 = jnp.zeros((B, self.dim_hidden), seq_vecs.dtype)
        ts = jnp.arange(L)
        xs = jnp.moveaxis(seq_vecs, 1, 0)  # [L, B, D]
        h_final, _ = jax.lax.scan(scan_fn, h0, (ts, xs))
        return h_final


@dataclasses.dataclass(frozen=True)
class LSTM:
    dim_in: int
    dim_hidden: int

    def init(self, rng):
        r = jax.random.split(rng, 4)
        d_in, d_h = self.dim_in, self.dim_hidden
        p = {}
        for i, gate in enumerate(("i", "f", "g", "o")):
            p[f"w{gate}"] = glorot_uniform(r[i], (d_in + d_h, d_h))
            p[f"b{gate}"] = (jnp.ones((d_h,)) if gate == "f"
                             else jnp.zeros((d_h,)))
        return p

    def step(self, params, carry, x):
        h, c = carry
        xh = jnp.concatenate([x, h], axis=-1)
        i = jax.nn.sigmoid(xh @ params["wi"] + params["bi"])
        f = jax.nn.sigmoid(xh @ params["wf"] + params["bf"])
        g = jnp.tanh(xh @ params["wg"] + params["bg"])
        o = jax.nn.sigmoid(xh @ params["wo"] + params["bo"])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return h_new, c_new

    def apply(self, params, seq_vecs, seq_len):
        B, L, _ = seq_vecs.shape

        def scan_fn(carry, t_and_x):
            t, x_t = t_and_x
            h_new, c_new = self.step(params, carry, x_t)
            keep = (t < seq_len)[:, None]
            h, c = carry
            return (jnp.where(keep, h_new, h),
                    jnp.where(keep, c_new, c)), None

        h0 = jnp.zeros((B, self.dim_hidden), seq_vecs.dtype)
        c0 = jnp.zeros((B, self.dim_hidden), seq_vecs.dtype)
        ts = jnp.arange(L)
        xs = jnp.moveaxis(seq_vecs, 1, 0)
        (h_final, _), _ = jax.lax.scan(scan_fn, (h0, c0), (ts, xs))
        return h_final
