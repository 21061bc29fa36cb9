"""MLP stacks as init/apply pairs.

Parity targets: tf2 MLP factory (openrec/tf2/modules/multi_layer_perceptron.py:5-17,
keras Dense defaults: glorot-uniform kernels, zero bias) and the tf1
MultiLayerFC (openrec/tf1/modules/extractions/multi_layer_fc.py:6-57 — adds
relu-switches, dropout and batch-norm options).

Weights are stored as a list of {'w','b'} dicts so the whole stack is one
pytree leaf group; apply is a chain of x @ w + b the XLA fuser turns into
back-to-back MXU matmuls.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

_ACTIVATIONS = {
    None: lambda x: x,
    "linear": lambda x: x,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
    "elu": jax.nn.elu,
    "softmax": lambda x: jax.nn.softmax(x, axis=-1),
}


def activate(name, x):
    return _ACTIVATIONS[name](x)


def glorot_uniform(rng, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -limit, limit)


@dataclasses.dataclass(frozen=True)
class MLP:
    """Configured MLP; params come from .init and flow through .apply."""

    units: Sequence[int]
    use_bias: bool = True
    activation: Optional[str] = "relu"
    out_activation: Optional[str] = None
    # tf1 MultiLayerFC extras:
    dropout_rate: Optional[float] = None
    batch_norm: bool = False

    def init(self, rng, in_dim: int):
        layers = []
        dims = [in_dim] + list(self.units)
        rngs = jax.random.split(rng, len(self.units))
        for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
            layer = {"w": glorot_uniform(rngs[i], (d_in, d_out))}
            if self.use_bias:
                layer["b"] = jnp.zeros((d_out,))
            if self.batch_norm and i < len(self.units):
                layer["bn_scale"] = jnp.ones((d_out,))
                layer["bn_bias"] = jnp.zeros((d_out,))
            layers.append(layer)
        return layers

    def apply(self, params, x, *, train: bool = False, rng=None):
        n = len(params)
        for i, layer in enumerate(params):
            x = x @ layer["w"]
            if self.use_bias:
                x = x + layer["b"]
            if self.batch_norm:
                mean = jnp.mean(x, axis=0, keepdims=True)
                var = jnp.var(x, axis=0, keepdims=True)
                x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
                x = x * layer["bn_scale"] + layer["bn_bias"]
            act = self.out_activation if i == n - 1 else self.activation
            x = activate(act, x)
            if self.dropout_rate and train and i < n - 1:
                assert rng is not None, "dropout needs an rng"
                rng, sub = jax.random.split(rng)
                keep = 1.0 - self.dropout_rate
                mask = jax.random.bernoulli(sub, keep, x.shape)
                x = jnp.where(mask, x / keep, 0.0)
        return x

    def l2(self, params):
        """sum of tf.nn.l2_loss over kernels+biases (‖·‖²/2)."""
        total = 0.0
        for layer in params:
            total += 0.5 * jnp.sum(layer["w"] ** 2)
            if "b" in layer:
                total += 0.5 * jnp.sum(layer["b"] ** 2)
        return total
