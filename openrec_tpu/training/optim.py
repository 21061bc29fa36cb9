"""Optimizers tuned for embedding-table workloads.

Two Adams, one trade-off (measured against TF — see
tests/test_optim.py trajectory tests):

`keras_adam` reproduces TF/Keras Adam's EXACT trajectory semantics on
sparse (embedding-lookup) gradients. Empirically probed against keras
(TF 2.21) and consistent with the reference era's optimizer_v2 source:
TF scatter-adds the gradient slices into m and v but DECAYS AND APPLIES
DENSELY — every previously-touched row keeps moving by residual momentum
-α·m/(√v+ε) on every later step, even when absent from the batch (and a
present-with-zero-grad row behaves identically to an absent one). With
duplicate ids in one batch, TF ≤ 2.x first dedup-summed the slices
((Σg)² into v — matching the dense gradients JAX autodiff produces),
while keras 3 accumulates per-slice (Σg²) — a second-order difference
confined to duplicate rows.  Use this for trajectory-level parity with
the reference (benchmarks/quality_parity.py).

`lazy_adam` updates only rows with nonzero gradient — untouched rows'
moments and parameters stay put (tensorflow_addons LazyAdam semantics).
Identical to keras_adam on any SINGLE step from fresh moments; diverges
over trajectories (untouched rows keep drifting under keras_adam). Lazy
is the production default because it (a) preserves projection
invariants between touches (CML censoring), (b) costs O(batch) instead
of O(catalog) HBM bandwidth per step — at giant-table scale the dense
apply is unrunnable (docs/PERF_NOTES.md), and (c) is the standard
sparse-embedding training semantics outside TF.

Both use the keras formulation: bias correction folded into the step
size, eps OUTSIDE the corrected sqrt. The masked lazy form still
materializes dense zero-gradients (XLA fuses the mask into the scatter);
the gather/scatter unique-id fast path lives in `sparse_embedding_step`
(training/sparse.py, used when the batch's touched-id set is available).
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


def keras_adam(learning_rate: float = 1e-3, b1: float = 0.9,
               b2: float = 0.999, eps: float = 1e-7
               ) -> optax.GradientTransformation:
    """Dense Adam in the exact keras formulation — TF/Keras Adam's true
    trajectory semantics for sparse-gradient training (see module
    docstring: TF decays and applies DENSELY; JAX's dense autodiff
    gradients already carry the dedup-summed slices, so this transform
    matches a keras Adam trajectory row-for-row, verified over multi-step
    in/out-of-batch schedules in tests/test_optim.py)."""

    def init_fn(params):
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return LazyAdamState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(grads, state, params=None):
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        alpha = learning_rate * jnp.sqrt(c2) / c1
        mu = jax.tree_util.tree_map(
            lambda g, m: b1 * m + (1 - b1) * g, grads, state.mu)
        nu = jax.tree_util.tree_map(
            lambda g, n: b2 * n + (1 - b2) * g * g, grads, state.nu)
        updates = jax.tree_util.tree_map(
            lambda m, n: -alpha * m / (jnp.sqrt(n) + eps), mu, nu)
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
