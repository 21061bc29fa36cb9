"""Streaming mean accumulators.

Parity: openrec/tf2/metrics/dict_mean.py:4-32 (DictMean over dicts of
per-user metric vectors) and keras Mean (scalar). Host-side numpy — metric
outputs are tiny relative to the eval compute.

Supports a `valid` row mask so padded eval batches (static shapes for XLA)
don't pollute the averages.

DeviceMean / DeviceDictMean are the on-device twins: they accumulate with
jnp ops and hold device scalars, so a training loop can log/evaluate
WITHOUT a single device→host fetch until the run ends. This matters
because on the axon TPU backend one fetch permanently disables buffer
donation for every later step (docs/PERF_NOTES.md "donation poisoning":
0.6 → 63 ms/step on Criteo-scale tables). Trainer.train(defer_metrics=
True) uses them.
"""

from __future__ import annotations

import numpy as np


class Mean:

    def __init__(self):
        self._sum = 0.0
        self._count = 0.0

    def update_state(self, values):
        v = np.asarray(values)
        self._sum += float(v.sum())
        self._count += v.size

    def result(self):
        return self._sum / max(self._count, 1.0)

    def reset_states(self):
        self._sum = 0.0
        self._count = 0.0


class DeviceMean:
    """Scalar streaming mean kept on device (no host fetch).

    update_state is LAZY: it only stores a reference — no device op is
    dispatched. On the tunneled backend every dispatch has a fixed host
    cost, and the fused K-step train loop exists precisely to pay it
    once per K steps; an eager per-call `.sum()` here measurably cost
    the public flat-feed path ~30% (r5 probe: private 48-56M vs public
    36-41M ex/s with 2 extra tiny dispatches per call). References fold
    into a running sum every `fold_every` updates (one dispatch per
    fold) so memory stays bounded on long runs."""

    def __init__(self, fold_every: int = 64):
        self._fold_every = int(fold_every)
        self.reset_states()

    def update_state(self, values):
        self._pending.append(values)
        if len(self._pending) >= self._fold_every:
            self._fold()

    def _fold(self):
        import jax.numpy as jnp
        for v in self._pending:
            v = jnp.asarray(v)
            s = v.sum()
            self._sum = s if self._sum is None else self._sum + s
            self._count += float(v.size)
        self._pending = []

    def result_device(self):
        """Mean as a device scalar (0.0 if nothing accumulated)."""
        self._fold()
        if self._sum is None:
            return 0.0
        return self._sum / max(self._count, 1.0)

    def result(self):
        return float(self.result_device())

    def reset_states(self):
        self._sum = None
        self._count = 0.0
        self._pending = []


class DeviceDictMean:
    """DictMean kept on device: sums/counts are jnp arrays; `result_device`
    returns a dict of device arrays for the caller to fetch once, later."""

    def __init__(self):
        self.reset_states()

    def reset_states(self):
        self._sums = {}
        self._counts = {}

    def update_state(self, state: dict, valid=None):
        import jax.numpy as jnp
        for key, values in state.items():
            v = jnp.asarray(values, jnp.float32)
            if valid is not None and v.ndim > 0:
                m = jnp.asarray(valid, jnp.float32)
                s = (v * m.reshape((-1,) + (1,) * (v.ndim - 1))).sum(axis=0)
                n = m.sum()
            else:
                s = v.sum(axis=0) if v.ndim else v
                n = float(v.shape[0]) if v.ndim else 1.0
            if key in self._sums:
                self._sums[key] = self._sums[key] + s
                self._counts[key] = self._counts[key] + n
            else:
                self._sums[key] = s
                self._counts[key] = n

    def result_device(self):
        import jax.numpy as jnp
        return {key: self._sums[key] / jnp.maximum(self._counts[key], 1.0)
                for key in self._sums}

    def result(self):
        import jax
        return {k: np.asarray(v)
                for k, v in jax.device_get(self.result_device()).items()}


class DictMean:

    def __init__(self, state_shape: dict):
        self._shapes = dict(state_shape)
        self.reset_states()

    def reset_states(self):
        self._states = {
            key: {"sum": np.zeros(shape, dtype=np.float64), "count": 0.0}
            for key, shape in self._shapes.items()}

    def update_state(self, state: dict, valid=None):
        for key, values in state.items():
            v = np.asarray(values, dtype=np.float64)
            # Metric outputs are [B] or [B, num_at]; users on the first
            # axis (reference dict_mean.py:23-25 sums over axis 0).
            if valid is not None and v.ndim > 0:
                mask = np.asarray(valid, dtype=bool)
                v = v[mask]
                n = mask.sum()
            else:
                n = v.shape[0] if v.ndim > 0 else 1
            self._states[key]["sum"] += v.sum(axis=0) if v.ndim else v
            self._states[key]["count"] += float(n)

    def result(self):
        return {key: st["sum"] / max(st["count"], 1.0)
                for key, st in self._states.items()}
