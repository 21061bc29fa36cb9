"""Streaming mean accumulators.

Parity: openrec/tf2/metrics/dict_mean.py:4-32 (DictMean over dicts of
per-user metric vectors) and keras Mean (scalar). Host-side numpy — metric
outputs are tiny relative to the eval compute.

Supports a `valid` row mask so padded eval batches (static shapes for XLA)
don't pollute the averages.
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
