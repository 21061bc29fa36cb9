"""User-facing Dataset façade — mirrors the reference tf2 API surface
(reference openrec/tf2/data/dataset.py:87-176) plus the tf1-only strategies
(temporal, multi-negative, explicit, feature-joined).

Each method returns a `Prefetcher` iterable of numpy batch dicts; pass them
through `openrec_tpu.data.pipeline.device_iterator` (or hand them straight to
`Trainer`) to get device arrays.
"""

from __future__ import annotations

from openrec_tpu.data.pipeline import Prefetcher
from openrec_tpu.data.samplers import (
    EvaluationSampler,
    ExplicitSampler,
    FeatureJoinedSampler,
    NPairwiseSampler,
    PairwiseSampler,
    PerPosStratifiedPointwiseSampler,
    RandomPointwiseSampler,
    StratifiedPointwiseSampler,
    TemporalEvaluationSampler,
    TemporalSampler,
)
from openrec_tpu.data.store import InteractionStore


class Dataset:

    def __init__(self, raw_data, total_users, total_items,
                 implicit_negative=True, num_negatives=None, seed=None,
                 sortby=None, asc=True, name=None):
        self.store = InteractionStore(
            raw_data=raw_data, total_users=total_users,
            total_items=total_items, implicit_negative=implicit_negative,
            num_negatives=num_negatives, seed=seed, sortby=sortby, asc=asc,
            name=name)
        self._seed = seed if seed is not None else 0

    # -- training strategies (infinite) -------------------------------- #

    def _wrap(self, sampler, num_parallel_calls, take):
        return Prefetcher(sampler, num_workers=num_parallel_calls, take=take)

    def pairwise(self, batch_size, num_parallel_calls=1, take=None,
                 joins=(), chronological=False):
        """chronological=True: one unshuffled sequential epoch in raw-data
        order (finite; forces 1 worker) — the legacy temporal-training mode
        (reference legacy/utils/samplers/pairwise_sampler.py:24-44)."""
        s = PairwiseSampler(self.store, batch_size, seed=self._seed,
                            chronological=chronological)
        if joins:
            s = FeatureJoinedSampler(s, joins)
        if chronological:
            num_parallel_calls = 1
        return self._wrap(s, num_parallel_calls, take)

    def n_pairwise(self, batch_size, num_negatives, num_parallel_calls=1,
                   take=None):
        s = NPairwiseSampler(self.store, batch_size, num_negatives,
                             seed=self._seed)
        return self._wrap(s, num_parallel_calls, take)

    def stratified_pointwise(self, batch_size, pos_ratio=0.5,
                             num_parallel_calls=1, take=None,
                             chronological=False):
        s = StratifiedPointwiseSampler(self.store, batch_size, pos_ratio,
                                       seed=self._seed,
                                       chronological=chronological)
        if chronological:
            num_parallel_calls = 1
        return self._wrap(s, num_parallel_calls, take)

    def per_pos_stratified_pointwise(self, batch_size, pos_ratio=0.5,
                                     num_parallel_calls=1, take=None):
        s = PerPosStratifiedPointwiseSampler(self.store, batch_size,
                                             pos_ratio, seed=self._seed)
        return self._wrap(s, num_parallel_calls, take)

    def random_pointwise(self, batch_size, num_parallel_calls=1, take=None):
        s = RandomPointwiseSampler(self.store, batch_size, seed=self._seed)
        return self._wrap(s, num_parallel_calls, take)

    def explicit(self, batch_size, label_field="label",
                 num_parallel_calls=1, take=None, chronological=False):
        s = ExplicitSampler(self.store, batch_size, label_field,
                            seed=self._seed, chronological=chronological)
        if chronological:
            num_parallel_calls = 1
        return self._wrap(s, num_parallel_calls, take)

    def temporal(self, batch_size, max_seq_len, num_parallel_calls=1,
                 take=None, joins=()):
        s = TemporalSampler(self.store, batch_size, max_seq_len,
                            seed=self._seed)
        if joins:
            s = FeatureJoinedSampler(s, joins)
        return self._wrap(s, num_parallel_calls, take)

    # -- evaluation strategies (finite, one epoch per iteration) -------- #

    def evaluation(self, batch_size, excl_datasets=(),
                   device_masks=False):
        return EvaluationSampler(
            self.store, batch_size,
            excl_stores=[d.store for d in excl_datasets],
            device_masks=device_masks)

    def regression_evaluation(self, batch_size, label_field="label"):
        """Per-record (user, item, label) eval stream — the legacy
        'regression' etype (MSE) path."""
        from openrec_tpu.data.samplers import RegressionEvalSampler
        return RegressionEvalSampler(self.store, batch_size, label_field)

    def temporal_evaluation(self, batch_size, max_seq_len, joins=()):
        s = TemporalEvaluationSampler(self.store, batch_size, max_seq_len)
        if joins:
            epoch = s.epoch

            def joined_epoch():
                for batch in epoch():
                    for id_key, feats, out_key in joins:
                        batch[out_key] = feats[batch[id_key]]
                    yield batch
            s.epoch = joined_epoch
        return s
