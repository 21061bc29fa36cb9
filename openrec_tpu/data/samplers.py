"""Seeded, vectorized batch samplers.

Capability parity with the reference's sampling strategies, re-designed as
whole-batch numpy operations (the reference builds batches one record at a
time inside worker processes):

  - pairwise                (reference openrec/tf2/data/dataset.py:7-16,
                             openrec/tf1/utils/samplers/random_pairwise_sampler.py)
  - stratified pointwise    (tf2 dataset.py:18-34; tf1 stratified_pointwise_sampler.py)
  - per-pos stratified      (tf2 dataset.py:36-58)
  - random pointwise        (tf1 random_pointwise_sampler.py:5-23)
  - explicit rating         (tf1 legacy samplers/explicit_sampler.py)
  - multi-negative pairwise (tf1 legacy samplers/n_pairwise_sampler.py)
  - temporal sequence       (tf1 temporal_sampler.py:5-29)
  - feature-joined variants (tf1 vbpr_pairwise_sampler.py, youtube_sampler.py)
  - evaluation w/ masks     (tf2 dataset.py:60-85)
  - temporal evaluation     (tf1 temporal_evaluation_sampler.py)

Every sampler owns a np.random.Generator seeded independently, so runs are
reproducible and parallel prefetch workers can fold in worker ids (fixing the
reference's duplicated-batch race, openrec/tf1/utils/samplers/sampler.py:48-52).

Batches are plain dicts of fixed-shape numpy arrays — static shapes keep XLA
from recompiling.
"""

from __future__ import annotations

import numpy as np

from openrec_tpu.data.store import InteractionStore


class EndOfData(Exception):
    """Raised by chronological samplers when the single sequential epoch is
    exhausted; turns the sampler into a finite iterator."""


class BatchSampler:
    """Base: infinite iterator of dict-of-ndarray batches.

    Each sampler owns its epoch-shuffled record stream (seeded by its own
    rng): prefetch workers cloned via with_seed draw independent streams —
    both the fix for the reference's duplicate-batch race and the reason
    two workers can run concurrently without sharing mutable state.

    chronological=True switches to the legacy epoch-sequential mode
    (reference legacy/utils/samplers/pairwise_sampler.py:24-44): records
    stream in raw-data order (time order if the data is time-sorted), no
    shuffling, ONE pass, and the final partial batch is dropped — the
    ItrMLP temporal training protocol. The iterator is then finite.
    """

    def __init__(self, store: InteractionStore, batch_size: int, seed=0,
                 chronological: bool = False):
        self.store = store
        self.batch_size = int(batch_size)
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.chronological = bool(chronological)
        self._chrono_pos = 0
        self._perm = np.empty(0, dtype=np.int64)
        self._perm_pos = 0

    def _next_record_indices(self, n: int) -> np.ndarray:
        """Per-sampler epoch stream (every record once per epoch)."""
        n_rec = self.store.total_records()
        if self.chronological:
            # Sequential, unshuffled, single epoch; the reference breaks
            # when fewer than a full batch remains (pairwise_sampler.py:28).
            if self._chrono_pos + n > n_rec:
                raise EndOfData
            out = np.arange(self._chrono_pos, self._chrono_pos + n,
                            dtype=np.int64)
            self._chrono_pos += n
            return out
        out = np.empty(n, dtype=np.int64)
        filled = 0
        while filled < n:
            if self._perm_pos >= len(self._perm):
                self._perm = self.rng.permutation(n_rec)
                self._perm_pos = 0
            take = min(n - filled, len(self._perm) - self._perm_pos)
            out[filled:filled + take] = \
                self._perm[self._perm_pos:self._perm_pos + take]
            self._perm_pos += take
            filled += take
        return out

    def _next_records(self, n: int) -> np.ndarray:
        return self.store.raw_data[self._next_record_indices(n)]

    def sample(self) -> dict:
        raise NotImplementedError

    def reset(self):
        """Rewind a chronological sampler to the start of its epoch."""
        self._chrono_pos = 0

    def __iter__(self):
        while True:
            try:
                batch = self.sample()
            except EndOfData:
                return
            yield batch

    def with_seed(self, seed):
        """Fresh sampler with a different seed (used per prefetch worker)."""
        clone = type(self).__new__(type(self))
        clone.__dict__.update(self.__dict__)
        clone.seed = seed
        clone.rng = np.random.default_rng(seed)
        clone._chrono_pos = 0
        clone._perm = np.empty(0, dtype=np.int64)
        clone._perm_pos = 0
        return clone


class PairwiseSampler(BatchSampler):
    """(user, positive, uniform-negative) triplets.

    When the native library is available (openrec_tpu.native, built from
    sampler.cpp) and the store has no pre-sampled negatives, the join +
    rejection loop runs in one C++ pass; otherwise vectorized numpy.

    The native non-chronological path applies the epoch permutation to a
    PRIVATE COPY of the record arrays (one C++ Fisher-Yates per epoch,
    sampler.cpp shuffle_pairs) so each batch is a sequential window —
    no numpy permutation pass and no per-sample random record gathers —
    and draws negatives with the block-prefetched rejection kernel
    (pairwise_negatives_seq). Same every-record-once-per-epoch
    semantics, different (still uniform) stream.
    """

    def __init__(self, store, batch_size, seed=0, use_native=None,
                 chronological=False):
        super().__init__(store, batch_size, seed,
                         chronological=chronological)
        if use_native is None:
            from openrec_tpu import native
            use_native = (native.available()
                          and not store.contain_negatives())
        self.use_native = bool(use_native)
        if self.use_native:
            from openrec_tpu import native
            self._rec_users = np.ascontiguousarray(
                store._pos_users, dtype=np.int32)
            self._rec_items = np.ascontiguousarray(
                store._pos_items, dtype=np.int32)
            self._hash_table = native.build_hash_table(store._pos_keys)
            self._seq_pos = None      # lazily shuffled on first sample

    def _reshuffle(self):
        from openrec_tpu import native
        if self._seq_pos is None:
            # private copies: the epoch shuffle mutates in place and the
            # arrays may be shared with the store / sibling workers
            self._rec_users = self._rec_users.copy()
            self._rec_items = self._rec_items.copy()
        native.shuffle_pairs(self._rec_users, self._rec_items,
                             int(self.rng.integers(0, 2 ** 63)))
        self._seq_pos = 0

    def _next_window(self, b):
        """Sequential [b] window over the epoch-shuffled record copies.
        Returned arrays are fresh copies (the underlying buffers are
        reshuffled at epoch wrap while consumers may still hold the
        batch)."""
        n_rec = len(self._rec_users)
        if self._seq_pos is None:
            self._reshuffle()
        u = np.empty(b, np.int32)
        p = np.empty(b, np.int32)
        filled = 0
        while filled < b:
            if self._seq_pos >= n_rec:
                self._reshuffle()
            take = min(b - filled, n_rec - self._seq_pos)
            u[filled:filled + take] = \
                self._rec_users[self._seq_pos:self._seq_pos + take]
            p[filled:filled + take] = \
                self._rec_items[self._seq_pos:self._seq_pos + take]
            self._seq_pos += take
            filled += take
        return u, p

    def sample(self):
        if self.use_native:
            from openrec_tpu import native
            seed = int(self.rng.integers(0, 2 ** 63))
            if self.chronological:
                idx = self._next_record_indices(self.batch_size)
                u, p, n = native.pairwise_batch_hash(
                    self._hash_table, self._rec_users, self._rec_items,
                    idx, self.store.total_items(), seed)
                return {"user_id": u, "p_item_id": p, "n_item_id": n}
            u, p = self._next_window(self.batch_size)
            n = native.pairwise_negatives_seq(
                self._hash_table, u, self.store.total_items(), seed)
            return {"user_id": u, "p_item_id": p, "n_item_id": n}
        rec = self._next_records(self.batch_size)
        user_id = np.asarray(rec["user_id"], dtype=np.int32)
        p_item_id = np.asarray(rec["item_id"], dtype=np.int32)
        n_item_id = self.store.sample_negative_items(
            user_id, rng=self.rng).astype(np.int32)
        return {"user_id": user_id, "p_item_id": p_item_id,
                "n_item_id": n_item_id}

    def with_seed(self, seed):
        clone = super().with_seed(seed)
        if clone.use_native and not clone.chronological:
            # Re-copy from the STORE's arrays, not the parent's buffer:
            # the parent may be mid-epoch (its private copy mutates at
            # reshuffle), and a concurrent worker snapshotting it could
            # tear a shuffle into mismatched (user, item) pairs.
            clone._rec_users = np.ascontiguousarray(
                clone.store._pos_users, dtype=np.int32)
            clone._rec_items = np.ascontiguousarray(
                clone.store._pos_items, dtype=np.int32)
            clone._seq_pos = None     # fresh private copy + shuffle
        return clone


class NPairwiseSampler(BatchSampler):
    """(user, positive, K-negatives) — reference legacy n_pairwise_sampler."""

    def __init__(self, store, batch_size, num_negatives, seed=0):
        super().__init__(store, batch_size, seed)
        self.num_negatives = int(num_negatives)

    def sample(self):
        rec = self._next_records(self.batch_size)
        user_id = np.asarray(rec["user_id"], dtype=np.int32)
        p_item_id = np.asarray(rec["item_id"], dtype=np.int32)
        n_item_id = self.store.sample_negative_items_multi(
            user_id, self.num_negatives, rng=self.rng).astype(np.int32)
        return {"user_id": user_id, "p_item_id": p_item_id,
                "n_item_id": n_item_id}


class StratifiedPointwiseSampler(BatchSampler):
    """pos_ratio positives from the record stream + rejection-sampled
    uniform (user, item) negatives. With the native library available
    (and no pre-sampled negatives) the whole batch is one C++ pass."""

    def __init__(self, store, batch_size, pos_ratio=0.5, seed=0,
                 use_native=None, chronological=False):
        super().__init__(store, batch_size, seed,
                         chronological=chronological)
        self.pos_ratio = float(pos_ratio)
        if use_native is None:
            from openrec_tpu import native
            use_native = (native.available()
                          and not store.contain_negatives())
        self.use_native = bool(use_native)
        if self.use_native:
            from openrec_tpu import native
            self._rec_users = np.ascontiguousarray(
                store._pos_users, dtype=np.int32)
            self._rec_items = np.ascontiguousarray(
                store._pos_items, dtype=np.int32)
            self._hash_table = native.build_hash_table(store._pos_keys)

    def sample(self):
        n_pos = int(self.batch_size * self.pos_ratio)
        n_neg = self.batch_size - n_pos
        if self.use_native:
            from openrec_tpu import native
            idx = self._next_record_indices(n_pos)
            seed = int(self.rng.integers(0, 2 ** 63))
            u, i, l = native.stratified_pointwise_batch_hash(
                self._hash_table, self._rec_users, self._rec_items, idx,
                n_neg, self.store.total_users(), self.store.total_items(),
                seed)
            return {"user_id": u, "item_id": i, "label": l}
        rec = self._next_records(n_pos)
        users = np.empty(self.batch_size, dtype=np.int32)
        items = np.empty(self.batch_size, dtype=np.int32)
        labels = np.zeros(self.batch_size, dtype=np.float32)
        users[:n_pos] = rec["user_id"]
        items[:n_pos] = rec["item_id"]
        labels[:n_pos] = 1.0
        nu = self.rng.integers(0, self.store.total_users(), size=n_neg)
        ni = self.rng.integers(0, self.store.total_items(), size=n_neg)
        bad = self.store.is_positive(nu, ni)
        while bad.any():
            k = int(bad.sum())
            nu[bad] = self.rng.integers(0, self.store.total_users(), size=k)
            ni[bad] = self.rng.integers(0, self.store.total_items(), size=k)
            bad = self.store.is_positive(nu, ni)
        users[n_pos:] = nu
        items[n_pos:] = ni
        return {"user_id": users, "item_id": items, "label": labels}


class PerPosStratifiedPointwiseSampler(BatchSampler):
    """Each positive followed by int((1-r)/r) uniform negatives for the same
    user (reference tf2 dataset.py:36-58)."""

    def __init__(self, store, batch_size, pos_ratio=0.5, seed=0):
        super().__init__(store, batch_size, seed)
        self.pos_ratio = float(pos_ratio)
        self.k_neg = int((1 - self.pos_ratio) / self.pos_ratio)

    def sample(self):
        group = 1 + self.k_neg
        n_groups = -(-self.batch_size // group)
        rec = self._next_records(n_groups)
        gu = np.asarray(rec["user_id"], dtype=np.int64)
        gp = np.asarray(rec["item_id"], dtype=np.int64)
        # Negatives: uniform items != the positive (the reference only
        # excludes the sampled positive itself, not all positives).
        neg = self.rng.integers(0, self.store.total_items(),
                                size=(n_groups, self.k_neg))
        clash = neg == gp[:, None]
        while clash.any():
            neg[clash] = self.rng.integers(0, self.store.total_items(),
                                           size=int(clash.sum()))
            clash = neg == gp[:, None]
        users = np.repeat(gu, group)
        items = np.concatenate([gp[:, None], neg], axis=1).reshape(-1)
        labels = np.zeros(n_groups * group, dtype=np.float32)
        labels[::group] = 1.0
        sl = slice(0, self.batch_size)
        return {"user_id": users[sl].astype(np.int32),
                "item_id": items[sl].astype(np.int32),
                "label": labels[sl]}


class RandomPointwiseSampler(BatchSampler):
    """Uniform (user, item); label = observed membership."""

    def sample(self):
        users = self.rng.integers(0, self.store.total_users(),
                                  size=self.batch_size)
        items = self.rng.integers(0, self.store.total_items(),
                                  size=self.batch_size)
        labels = self.store.is_positive(users, items).astype(np.float32)
        return {"user_id": users.astype(np.int32),
                "item_id": items.astype(np.int32), "label": labels}


class ExplicitSampler(BatchSampler):
    """Stream records with their explicit labels/ratings
    (reference legacy samplers/explicit_sampler.py). chronological=True
    streams one unshuffled sequential epoch (shuffle=False, loop=False in
    the reference, explicit_sampler.py:8-40)."""

    def __init__(self, store, batch_size, label_field="label", seed=0,
                 chronological=False):
        super().__init__(store, batch_size, seed,
                         chronological=chronological)
        self.label_field = label_field

    def sample(self):
        rec = self._next_records(self.batch_size)
        return {"user_id": np.asarray(rec["user_id"], dtype=np.int32),
                "item_id": np.asarray(rec["item_id"], dtype=np.int32),
                "label": np.asarray(rec[self.label_field], dtype=np.float32)}


class TemporalSampler(BatchSampler):
    """Time-sorted history window → next-item label, zero-padded to
    max_seq_len (reference tf1 temporal_sampler.py:5-29)."""

    def __init__(self, store, batch_size, max_seq_len, seed=0):
        super().__init__(store, batch_size, seed)
        self.max_seq_len = int(max_seq_len)
        counts = store.user_positive_counts()
        self._seq_users = np.flatnonzero(counts > 1)
        if len(self._seq_users) == 0:
            raise ValueError("No user has more than one interaction.")

    def _windows(self, users, predict_pos):
        """Left-aligned padded windows ending just before predict_pos."""
        L = self.max_seq_len
        ptr, _ = self.store.positive_csr()
        items_sorted = self.store._csr_items_sorted
        lo = ptr[users]
        seq_len = np.minimum(predict_pos, L).astype(np.int32)
        start = predict_pos - seq_len
        idx = lo[:, None] + start[:, None] + np.arange(L)[None, :]
        valid = np.arange(L)[None, :] < seq_len[:, None]
        idx = np.where(valid, idx, lo[:, None])  # safe gather index
        seq = items_sorted[idx].astype(np.int32)
        seq[~valid] = 0
        return seq, seq_len

    def sample(self):
        counts = self.store.user_positive_counts()
        users = self._seq_users[self.rng.integers(0, len(self._seq_users),
                                                  size=self.batch_size)]
        # predict_pos uniform in [1, len-1] (reference temporal_sampler.py:22)
        predict_pos = 1 + (self.rng.integers(0, 1 << 62, self.batch_size)
                           % (counts[users] - 1))
        seq, seq_len = self._windows(users, predict_pos)
        ptr, _ = self.store.positive_csr()
        labels = self.store._csr_items_sorted[ptr[users] + predict_pos]
        return {"seq_item_id": seq, "seq_len": seq_len,
                "label": labels.astype(np.int32),
                "user_id": users.astype(np.int32)}


class TemporalEvaluationSampler(TemporalSampler):
    """Last-item holdout per warm user (reference
    temporal_evaluation_sampler.py). Iterates warm users once per epoch."""

    def epoch(self):
        counts = self.store.user_positive_counts()
        users = self._seq_users
        bs = self.batch_size
        for i in range(0, len(users), bs):
            chunk = users[i:i + bs]
            pad = bs - len(chunk)
            predict_pos = counts[chunk] - 1
            seq, seq_len = self._windows(chunk, predict_pos)
            ptr, _ = self.store.positive_csr()
            labels = self.store._csr_items_sorted[ptr[chunk] + predict_pos]
            valid = np.ones(len(chunk), dtype=bool)
            if pad:
                seq = np.pad(seq, ((0, pad), (0, 0)))
                seq_len = np.pad(seq_len, (0, pad))
                labels = np.pad(labels, (0, pad))
                chunk = np.pad(chunk, (0, pad))
                valid = np.pad(valid, (0, pad))
            yield {"seq_item_id": seq, "seq_len": seq_len,
                   "label": labels.astype(np.int32),
                   "user_id": chunk.astype(np.int32), "valid": valid}


class FeatureJoinedSampler(BatchSampler):
    """Wrap another sampler and join dense side features by id — generalizes
    the reference's VBPRPairwiseSampler (item visual features) and
    YouTubeSampler (user demographic features)."""

    def __init__(self, base: BatchSampler, joins):
        """joins: list of (id_key, feature_array, out_key)."""
        self.base = base
        self.store = base.store
        self.batch_size = base.batch_size
        self.joins = joins

    def sample(self):
        batch = self.base.sample()
        for id_key, feats, out_key in self.joins:
            batch[out_key] = np.asarray(feats[batch[id_key]])
        return batch

    def __iter__(self):
        while True:
            yield self.sample()

    def with_seed(self, seed):
        return FeatureJoinedSampler(self.base.with_seed(seed), self.joins)


class EvaluationSampler:
    """Full-catalog evaluation batches: per warm user a row of predictions is
    scored against pos_mask/excl_mask over the whole catalog (reference tf2
    dataset.py:60-85). Finite iterator (one epoch).

    When the store has explicit/pre-sampled negatives, items outside
    pos∪neg are excluded — reproducing the reference's sampled-negative
    evaluation mode.

    device_masks=True emits padded id lists (pos_ids/excl_ids, -1 padded)
    instead of [B, total_items] bool masks — the masks are then scattered
    on device inside the jitted eval step (Trainer handles both forms).
    At a 450k-item catalog this cuts host→device eval traffic ~1000×.
    Only available for implicit stores without pre-sampled negatives
    (otherwise excl = complement-of-negatives is dense by nature).
    """

    def __init__(self, store: InteractionStore, batch_size: int,
                 excl_stores=(), pad_to_batch=True, device_masks=False):
        self.store = store
        self.batch_size = int(batch_size)
        self.excl_stores = list(excl_stores)
        self.pad_to_batch = pad_to_batch
        self.eval_users = store.warm_users()
        self.device_masks = bool(device_masks)
        if self.device_masks:
            assert not store.contain_negatives(), (
                "device_masks requires an implicit store without "
                "pre-sampled negatives")
            self._pos_pad = int(store.user_positive_counts().max())
            # Exclusion ids from ALL excl stores are concatenated per user
            # (reference tf2 dataset.py:78-81 concatenates excl_datasets),
            # so the pad width is the max over users of the SUMMED counts.
            if self.excl_stores:
                n_users = max(len(ex.user_positive_counts())
                              for ex in self.excl_stores)
                total = np.zeros(n_users, dtype=np.int64)
                for ex in self.excl_stores:
                    c = ex.user_positive_counts()
                    total[:len(c)] += c
                self._excl_pad = max(1, int(total.max()))
            else:
                self._excl_pad = 1

    def __len__(self):
        return -(-len(self.eval_users) // self.batch_size)

    def _masks(self, users):
        I = self.store.total_items()
        B = len(users)
        pos = np.zeros((B, I), dtype=bool)
        ptr, items = self.store.positive_csr()
        row = np.repeat(np.arange(B), (ptr[users + 1] - ptr[users]))
        col = np.concatenate([items[ptr[u]:ptr[u + 1]] for u in users]) \
            if B else np.empty(0, np.int64)
        pos[row, col] = True

        if self.store.contain_negatives():
            excl = np.ones((B, I), dtype=bool)
            excl[pos] = False
            nptr, nitems = self.store.negative_csr()
            nrow = np.repeat(np.arange(B), (nptr[users + 1] - nptr[users]))
            ncol = np.concatenate(
                [nitems[nptr[u]:nptr[u + 1]] for u in users]) \
                if B else np.empty(0, np.int64)
            excl[nrow, ncol] = False
        else:
            excl = np.zeros((B, I), dtype=bool)

        for ex in self.excl_stores:
            eptr, eitems = ex.positive_csr()
            erow = np.repeat(np.arange(B), (eptr[users + 1] - eptr[users]))
            ecol = np.concatenate(
                [eitems[eptr[u]:eptr[u + 1]] for u in users]) \
                if B else np.empty(0, np.int64)
            excl[erow, ecol] = True
        return pos, excl

    def _padded_ids(self, users):
        B = len(users)
        pos_ids = np.full((B, self._pos_pad), -1, dtype=np.int32)
        ptr, items = self.store.positive_csr()
        for r, u in enumerate(users):
            row = items[ptr[u]:ptr[u + 1]]
            pos_ids[r, :len(row)] = row
        excl_ids = np.full((B, self._excl_pad), -1, dtype=np.int32)
        # Each store appends at the running per-row offset so multiple
        # excl stores concatenate (reference dataset.py:78-81) instead of
        # overwriting each other.
        offs = np.zeros(B, dtype=np.int64)
        for ex in self.excl_stores:
            eptr, eitems = ex.positive_csr()
            for r, u in enumerate(users):
                if u + 1 >= len(eptr):
                    continue
                row = eitems[eptr[u]:eptr[u + 1]]
                excl_ids[r, offs[r]:offs[r] + len(row)] = row
                offs[r] += len(row)
        return pos_ids, excl_ids

    def __iter__(self):
        bs = self.batch_size
        for i in range(0, len(self.eval_users), bs):
            users = self.eval_users[i:i + bs]
            valid = np.ones(len(users), dtype=bool)
            pad = bs - len(users) if self.pad_to_batch else 0
            if self.device_masks:
                pos_ids, excl_ids = self._padded_ids(users)
                if pad:
                    users = np.pad(users, (0, pad))
                    # padded rows: no positives, exclude nothing; dropped
                    # from aggregation via `valid`
                    pos_ids = np.pad(pos_ids, ((0, pad), (0, 0)),
                                     constant_values=-1)
                    excl_ids = np.pad(excl_ids, ((0, pad), (0, 0)),
                                      constant_values=-1)
                    valid = np.pad(valid, (0, pad))
                yield {"user_id": users.astype(np.int32),
                       "pos_ids": pos_ids, "excl_ids": excl_ids,
                       "valid": valid}
                continue
            pos, excl = self._masks(users)
            if pad:
                users = np.pad(users, (0, pad))
                pos = np.pad(pos, ((0, pad), (0, 0)))
                # Padded rows: mark everything excluded, no positives; the
                # `valid` flag drops them from metric aggregation.
                excl = np.pad(excl, ((0, pad), (0, 0)),
                              constant_values=True)
                valid = np.pad(valid, (0, pad))
            yield {"user_id": users.astype(np.int32), "pos_mask": pos,
                   "excl_mask": excl, "valid": valid}


class RegressionEvalSampler:
    """Finite per-record evaluation stream for the legacy 'regression'
    etype (reference legacy/utils/evaluators/evaluator.py:2-10 +
    itr_mlp_model_trainer.py:50-76): batches of (user_id, item_id, label)
    records in data order; the harness predicts each pair and aggregates
    per-record metrics (MSE). Batches are zero-padded to a static shape
    with a `valid` mask."""

    def __init__(self, store: InteractionStore, batch_size: int,
                 label_field: str = "label"):
        self.store = store
        self.batch_size = int(batch_size)
        self.label_field = label_field

    def __len__(self):
        return -(-self.store.total_records() // self.batch_size)

    def __iter__(self):
        data = self.store.raw_data
        bs = self.batch_size
        for i in range(0, len(data), bs):
            rec = data[i:i + bs]
            pad = bs - len(rec)
            users = np.asarray(rec["user_id"], dtype=np.int32)
            items = np.asarray(rec["item_id"], dtype=np.int32)
            labels = np.asarray(rec[self.label_field], dtype=np.float32)
            valid = np.ones(len(rec), dtype=bool)
            if pad:
                users = np.pad(users, (0, pad))
                items = np.pad(items, (0, pad))
                labels = np.pad(labels, (0, pad))
                valid = np.pad(valid, (0, pad))
            yield {"user_id": users, "item_id": items, "label": labels,
                   "valid": valid}
