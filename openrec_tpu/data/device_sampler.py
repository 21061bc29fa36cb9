"""Device-side (on-TPU) batch sampling.

The host pipeline (samplers.py) mirrors the reference's semantics exactly.
This module is the TPU-native alternative: the interaction index lives in
device memory (a sorted composite-key array or a bit array + flat record
arrays — a few MB even for Amazon-scale data), and batch construction
happens INSIDE the jitted train program:

  - positive picks: uniform records (with replacement);
  - negatives: uniform over the catalog with `REJECT_ROUNDS` fixed
    resampling rounds against the membership index. Residual positive
    probability after R rounds is density^(R+1) — for CiteULike
    (density 2e-3) that is < 1e-13 at R=4; the same check the host sampler
    does exactly (store.py:171-189), made XLA-shaped (static rounds).

Fused with Trainer.train_steps_device, the input pipeline costs zero
host↔device transfers and zero host CPU — the whole train loop is one
device program per K steps. Under a mesh, each data shard folds its
axis index into the RNG so shards draw disjoint streams (the fix for the
reference's duplicate-batch race, SURVEY.md §5.2, applied on device) —
see parallel/train.py make_parallel_device_train_step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

REJECT_ROUNDS = 4


class _MembershipIndex:
    """On-device (user, item)∈positives test, shared by the samplers.

    membership:
      'bitmap'      — a U·I bit array in HBM; one gather + bit test per
                      query (fastest; used automatically when the bitmap
                      is ≤ `bitmap_limit_bytes`).
      'searchsorted'— binary search over the sorted key array
                      (log₂N serialized gather rounds; any scale).
    The index arrays are numpy and embed into each jitted program as
    HLO literals (see the bitmap comment below), so the auto-bitmap
    limit is sized for COMPILE cost, not HBM: every distinct program
    (each k, each mesh variant) re-serializes the literal through the
    remote-compile path. 64MB keeps that bounded; raise it explicitly
    for long-lived single-program loops on bigger pair spaces.
    TPUs emulate int64 (2x int32 ops); keys are int32 whenever
    user*I+item fits, which covers catalogs up to ~2B pairs.
    """

    def __init__(self, store, membership: str = "auto",
                 bitmap_limit_bytes: int = 64 * 1024 * 1024):
        self.total_items = store.total_items()
        n_pairs = store.total_users() * store.total_items()
        if membership == "auto":
            membership = ("bitmap" if n_pairs // 8 <= bitmap_limit_bytes
                          else "searchsorted")
        self.membership = membership
        fits32 = n_pairs < 2 ** 31
        self._key_dtype = jnp.int32 if fits32 else jnp.int64
        if membership == "bitmap":
            nwords = (n_pairs + 31) // 32
            words = np.zeros(nwords, dtype=np.uint32)
            keys = store._pos_keys
            np.bitwise_or.at(words, keys >> 5,
                             np.uint32(1) << (keys & 31).astype(np.uint32))
            # numpy, NOT a device array: a device-array closure
            # constant is fetched back to host at jit-lowering time
            # (HLO literal embedding), and on the axon backend ANY
            # device->host fetch permanently disables buffer donation
            # process-wide (docs/PERF_NOTES.md r4: compiling the
            # sampler with device constants made every later fused
            # train call copy its scan carries, 0.5 -> 26 ms/call).
            self._bitmap = words
        else:
            self._pos_keys = store._pos_keys.astype(
                np.int32 if fits32 else np.int64)

    def is_positive(self, users, items):
        keys = users.astype(self._key_dtype) * self.total_items \
            + items.astype(self._key_dtype)
        if self.membership == "bitmap":
            words = jnp.take(self._bitmap, (keys >> 5).astype(jnp.int32)
                             if self._key_dtype == jnp.int32
                             else keys >> 5, axis=0)
            bit = (words >> (keys & 31).astype(jnp.uint32)) & 1
            return bit != 0
        idx = jnp.searchsorted(self._pos_keys, keys)
        idx = jnp.clip(idx, 0, self._pos_keys.shape[0] - 1)
        return jnp.take(self._pos_keys, idx, axis=0) == keys


class DevicePairwiseSampler:
    """On-device (user, pos, neg) triplet sampler over a static index.

    reject_rounds: resampling rounds against the membership index;
    residual positive probability is density^(rounds+1) (module
    docstring). In a healthy process the whole stacked 200x1000 sampling
    program costs ~0.5ms on v5e (r4 probe) — keep the default rounds;
    the knob exists for denser matrices where more rounds are needed.
    """

    def __init__(self, store, batch_size: int, membership: str = "auto",
                 bitmap_limit_bytes: int = 64 * 1024 * 1024,
                 reject_rounds: int = REJECT_ROUNDS):
        self.reject_rounds = int(reject_rounds)
        self.batch_size = int(batch_size)
        self.total_items = store.total_items()
        self._index = _MembershipIndex(store, membership,
                                       bitmap_limit_bytes)
        self.membership = self._index.membership
        # numpy on purpose — see _MembershipIndex bitmap comment
        self._rec_users = np.asarray(store._pos_users, dtype=np.int32)
        self._rec_items = np.asarray(store._pos_items, dtype=np.int32)
        self.num_records = int(self._rec_users.shape[0])

    def is_positive(self, users, items):
        return self._index.is_positive(users, items)

    def sample(self, rng):
        """rng -> batch dict of device arrays; pure & jit-safe."""
        r_rec, r_neg = jax.random.split(rng)
        idx = jax.random.randint(r_rec, (self.batch_size,), 0,
                                 self.num_records)
        users = jnp.take(self._rec_users, idx, axis=0)
        pos = jnp.take(self._rec_items, idx, axis=0)

        neg = jax.random.randint(
            jax.random.fold_in(r_neg, 0), (self.batch_size,), 0,
            self.total_items, dtype=jnp.int32)
        for round_i in range(1, self.reject_rounds + 1):
            bad = self.is_positive(users, neg)
            resample = jax.random.randint(
                jax.random.fold_in(r_neg, round_i), (self.batch_size,), 0,
                self.total_items, dtype=jnp.int32)
            neg = jnp.where(bad, resample, neg)
        return {"user_id": users, "p_item_id": pos, "n_item_id": neg}

    def sample_stacked(self, rng, k: int):
        """K batches at once: ALL RNG draws happen in three big batched
        calls instead of k·(REJECT_ROUNDS+2) small per-step calls inside a
        scan (threefry vectorizes; small per-step RNG serializes the VPU —
        the measured limiter of the fused device loop, docs/PERF_NOTES.md).
        Returns a dict of [k, B] arrays for lax.scan; same per-batch
        semantics as k sample() calls (different stream)."""
        B = self.batch_size
        r_rec, r_neg = jax.random.split(rng)
        idx = jax.random.randint(r_rec, (k, B), 0, self.num_records)
        users = jnp.take(self._rec_users, idx, axis=0)
        pos = jnp.take(self._rec_items, idx, axis=0)
        draws = jax.random.randint(r_neg, (self.reject_rounds + 1, k, B),
                                   0, self.total_items, dtype=jnp.int32)
        neg = draws[0]
        for round_i in range(1, self.reject_rounds + 1):
            bad = self.is_positive(users, neg)
            neg = jnp.where(bad, draws[round_i], neg)
        return {"user_id": users, "p_item_id": pos, "n_item_id": neg}


class DevicePointwiseSampler:
    """On-device stratified pointwise batches (pos_ratio mix). Shares the
    bitmap/int32 membership fast path with the pairwise sampler."""

    def __init__(self, store, batch_size: int, pos_ratio: float = 0.5,
                 membership: str = "auto",
                 bitmap_limit_bytes: int = 64 * 1024 * 1024,
                 reject_rounds: int = REJECT_ROUNDS):
        self.reject_rounds = int(reject_rounds)
        self.batch_size = int(batch_size)
        self.n_pos = int(batch_size * pos_ratio)
        self.total_users = store.total_users()
        self.total_items = store.total_items()
        self._index = _MembershipIndex(store, membership,
                                       bitmap_limit_bytes)
        self.membership = self._index.membership
        # numpy on purpose — see _MembershipIndex bitmap comment
        self._rec_users = np.asarray(store._pos_users, dtype=np.int32)
        self._rec_items = np.asarray(store._pos_items, dtype=np.int32)
        self.num_records = int(self._rec_users.shape[0])

    def is_positive(self, users, items):
        return self._index.is_positive(users, items)

    def sample(self, rng):
        B, P = self.batch_size, self.n_pos
        r_rec, r_u, r_i = jax.random.split(rng, 3)
        idx = jax.random.randint(r_rec, (P,), 0, self.num_records)
        users = jnp.zeros((B,), jnp.int32)
        items = jnp.zeros((B,), jnp.int32)
        users = users.at[:P].set(jnp.take(self._rec_users, idx, axis=0))
        items = items.at[:P].set(jnp.take(self._rec_items, idx, axis=0))

        nu = jax.random.randint(jax.random.fold_in(r_u, 0), (B - P,), 0,
                                self.total_users, dtype=jnp.int32)
        ni = jax.random.randint(jax.random.fold_in(r_i, 0), (B - P,), 0,
                                self.total_items, dtype=jnp.int32)
        for round_i in range(1, self.reject_rounds + 1):
            bad = self.is_positive(nu, ni)
            nu = jnp.where(bad, jax.random.randint(
                jax.random.fold_in(r_u, round_i), (B - P,), 0,
                self.total_users, dtype=jnp.int32), nu)
            ni = jnp.where(bad, jax.random.randint(
                jax.random.fold_in(r_i, round_i), (B - P,), 0,
                self.total_items, dtype=jnp.int32), ni)
        users = users.at[P:].set(nu)
        items = items.at[P:].set(ni)
        labels = jnp.zeros((B,), jnp.float32).at[:P].set(1.0)
        return {"user_id": users, "item_id": items, "label": labels}


class DeviceTemporalSampler:
    """On-device sequence windows: the per-user time-sorted CSR lives in
    HBM; each sample picks a warm user, a uniform predict position in
    [1, count-1], and gathers the left-aligned zero-padded window — the
    host TemporalSampler's semantics (samplers.py TemporalSampler /
    reference tf1 temporal_sampler.py:5-29) as one XLA-shaped program."""

    def __init__(self, store, batch_size: int, max_seq_len: int):
        self.batch_size = int(batch_size)
        self.max_seq_len = int(max_seq_len)
        counts = store.user_positive_counts()
        seq_users = np.flatnonzero(counts > 1)
        if len(seq_users) == 0:
            raise ValueError("No user has more than one interaction.")
        # numpy on purpose — see _MembershipIndex bitmap comment
        self._seq_users = seq_users.astype(np.int32)
        self._counts = counts.astype(np.int32)
        ptr, _ = store.positive_csr()
        self._ptr = ptr.astype(np.int32)
        items = (store._csr_items_sorted
                 if store._csr_items_sorted is not None
                 else store._csr_items)
        self._items = items.astype(np.int32)

    def sample(self, rng):
        B, L = self.batch_size, self.max_seq_len
        r_u, r_p = jax.random.split(rng)
        users = jnp.take(self._seq_users, jax.random.randint(
            r_u, (B,), 0, self._seq_users.shape[0]), axis=0)
        cnt = jnp.take(self._counts, users, axis=0)
        # uniform in [1, cnt-1] via mod (the host sampler draws
        # rng.integers(0, 2**62) % (cnt-1); bias is O(cnt/2^31), nil)
        draw = jax.random.randint(r_p, (B,), 0, jnp.int32(2 ** 31 - 1))
        predict_pos = 1 + draw % (cnt - 1)
        lo = jnp.take(self._ptr, users, axis=0)
        offs = jnp.arange(L, dtype=jnp.int32)
        seq_len = jnp.minimum(predict_pos, L)
        start = predict_pos - seq_len
        idx = lo[:, None] + start[:, None] + offs[None, :]
        valid = offs[None, :] < seq_len[:, None]
        idx = jnp.where(valid, idx, lo[:, None])    # safe gather index
        seq = jnp.where(valid, jnp.take(self._items, idx, axis=0), 0)
        labels = jnp.take(self._items, lo + predict_pos, axis=0)
        return {"seq_item_id": seq, "seq_len": seq_len,
                "label": labels, "user_id": users}
