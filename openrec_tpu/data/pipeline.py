"""Host input pipeline: prefetching and device placement.

Replaces the reference's multiprocessing batch producers
(openrec/tf2/data/utils.py:164-214, openrec/tf1/utils/samplers/sampler.py:3-53)
with daemon *threads* over vectorized samplers. The reference needed
processes because its per-record Python generators were CPU-bound; our
samplers are whole-batch numpy ops that release the GIL, so threads suffice
and avoid spawn/pickle overhead.

Fixes the reference's duplicate-batch race (sampler.py:48-52 seeds every
worker identically): each worker folds its worker id into the seed.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class Prefetcher:
    """Background-thread batch producer with per-worker seed folding.

    Iterating yields batches; `take` bounds the number of batches (finite
    iteration), otherwise infinite for infinite samplers.
    """

    def __init__(self, sampler, num_workers: int = 1, capacity: int = 8,
                 take=None):
        self._sampler = sampler
        self._num_workers = max(1, int(num_workers))
        self._take = take
        self._q: queue.Queue = queue.Queue(maxsize=capacity)
        self._stop = threading.Event()
        self._threads = []
        self._started = False

    def _worker(self, worker_id: int):
        base_seed = getattr(self._sampler, "seed", 0) or 0
        local = (self._sampler.with_seed((base_seed, worker_id))
                 if hasattr(self._sampler, "with_seed") else self._sampler)
        it = iter(local)
        while not self._stop.is_set():
            try:
                batch = next(it)
            except StopIteration:
                self._q.put(None)
                return
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def start(self):
        if self._started:
            return
        self._started = True
        for i in range(self._num_workers):
            t = threading.Thread(target=self._worker, args=(i,), daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self):
        self._stop.set()
        # Drain so workers blocked on put() can exit.
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __iter__(self):
        self.start()
        produced = 0
        finished_workers = 0
        while self._take is None or produced < self._take:
            item = self._q.get()
            if item is None:
                finished_workers += 1
                if finished_workers >= self._num_workers:
                    return
                continue
            produced += 1
            yield item

    def __del__(self):
        self._stop.set()


def to_device(batch: dict, sharding=None):
    """Move a numpy batch onto device(s), optionally with a NamedSharding.

    With a sharding, jax.device_put splits the batch across the mesh's data
    axis on the host side — the TPU only ever sees its shard.
    """
    import jax

    if sharding is None:
        return {k: jax.numpy.asarray(v) for k, v in batch.items()}
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def device_iterator(batches, sharding=None, prefetch: int = 2):
    """Iterate batches as device arrays, keeping `prefetch` transfers in
    flight so host→device copies overlap with compute."""
    import collections

    buf = collections.deque()
    it = iter(batches)
    try:
        while True:
            while len(buf) < prefetch:
                buf.append(to_device(next(it), sharding))
            yield buf.popleft()
    except StopIteration:
        while buf:
            yield buf.popleft()


class ShuffledArrayLoader:
    """Epoch-shuffling minibatch loader over aligned dense arrays.

    The Criteo/DLRM path (reference tf2_examples/dlrm_criteo.py:17-27 uses
    tf.data.Dataset.from_tensor_slices(...).shuffle(...).batch(...)): here a
    seeded permutation per epoch + contiguous slices.
    """

    def __init__(self, arrays: dict, batch_size: int, seed=0,
                 drop_remainder=True):
        self.arrays = {k: np.asarray(v) for k, v in arrays.items()}
        lens = {len(v) for v in self.arrays.values()}
        assert len(lens) == 1, "all arrays must share the leading dim"
        self.n = lens.pop()
        self.batch_size = int(batch_size)
        self.rng = np.random.default_rng(seed)
        self.drop_remainder = drop_remainder

    def __len__(self):
        if self.drop_remainder:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def epoch(self, shuffle=True):
        idx = self.rng.permutation(self.n) if shuffle else np.arange(self.n)
        end = (self.n - self.n % self.batch_size
               if self.drop_remainder else self.n)
        for i in range(0, end, self.batch_size):
            take = idx[i:i + self.batch_size]
            yield {k: v[take] for k, v in self.arrays.items()}

    def __iter__(self):
        while True:
            yield from self.epoch()
