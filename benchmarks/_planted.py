"""Shared planted-structure dataset generators for benchmarks.

No env side effects (importable from TPU and CPU harnesses alike).
"""

import numpy as np


def make_low_rank(users, items, rank, per_user, seed=0):
    """Planted low-rank preferences; per-user top items split half
    train / half test. Identical protocol (and identical bytes, given
    identical arguments) to the quality-parity benchmark's dataset."""
    rng = np.random.default_rng(seed)
    U = rng.normal(size=(users, rank)).astype(np.float32)
    V = rng.normal(size=(items, rank)).astype(np.float32)
    train_rows, test_rows = [], []
    chunk = 512
    for lo in range(0, users, chunk):
        scores = U[lo:lo + chunk] @ V.T
        top = np.argpartition(-scores, per_user, axis=1)[:, :per_user]
        for r in range(top.shape[0]):
            row_items = top[r].copy()
            rng.shuffle(row_items)
            half = per_user // 2
            u = lo + r
            train_rows += [(u, i) for i in row_items[:half]]
            test_rows += [(u, i) for i in row_items[half:]]
    dtype = [("user_id", np.int32), ("item_id", np.int32)]
    return (np.array(train_rows, dtype=dtype),
            np.array(test_rows, dtype=dtype))
