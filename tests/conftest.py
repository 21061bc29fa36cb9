"""Test config: force an 8-device CPU platform BEFORE jax initializes.

Multi-device tests exercise the same pjit/shard_map code paths as a real
TPU slice (see SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize force-registers the axon TPU backend and
# sets jax_platforms='axon,cpu' regardless of the env var; push it back to
# CPU before any backend is instantiated so tests never touch the (single,
# shared) TPU chip.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def make_interactions(num_users=40, num_items=100, per_user=8, seed=0,
                      timestamps=False):
    """Random implicit-feedback structured array (unique (u,i) pairs)."""
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(num_users):
        items = rng.choice(num_items, size=per_user, replace=False)
        for t, i in enumerate(items):
            rows.append((u, i, t))
    dtype = [("user_id", np.int32), ("item_id", np.int32)]
    if timestamps:
        dtype.append(("ts", np.int32))
        data = np.array(rows, dtype=dtype)
    else:
        data = np.array([(u, i) for u, i, _ in rows], dtype=dtype)
    return data


def make_low_rank(num_users=64, num_items=256, rank=6, per_user=20, seed=0):
    """Planted low-rank preference matrix → top-per_user positives per user.

    A model that learns the structure must reach high Recall@K on the
    held-out half of each user's positives.
    """
    rng = np.random.default_rng(seed)
    U = rng.normal(size=(num_users, rank))
    V = rng.normal(size=(num_items, rank))
    scores = U @ V.T
    top = np.argsort(-scores, axis=1)[:, :per_user]
    train_rows, test_rows = [], []
    for u in range(num_users):
        items = top[u]
        rng.shuffle(items)
        half = per_user // 2
        train_rows += [(u, i) for i in items[:half]]
        test_rows += [(u, i) for i in items[half:]]
    dtype = [("user_id", np.int32), ("item_id", np.int32)]
    return (np.array(train_rows, dtype=dtype),
            np.array(test_rows, dtype=dtype))


@pytest.fixture
def interactions():
    return make_interactions()


@pytest.fixture
def low_rank_split():
    return make_low_rank()
