import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openrec_tpu import checkpoint as ckpt
from openrec_tpu.models import BPR
from openrec_tpu.training import Trainer


def test_save_restore_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6).reshape(2, 3).astype(jnp.float32),
            "nested": {"b": jnp.ones((4,))},
            "lst": [jnp.zeros((2,)), jnp.full((3,), 7.0)]}
    path = ckpt.save(str(tmp_path), 5, tree)
    template = jax.tree_util.tree_map(jnp.zeros_like, tree)
    restored = ckpt.restore(path, template)
    for want, got in zip(jax.tree_util.tree_leaves(tree),
                         jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_max_to_keep(tmp_path):
    tree = {"x": jnp.zeros((2,))}
    for step in range(15):
        ckpt.save(str(tmp_path), step, tree, max_to_keep=3)
    kept = ckpt.sorted_checkpoints(str(tmp_path))
    assert kept == ["ckpt-12.npz", "ckpt-13.npz", "ckpt-14.npz"]
    assert ckpt.latest_step(str(tmp_path)) == 14


def test_optimistic_restore_shape_matched_subset(tmp_path):
    # BPR checkpoint warm-starts a model with an extra head and a resized
    # user table: matching leaves load, others keep template values
    # (reference recommender.py:460-473 semantics).
    old = {"user_embed": jnp.ones((5, 4)), "item_embed": jnp.ones((7, 4))}
    path = ckpt.save(str(tmp_path), 0, old)
    template = {"user_embed": jnp.zeros((6, 4)),   # shape mismatch → keep
                "item_embed": jnp.zeros((7, 4)),   # match → load
                "extra_mlp": jnp.zeros((3,))}      # missing → keep
    restored = ckpt.restore(path, template, optimistic=True)
    np.testing.assert_array_equal(np.asarray(restored["user_embed"]), 0.0)
    np.testing.assert_array_equal(np.asarray(restored["item_embed"]), 1.0)
    np.testing.assert_array_equal(np.asarray(restored["extra_mlp"]), 0.0)
    with pytest.raises(KeyError):
        ckpt.restore(path, template, optimistic=False)


def test_trainer_save_restore_and_warm_start(tmp_path):
    model = BPR(total_users=8, total_items=16, dim_user_embed=4,
                dim_item_embed=4)
    save_dir = str(tmp_path / "run1")
    tr = Trainer(model, save_model_dir=save_dir, seed=0)
    batch = {"user_id": np.arange(8, dtype=np.int32),
             "p_item_id": np.arange(8, dtype=np.int32),
             "n_item_id": np.arange(8, 16, dtype=np.int32)}
    for _ in range(3):
        tr.train_step(batch)
    tr.save()
    want = np.asarray(tr.params["item_embed"])

    tr2 = Trainer(model, save_model_dir=save_dir, seed=1)
    tr2.restore()
    np.testing.assert_array_equal(np.asarray(tr2.params["item_embed"]),
                                  want)

    # init_model_dir warm start (optimistic)
    tr3 = Trainer(model, init_model_dir=save_dir, seed=2)
    np.testing.assert_array_equal(
        np.asarray(tr3.params["params"]["item_embed"])
        if "params" in tr3.params else np.asarray(tr3.params["item_embed"]),
        want)
