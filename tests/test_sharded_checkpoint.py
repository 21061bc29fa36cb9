"""Per-shard checkpointing (parallel/checkpoint.py): save under one mesh
layout, restore under another, optimistic partial restore, pruning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from openrec_tpu.parallel import checkpoint as pck
from openrec_tpu.parallel.mesh import make_mesh, match_partition_rules

RULES = ((r"item_embed|item_bias", P("model", None)),
         (r"user_embed", P("data", None)))


def _params(num_items=37, num_users=24, d=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "item_embed": rng.normal(size=(num_items, d)).astype(np.float32),
        "item_bias": rng.normal(size=(num_items, 1)).astype(np.float32),
        "user_embed": rng.normal(size=(num_users, d)).astype(np.float32),
        "step_scale": np.float32(0.5),
    }


def _place(params, mesh):
    # Pad row-sharded leading dims to the mesh size (as pad_rows does in
    # the real pipeline) so uneven tables shard cleanly.
    m = mesh.shape["model"]
    d = mesh.shape["data"]
    out = dict(params)
    for k, div in (("item_embed", m), ("item_bias", m), ("user_embed", d)):
        arr = params[k]
        pad = (-len(arr)) % div
        out[k] = np.pad(arr, ((0, pad),) + ((0, 0),) * (arr.ndim - 1))
    shardings = match_partition_rules(RULES, out, mesh)
    placed = jax.tree_util.tree_map(jax.device_put, out, shardings)
    return placed, shardings


def test_save_restore_different_mesh(tmp_path):
    mesh_a = make_mesh(data=2, model=4)
    params_a, _ = _place(_params(num_items=40, num_users=24), mesh_a)
    step_dir = pck.save_sharded(str(tmp_path), 7, params_a)
    assert pck.latest_step(str(tmp_path)) == 7

    mesh_b = make_mesh(data=4, model=2)
    template = jax.tree_util.tree_map(np.asarray, params_a)
    shardings = match_partition_rules(RULES, template, mesh_b)
    restored = pck.restore_sharded(step_dir, template, shardings)
    for k in params_a:
        np.testing.assert_array_equal(np.asarray(restored[k]),
                                      np.asarray(params_a[k]))
        assert restored[k].sharding.mesh.shape == dict(mesh_b.shape)


def test_replicated_leaf_written_once_and_restored(tmp_path):
    mesh = make_mesh(data=8, model=1)
    params, _ = _place(_params(), mesh)
    step_dir = pck.save_sharded(str(tmp_path), 1, params)
    npz = np.load(step_dir + "/shard-0.npz")
    import json
    pieces = json.loads(bytes(npz["__pieces__"]).decode())
    assert sum(p["key"] == "step_scale" for p in pieces) == 1

    template = jax.tree_util.tree_map(np.asarray, params)
    shardings = match_partition_rules(RULES, template, mesh)
    restored = pck.restore_sharded(step_dir, template, shardings)
    assert float(restored["step_scale"]) == 0.5


def test_optimistic_restore_and_missing_key(tmp_path):
    mesh = make_mesh(data=2, model=4)
    params, _ = _place(_params(num_items=40), mesh)
    saved = {k: v for k, v in params.items() if k != "user_embed"}
    step_dir = pck.save_sharded(str(tmp_path), 3, saved)

    template = jax.tree_util.tree_map(np.asarray, params)
    template["user_embed"] = np.full_like(template["user_embed"], 9.0)
    shardings = match_partition_rules(RULES, template, mesh)
    with pytest.raises(KeyError):
        pck.restore_sharded(step_dir, template, shardings)
    restored = pck.restore_sharded(step_dir, template, shardings,
                                   optimistic=True)
    np.testing.assert_array_equal(np.asarray(restored["user_embed"]), 9.0)
    np.testing.assert_array_equal(np.asarray(restored["item_embed"]),
                                  np.asarray(params["item_embed"]))


def test_max_to_keep_prunes_step_dirs(tmp_path):
    mesh = make_mesh(data=8, model=1)
    params, _ = _place(_params(), mesh)
    for step in range(5):
        pck.save_sharded(str(tmp_path), step, params, max_to_keep=2)
    assert pck.sorted_steps(str(tmp_path)) == [3, 4]


def test_restore_into_fresh_optimizer_state_shapes(tmp_path):
    """Shape mismatch (e.g. grown catalog) falls back to template under
    optimistic — the reference's transfer-between-variants use case."""
    mesh = make_mesh(data=2, model=4)
    params, _ = _place(_params(num_items=40), mesh)
    step_dir = pck.save_sharded(str(tmp_path), 0, params)

    bigger = _params(num_items=72, seed=1)
    template, _ = ({k: np.asarray(v) for k, v in
                    _place(bigger, mesh)[0].items()}, None)
    shardings = match_partition_rules(RULES, template, mesh)
    restored = pck.restore_sharded(step_dir, template, shardings,
                                   optimistic=True)
    np.testing.assert_array_equal(np.asarray(restored["item_embed"]),
                                  template["item_embed"])
    np.testing.assert_array_equal(np.asarray(restored["user_embed"]),
                                  np.asarray(params["user_embed"]))
