"""Pytree checkpointing with optimistic (shape-matched partial) restore.

Parity: tf.train.Saver with max_to_keep (reference openrec/tf1/recommenders/
recommender.py:484), periodic save (model_trainer.py:78-79), warm start via
init_model_dir (recommender.py:495-498) and `_optimistic_restore` — load only
variables whose name AND shape match (recommender.py:460-473), which enables
transfer between model variants (e.g. BPR → VBPR).

Format: one .npz per step holding the flattened pytree ('path -> array').
Path keys come from jax.tree_util key-paths, so any nesting of dicts/lists
round-trips. No TF/orbax dependency; multi-host sharded checkpointing lives
in parallel/ (each host saves its addressable shards).
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(entry):
    if isinstance(entry, jax.tree_util.DictKey):
        return str(entry.key)
    if isinstance(entry, jax.tree_util.SequenceKey):
        return str(entry.idx)
    if isinstance(entry, jax.tree_util.GetAttrKey):
        return str(entry.name)
    return str(entry)


def save(ckpt_dir: str, step: int, tree, max_to_keep: int = 10) -> str:
    """Write `<ckpt_dir>/ckpt-<step>.npz`; prune old checkpoints."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"ckpt-{step}.npz")
    np.savez(path, **_flatten(tree))
    if max_to_keep is not None:
        kept = sorted_checkpoints(ckpt_dir)
        for old in kept[:-max_to_keep]:
            os.remove(os.path.join(ckpt_dir, old))
    return path


def sorted_checkpoints(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    files = [f for f in os.listdir(ckpt_dir)
             if re.fullmatch(r"ckpt-\d+\.npz", f)]
    return sorted(files, key=lambda f: int(re.findall(r"\d+", f)[0]))


def latest_checkpoint(ckpt_dir: str):
    ckpts = sorted_checkpoints(ckpt_dir)
    return os.path.join(ckpt_dir, ckpts[-1]) if ckpts else None


def latest_step(ckpt_dir: str):
    ckpts = sorted_checkpoints(ckpt_dir)
    return int(re.findall(r"\d+", ckpts[-1])[0]) if ckpts else None


def restore(path: str, template=None, optimistic: bool = False):
    """Load a checkpoint.

    Without a template: returns {path: array} (flat).
    With a template: returns a pytree of the template's structure.
      - optimistic=False: every leaf must be present with matching shape.
      - optimistic=True: leaves present with matching name+shape are loaded,
        everything else keeps the template's value (reference
        `_optimistic_restore` semantics).
    """
    with np.load(path) as data:
        flat_saved = {k: data[k] for k in data.files}
    if template is None:
        return flat_saved

    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path_entries, leaf in paths_and_leaves:
        key = "/".join(_path_str(p) for p in path_entries)
        if key in flat_saved and flat_saved[key].shape == tuple(
                np.shape(leaf)):
            new_leaves.append(jax.numpy.asarray(
                flat_saved[key], dtype=jax.numpy.asarray(leaf).dtype))
        elif optimistic:
            new_leaves.append(leaf)
        else:
            raise KeyError(
                f"checkpoint {path} is missing '{key}' "
                f"(or shape mismatch); use optimistic=True for partial "
                "restore")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
