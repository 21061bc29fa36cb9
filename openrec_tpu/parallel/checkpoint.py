"""Per-shard (process-local) checkpointing with a manifest.

Scale counterpart of the single-host format (openrec_tpu/checkpoint.py):
at pod scale a row-sharded embedding table is too large to gather onto one
host (the amazon config's 450k x D table is fine; production catalogs are
not), and gathering would move the whole table over DCN every save. Here
every process writes ONLY the shards it owns (one .npz per process inside
a per-step directory), so checkpoint bandwidth scales with the host count
and no collective is needed on the save path.

Layout:
    <ckpt_dir>/ckpt-<step>/
        manifest.json        global metadata (process 0)
        shard-<proc>.npz     this process's pieces + its piece table

Each piece is one addressable shard with replica_id == 0 (exactly one
process saves each distinct block; replicated params are written once).
The piece table (JSON inside the .npz under __pieces__) records each
piece's global offsets, so restore can re-assemble ANY target sharding —
the mesh shape/layout may differ between save and restore. Restore uses
jax.make_array_from_callback: each device reads only the pieces
overlapping its own block (requires the checkpoint directory to be on
storage visible to all hosts, the standard pod setup).

The reference has no distributed checkpointing (single-host tf.train.Saver,
openrec/tf1/recommenders/recommender.py:484); `optimistic=True` carries its
`_optimistic_restore` semantics (recommender.py:460-473) to the sharded
format: leaves absent from the manifest (or with mismatched shape) keep the
template's values.
"""

from __future__ import annotations

import json
import os
import re
import shutil

import jax
import numpy as np

from openrec_tpu.checkpoint import _path_str


def _flatten_with_keys(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    return [("/".join(_path_str(p) for p in path), leaf)
            for path, leaf in flat], treedef


def _norm_index(index, shape):
    """Slices -> [[start, stop], ...] (replicated dims become full range)."""
    out = []
    for sl, dim in zip(index, shape):
        start, stop, step = sl.indices(dim)
        assert step == 1, "strided shards are not supported"
        out.append([start, stop])
    return out


def save_sharded(ckpt_dir: str, step: int, tree,
                 max_to_keep: int = 10) -> str:
    """Write this process's shards of `tree` (pytree of jax.Arrays) under
    `<ckpt_dir>/ckpt-<step>/`; process 0 writes the manifest and prunes old
    steps. Returns the step directory."""
    step_dir = os.path.join(ckpt_dir, f"ckpt-{step}")
    os.makedirs(step_dir, exist_ok=True)
    proc = jax.process_index()

    flat, _ = _flatten_with_keys(tree)
    pieces, arrays = [], {}
    leaves_meta = {}
    for key, leaf in flat:
        leaf = jax.numpy.asarray(leaf)
        leaves_meta[key] = {"shape": list(leaf.shape),
                            "dtype": str(leaf.dtype)}
        for shard in leaf.addressable_shards:
            if shard.replica_id != 0:
                continue
            member = f"piece{len(pieces)}"
            pieces.append({
                "key": key, "member": member,
                "offsets": _norm_index(shard.index, leaf.shape)})
            arrays[member] = np.asarray(shard.data)
    arrays["__pieces__"] = np.frombuffer(
        json.dumps(pieces).encode(), dtype=np.uint8)
    np.savez(os.path.join(step_dir, f"shard-{proc}.npz"), **arrays)

    if proc == 0:
        manifest = {"step": step, "process_count": jax.process_count(),
                    "leaves": leaves_meta}
        with open(os.path.join(step_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        if max_to_keep is not None:
            for old in sorted_steps(ckpt_dir)[:-max_to_keep]:
                shutil.rmtree(os.path.join(ckpt_dir, f"ckpt-{old}"),
                              ignore_errors=True)
    return step_dir


def sorted_steps(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    steps = [int(m.group(1)) for d in os.listdir(ckpt_dir)
             if (m := re.fullmatch(r"ckpt-(\d+)", d))
             and os.path.isdir(os.path.join(ckpt_dir, d))]
    return sorted(steps)


def latest_step(ckpt_dir: str):
    steps = sorted_steps(ckpt_dir)
    return steps[-1] if steps else None


class _PieceReader:
    """Lazily opens shard files; assembles arbitrary global blocks."""

    def __init__(self, step_dir: str):
        self.step_dir = step_dir
        self._files = {}          # fname -> np.lib.npyio.NpzFile
        self.by_key = {}          # key -> [(fname, member, offsets)]
        for fname in sorted(os.listdir(step_dir)):
            if not re.fullmatch(r"shard-\d+\.npz", fname):
                continue
            npz = np.load(os.path.join(step_dir, fname))
            self._files[fname] = npz
            for p in json.loads(bytes(npz["__pieces__"]).decode()):
                self.by_key.setdefault(p["key"], []).append(
                    (fname, p["member"], p["offsets"]))

    def read_block(self, key, index, shape, dtype):
        """Assemble the global block `index` (tuple of slices) of leaf
        `key` from whatever pieces overlap it."""
        starts = [sl.indices(d)[0] for sl, d in zip(index, shape)]
        stops = [sl.indices(d)[1] for sl, d in zip(index, shape)]
        out = np.empty([b - a for a, b in zip(starts, stops)], dtype)
        filled = 0
        for fname, member, offsets in self.by_key[key]:
            lo = [max(a, o[0]) for a, o in zip(starts, offsets)]
            hi = [min(b, o[1]) for b, o in zip(stops, offsets)]
            if any(l >= h for l, h in zip(lo, hi)):
                continue
            piece = self._files[fname][member]
            src = tuple(slice(l - o[0], h - o[0])
                        for l, h, o in zip(lo, hi, offsets))
            dst = tuple(slice(l - a, h - a)
                        for l, h, a in zip(lo, hi, starts))
            out[dst] = piece[src]
            filled += int(np.prod([h - l for l, h in zip(lo, hi)]))
        assert filled >= int(out.size), (
            f"checkpoint pieces do not cover block {index} of '{key}'")
        return out

    def close(self):
        for npz in self._files.values():
            npz.close()


def restore_sharded(step_dir: str, template, shardings,
                    optimistic: bool = False):
    """Re-assemble a checkpoint into `shardings` (pytree of NamedSharding
    matching `template`'s structure). The target mesh may differ from the
    one used at save time — each device reads exactly the pieces
    overlapping its block.

    template leaves supply structure/shape/dtype (arrays or
    jax.ShapeDtypeStruct); with optimistic=True they must be real arrays
    (their values back-fill leaves absent from the checkpoint)."""
    with open(os.path.join(step_dir, "manifest.json")) as f:
        manifest = json.load(f)
    reader = _PieceReader(step_dir)
    try:
        flat_t, treedef = _flatten_with_keys(template)
        flat_s, _ = _flatten_with_keys(shardings)
        new_leaves = []
        for (key, leaf), (_, sharding) in zip(flat_t, flat_s):
            shape = tuple(np.shape(leaf))
            dtype = np.asarray(
                leaf if not hasattr(leaf, "dtype") else np.empty(
                    0, leaf.dtype)).dtype
            meta = manifest["leaves"].get(key)
            if meta is None or tuple(meta["shape"]) != shape:
                if optimistic:
                    new_leaves.append(jax.device_put(leaf, sharding))
                    continue
                raise KeyError(
                    f"checkpoint {step_dir} is missing '{key}' (or shape "
                    "mismatch); use optimistic=True for partial restore")
            new_leaves.append(jax.make_array_from_callback(
                shape, sharding,
                lambda idx, k=key, sh=shape, dt=dtype:
                    reader.read_block(k, idx, sh, dt)))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)
    finally:
        reader.close()
