"""Row-sharded embedding tables with explicit shard_map exchange.

The GSPMD path (parallel/train.py) lets XLA partition `jnp.take` on a
row-sharded table automatically. This module is the *explicit* alternative
for when you want deterministic communication: each device holds a
[V/m, D] row shard; a lookup masks ids to its local range, gathers, and
psums partial rows over the 'model' axis (one reduce per lookup, riding
ICI). Gradients flow through shard_map (psum transposes to identity;
the masked gather transposes to a local scatter-add) — the table's grad is
itself row-sharded, so the optimizer update stays local per shard.

No reference counterpart (SURVEY.md §2.9): OpenRec keeps every table on one
device. This is the component that lets catalogs (450k items in the amazon
config) and Criteo-scale table collections exceed one chip's HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from openrec_tpu.parallel.mesh import MODEL_AXIS


def pad_rows(num_rows: int, num_shards: int) -> int:
    """Rows padded up so the table splits evenly across shards."""
    return -(-num_rows // num_shards) * num_shards


def sharded_lookup(table, ids, mesh, axis: str = MODEL_AXIS):
    """table: [V_padded, D] sharded P(axis, None); ids: [B] replicated over
    `axis` (may be sharded over other mesh axes). Returns [B, D] rows with
    the same sharding as ids' batch layout.

    Implementation: mask-gather-psum inside shard_map. For row r owned by
    shard s, only s contributes a nonzero partial — the psum both routes the
    row and keeps the math exact for out-of-range (padded) ids (zeros).
    """
    num_shards = mesh.shape[axis]
    rows_per_shard = table.shape[0] // num_shards

    def _kernel(table_shard, ids_local):
        shard = jax.lax.axis_index(axis)
        lo = shard * rows_per_shard
        local = ids_local - lo
        in_range = (local >= 0) & (local < rows_per_shard)
        safe = jnp.where(in_range, local, 0)
        rows = jnp.take(table_shard, safe, axis=0)
        rows = rows * in_range[:, None].astype(rows.dtype)
        return jax.lax.psum(rows, axis)

    other_axes = tuple(a for a in mesh.axis_names if a != axis)
    in_specs = (P(axis, None), P(*other_axes) if other_axes else P())
    out_specs = P(*other_axes) if other_axes else P()
    return jax.shard_map(
        _kernel, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False)(table, ids)


def sharded_scores(user_vecs, table, bias, mesh, axis: str = MODEL_AXIS):
    """Full-catalog scores u·Vᵀ+b with a row-sharded catalog.

    user_vecs: [B, D] (replicated over `axis`); table: [I_padded, D]
    P(axis, None); bias: [I_padded, 1] P(axis, None).
    Returns [B, I_padded] sharded P(batch_axes..., axis): each device
    computes its slice of the catalog — no gather of the table, scores
    stay sharded along items for downstream per-shard top-k.
    """
    def _kernel(u, v_shard, b_shard):
        return u @ v_shard.T + jnp.reshape(b_shard, (1, -1))

    other_axes = tuple(a for a in mesh.axis_names if a != axis)
    batch_spec = P(*other_axes) if other_axes else P()
    return jax.shard_map(
        _kernel, mesh=mesh,
        in_specs=(batch_spec, P(axis, None), P(axis, None)),
        out_specs=P(*(other_axes + (axis,))) if other_axes else P(None, axis),
        check_vma=False)(user_vecs, table, bias)


def sharded_topk(scores, k: int, mesh, axis: str = MODEL_AXIS,
                 approx: bool = False, recall_target: float = 0.99):
    """Top-k over an item-sharded score matrix [B, I] P(..., axis):
    per-shard top-k, then all_gather the k candidates and reduce — the
    classic two-phase distributed top-k (k ≪ I/shards).

    approx=True runs phase 1 through `lax.approx_max_k` (TPU
    PartialReduce) — the dominant cost at big per-shard catalogs, ~10×
    faster than exact sort-bound top-k (docs/PERF_NOTES.md); phase 2
    (k·shards candidates) stays exact, so overall recall ≥ the per-shard
    recall_target and every returned (score, id) is exact."""
    num_shards = mesh.shape[axis]
    rows_per_shard = scores.shape[-1] // num_shards

    def _kernel(s_local):
        shard = jax.lax.axis_index(axis)
        if approx:
            vals, idx = jax.lax.approx_max_k(
                s_local, k, recall_target=recall_target)
        else:
            vals, idx = jax.lax.top_k(s_local, k)
        idx = idx + shard * rows_per_shard
        vals = jax.lax.all_gather(vals, axis, axis=-1, tiled=True)
        idx = jax.lax.all_gather(idx, axis, axis=-1, tiled=True)
        best_v, best_pos = jax.lax.top_k(vals, k)
        best_i = jnp.take_along_axis(idx, best_pos, axis=-1)
        return best_v, best_i

    other_axes = tuple(a for a in mesh.axis_names if a != axis)
    batch_spec = (P(*(other_axes + (axis,))) if other_axes
                  else P(None, axis))
    out_spec = P(*other_axes) if other_axes else P()
    return jax.shard_map(
        _kernel, mesh=mesh, in_specs=(batch_spec,),
        out_specs=(out_spec, out_spec), check_vma=False)(scores)


def sharded_pallas_topk(user_vecs, table, bias, k: int, mesh,
                        axis: str = MODEL_AXIS,
                        recall_target: float | None = None,
                        per_bucket: int = 1,
                        interpret: bool | None = None):
    """Fused retrieval over a row-sharded catalog: each shard streams its
    [I/m, D] table slice through the Pallas bucket-max kernel
    (ops/bucketed_topk.py) and keeps an exact local top-k; the k·m
    candidates are all_gathered and exactly merged. Unlike
    `sharded_scores` + `sharded_topk`, the per-shard [B, I/m] score matrix
    never exists in HBM — per-shard traffic is just the table slice plus
    O(B·L) bucket maxima, so this is the path for catalogs that outgrow
    one chip's HBM (ROADMAP: row-sharded serving).

    user_vecs [B, D] replicated over `axis` (may be sharded over other
    mesh axes); table [I_padded, D] P(axis, None); bias [I_padded, 1] /
    [I_padded] P(axis, None) or None. Returns ([B, k] scores, [B, k]
    global item ids), every returned pair exact; recall follows the
    bucket-collision law per shard (see pallas_score_topk).
    per_bucket=2 routes through the two-level kernel (the
    recall>=0.995 regime, docs/PERF_NOTES.md r4).

    interpret defaults to `backend != tpu` so CPU-mesh tests and the
    driver dryrun execute the same code path.
    """
    from openrec_tpu.ops.bucketed_topk import pallas_score_topk

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    num_shards = mesh.shape[axis]
    rows_per_shard = table.shape[0] // num_shards

    def _kernel(u, v_shard, b_shard):
        shard = jax.lax.axis_index(axis)
        vals, idx = pallas_score_topk(
            u, v_shard, b_shard, k, recall_target=recall_target,
            per_bucket=per_bucket, interpret=interpret)
        idx = idx + shard * rows_per_shard
        vals = jax.lax.all_gather(vals, axis, axis=-1, tiled=True)
        idx = jax.lax.all_gather(idx, axis, axis=-1, tiled=True)
        best_v, best_pos = jax.lax.top_k(vals, k)
        return best_v, jnp.take_along_axis(idx, best_pos, axis=-1)

    other_axes = tuple(a for a in mesh.axis_names if a != axis)
    batch_spec = P(*other_axes) if other_axes else P()
    bias_spec = P(axis) if bias is not None and bias.ndim == 1 \
        else P(axis, None)
    if bias is None:
        def _kernel_nb(u, v_shard):
            return _kernel(u, v_shard, None)
        return jax.shard_map(
            _kernel_nb, mesh=mesh,
            in_specs=(batch_spec, P(axis, None)),
            out_specs=(batch_spec, batch_spec),
            check_vma=False)(user_vecs, table)
    return jax.shard_map(
        _kernel, mesh=mesh,
        in_specs=(batch_spec, P(axis, None), bias_spec),
        out_specs=(batch_spec, batch_spec),
        check_vma=False)(user_vecs, table, bias)
