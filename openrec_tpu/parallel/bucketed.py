"""Bucketed id exchange for row-sharded embedding tables.

`sharded_lookup` (parallel/embedding.py) routes rows with a mask-gather-psum:
every shard gathers all B ids (masked) and the psum moves a full [B, D]
through the ring. That is simple and exact, but each shard does O(B) gather
work and the collective carries O(B·D) regardless of how many rows it owns.

This module is the scalable alternative (the DLRM-style "EP" exchange, the
one parallelism this domain genuinely demands — SURVEY.md §2.9): the HOST
buckets each batch's ids by owning shard before `device_put`, so on device
each shard only gathers the ids it owns (O(B/m)) and the exchange is a
single all_gather (or all_to_all when the id stream itself is sharded over
'model') of already-gathered rows.

Two exchange strategies, both differentiable (shard_map transposes
take→scatter-add, all_gather→psum_scatter, all_to_all→all_to_all):

- `gathered_lookup`: ids replicated over 'model' (sharded over 'data').
  Per-shard bucket gather + all_gather + local unpermute. Comm per device:
  (m-1)/m · B_local·C/B… ≈ one [m·C, D] all_gather ≈ B_local·slack·D.
- `alltoall_lookup`: ids sharded over BOTH 'data' and 'model' (each device
  feeds its own B/(d·m) slice — the pod-scale input layout where every
  host device_puts only its slice). Ids route to owners and rows route
  back via two all_to_alls of [C·m, D]/m each.

No reference counterpart: OpenRec is single-device (SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from openrec_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def default_capacity(local_batch: int, num_shards: int, slack: float = 2.0
                     ) -> int:
    """Static per-bucket capacity: expected B/m ids per shard × slack,
    rounded up to a multiple of 8 (lane-friendly). Must be constant across
    steps — it is baked into the compiled program's shapes."""
    c = int(np.ceil(local_batch / num_shards * slack))
    return max(8, -(-c // 8) * 8)


def bucket_ids(ids: np.ndarray, num_shards: int, rows_per_shard: int,
               capacity: Optional[int] = None):
    """Bucket a flat id vector by owning shard (host side, vectorized).

    ids: [B] int. Returns (buckets [num_shards, C] int32,
    inv [B] int32) where buckets[s, j] is the j-th id owned by shard s
    (padding slots repeat the shard's base row — a valid local gather that
    no inv entry references) and inv[k] is the flat index into the
    row-major [num_shards·C] gathered-row buffer holding ids[k]'s row.

    Raises ValueError on bucket overflow (raise `capacity`; it must stay
    constant across steps for one compiled program).
    """
    ids = np.asarray(ids)
    b = ids.shape[0]
    if capacity is None:
        capacity = default_capacity(b, num_shards)
    shard = ids // rows_per_shard
    order = np.argsort(shard, kind="stable")          # group by shard
    sorted_shard = shard[order]
    counts = np.bincount(sorted_shard, minlength=num_shards)
    if counts.max(initial=0) > capacity:
        raise ValueError(
            f"bucket overflow: max {counts.max()} ids on one shard > "
            f"capacity {capacity}; pass a larger capacity")
    starts = np.zeros(num_shards, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    # position of each sorted id within its bucket
    pos_in_bucket = np.arange(b, dtype=np.int64) - starts[sorted_shard]
    buckets = np.repeat(
        (np.arange(num_shards, dtype=np.int64) * rows_per_shard)[:, None],
        capacity, axis=1)                              # pad = shard base row
    buckets[sorted_shard, pos_in_bucket] = ids[order]
    inv = np.empty(b, dtype=np.int64)
    inv[order] = sorted_shard * capacity + pos_in_bucket
    return buckets.astype(np.int32), inv.astype(np.int32)


def bucket_batch(ids: np.ndarray, num_shards: int, rows_per_shard: int,
                 data_shards: int = 1, capacity: Optional[int] = None):
    """Bucket a global batch whose leading dim shards over 'data'.

    ids: [B]; each of the `data_shards` contiguous slices (B/d ids) is
    bucketed independently (that is the slice one data-shard's devices
    see). Returns (buckets [d, num_shards, C], inv [d, B/d]) ready for
    `gathered_lookup` with in-specs P('data', ...)."""
    ids = np.asarray(ids)
    b = ids.shape[0]
    assert b % data_shards == 0, (b, data_shards)
    local = b // data_shards
    if capacity is None:
        capacity = default_capacity(local, num_shards)
    buckets, invs = zip(*(bucket_ids(ids[i * local:(i + 1) * local],
                                     num_shards, rows_per_shard, capacity)
                          for i in range(data_shards)))
    return np.stack(buckets), np.stack(invs)


def gathered_lookup(table, buckets, inv, mesh, axis: str = MODEL_AXIS,
                    data_axis: str = DATA_AXIS):
    """Lookup with host-pre-bucketed ids, one all_gather of gathered rows.

    table: [V_padded, D] sharded P(axis, None).
    buckets: [d, m, C] sharded P(data_axis) — per-data-shard buckets from
      `bucket_batch` (d = mesh.shape[data_axis], m = mesh.shape[axis]).
    inv: [d, B_local] sharded P(data_axis).
    Returns [d·B_local, D] rows sharded P(data_axis, None), in the original
    id order within each data shard.
    """
    num_shards = mesh.shape[axis]
    rows_per_shard = table.shape[0] // num_shards

    def _kernel(table_shard, buckets_local, inv_local):
        # buckets_local: [1, m, C]; inv_local: [1, B_local]
        mine = buckets_local[0, jax.lax.axis_index(axis)]     # [C]
        rows = jnp.take(table_shard, mine - jax.lax.axis_index(axis)
                        * rows_per_shard, axis=0)              # [C, D]
        allrows = jax.lax.all_gather(rows, axis, axis=0,
                                     tiled=True)               # [m·C, D]
        return jnp.take(allrows, inv_local[0], axis=0)[None]   # [1, B, D]

    out = jax.shard_map(
        _kernel, mesh=mesh,
        in_specs=(P(axis, None), P(data_axis, None, None), P(data_axis,
                                                             None)),
        out_specs=P(data_axis, None, None), check_vma=False)(
        table, buckets, inv)
    return out.reshape(-1, table.shape[1])


def alltoall_lookup(table, buckets, inv, mesh, axis: str = MODEL_AXIS,
                    data_axis: str = DATA_AXIS):
    """Pod-scale lookup: the id stream is sharded over BOTH mesh axes.

    Each device holds send-buckets for its own B/(d·m) batch slice; ids
    route to the owning shard and rows route back with two all_to_alls —
    per-device communication O(C·D), independent of the model-axis size
    (vs all_gather's O(m·C·D)).

    table: [V_padded, D] sharded P(axis, None).
    buckets: [d, m, m, C] sharded P(data_axis, axis) — buckets[i, j] are
      device (i, j)'s send buckets, one [C] bucket per destination shard.
    inv: [d, m, B_dev] sharded P(data_axis, axis) — flat indices into the
      row-major [m·C] returned-row buffer.
    Returns [d, m, B_dev, D] sharded P(data_axis, axis, None, None).
    """
    num_shards = mesh.shape[axis]
    rows_per_shard = table.shape[0] // num_shards

    def _kernel(table_shard, buckets_local, inv_local):
        send = buckets_local[0, 0]                             # [m, C]
        recv = jax.lax.all_to_all(send, axis, split_axis=0,
                                  concat_axis=0, tiled=True)   # [m, C]
        lo = jax.lax.axis_index(axis) * rows_per_shard
        rows = jnp.take(table_shard, recv - lo, axis=0)        # [m, C, D]
        back = jax.lax.all_to_all(rows, axis, split_axis=0,
                                  concat_axis=0, tiled=True)   # [m, C, D]
        flat = back.reshape(-1, back.shape[-1])                # [m·C, D]
        return jnp.take(flat, inv_local[0, 0], axis=0)[None, None]

    return jax.shard_map(
        _kernel, mesh=mesh,
        in_specs=(P(axis, None), P(data_axis, axis, None, None),
                  P(data_axis, axis, None)),
        out_specs=P(data_axis, axis, None, None), check_vma=False)(
        table, buckets, inv)


def bucket_batch_2d(ids: np.ndarray, num_shards: int, rows_per_shard: int,
                    data_shards: int, capacity: Optional[int] = None):
    """Bucket a global batch for `alltoall_lookup`: the batch shards over
    'data' (major) then 'model' (minor). Returns
    (buckets [d, m, m, C], inv [d, m, B_dev])."""
    ids = np.asarray(ids)
    b = ids.shape[0]
    n_dev = data_shards * num_shards
    assert b % n_dev == 0, (b, n_dev)
    per_dev = b // n_dev
    if capacity is None:
        capacity = default_capacity(per_dev, num_shards)
    ids_dev = ids.reshape(data_shards, num_shards, per_dev)
    buckets = np.empty((data_shards, num_shards, num_shards, capacity),
                       dtype=np.int32)
    inv = np.empty((data_shards, num_shards, per_dev), dtype=np.int32)
    for i in range(data_shards):
        for j in range(num_shards):
            buckets[i, j], inv[i, j] = bucket_ids(
                ids_dev[i, j], num_shards, rows_per_shard, capacity)
    return buckets, inv
