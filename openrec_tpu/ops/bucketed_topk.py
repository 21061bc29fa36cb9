"""Compiled Pallas retrieval kernel: fused score + bucket-max top-k.

The XLA retrieval paths (ops/topk.py) compute `scores = U[ids] @ V.T + b`
as a standalone matmul whose [B, I] output round-trips through HBM before
`lax.top_k` / `lax.approx_max_k` consumes it — at the amazon config
(256 x 450,166 f32) that is ~460 MB written + read per batch, and the
whole path is bound by that traffic, not by the MXU.

This kernel streams the item table through VMEM tile by tile, computes
the score tile on the MXU, and reduces each BUCKET of consecutive items
to its (max score, argmax id) pair in registers — the [B, I] scores never
exist in HBM. The kernel emits [B, L] bucket maxima (L = I/bucket); the
caller finishes with an exact `lax.top_k` over that small array. This is
the same algorithm `lax.approx_max_k` lowers to (PartialReduce: bucket
maxima + small exact top-k — see its XLA docs), with the same guarantee:
every returned (score, id) is exact; a true top-k item is missed only
when two of them land in one bucket, so expected recall at k=100,
L=I/128 matches approx_max_k's at the same reduction ratio.

HBM traffic: the table itself (I·D·4 bytes) + O(B·L) outputs, vs
2·B·I·4 + I·D·4 for the unfused XLA paths — a ~10-20x traffic cut for
B=256, D=64.

No reference counterpart (the reference serves full dense score rows,
openrec/tf1/fast_dot_product_server.py:132-141); this is the TPU-native
serving accelerator for its biggest catalogs (tradesy 165,906 / amazon
450,166 items, tf1_examples/dataloader.py).

Correctness: tests/test_ops.py (interpret mode vs numpy/XLA oracles).
Measured on real TPU: benchmarks/pallas_topk.py, numbers in
docs/PERF_NOTES.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _round_up(x, m):
    return -(-x // m) * m


def _bucket_max_kernel(u_ref, v_ref, b_ref, vals_ref, ids_ref, *,
                       item_tile, bucket, acc_dtype):
    """One (user block, item tile) grid cell: scores on the MXU, then one
    (max, argmax) per `bucket` consecutive items, written to this tile's
    [UB, item_tile/bucket] output slice."""
    j = pl.program_id(1)
    scores = jax.lax.dot_general(
        u_ref[:], v_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc_dtype,
    ) + b_ref[:].astype(acc_dtype)                     # [UB, item_tile]
    ub = scores.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (ub, bucket), 1)
    for c in range(item_tile // bucket):
        blk = scores[:, c * bucket:(c + 1) * bucket]   # [UB, bucket]
        vmax = jnp.max(blk, axis=1, keepdims=True)     # [UB, 1]
        # first-match argmax: min lane index attaining the max
        hit = jnp.where(blk == vmax, lane, bucket)
        amax = jnp.min(hit, axis=1, keepdims=True)     # [UB, 1]
        vals_ref[:, c:c + 1] = vmax
        ids_ref[:, c:c + 1] = j * item_tile + c * bucket + amax


def bucket_max_scores(user_vecs, item_table, item_bias,
                      bucket: int = 128, item_tile: int = 2048,
                      user_block: int = 256, interpret: bool = False):
    """[B, L] (bucket-max scores, argmax item ids) of u·Vᵀ+b, L=I/bucket,
    computed in one fused pass (never materializing [B, I]).

    user_vecs [B, D]; item_table [I, D]; item_bias [I] or [I, 1] or None.
    Rows past I are padded with -inf bias so they never win. The dot
    accumulates in fp32 regardless of table dtype (bf16 tables halve the
    only remaining HBM traffic)."""
    B, D = user_vecs.shape
    I = item_table.shape[0]
    item_tile = min(item_tile, _round_up(I, bucket))
    I_pad = _round_up(I, item_tile)
    UB = min(user_block, _round_up(B, 8))
    B_pad = _round_up(B, UB)
    L = I_pad // bucket

    u = jnp.zeros((B_pad, D), user_vecs.dtype).at[:B].set(user_vecs)
    v = jnp.zeros((I_pad, D), item_table.dtype).at[:I].set(item_table)
    b = jnp.full((1, I_pad), -jnp.inf, jnp.float32)
    if item_bias is not None:
        b = b.at[0, :I].set(jnp.reshape(item_bias, (-1,)).astype(
            jnp.float32))
    else:
        b = b.at[0, :I].set(0.0)

    kernel = functools.partial(_bucket_max_kernel, item_tile=item_tile,
                               bucket=bucket, acc_dtype=jnp.float32)
    grid = (B_pad // UB, I_pad // item_tile)
    buckets_per_tile = item_tile // bucket
    vals, ids = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((UB, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((item_tile, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, item_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((UB, buckets_per_tile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((UB, buckets_per_tile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B_pad, L), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, L), jnp.int32),
        ],
        interpret=interpret,
    )(u, v, b)
    return vals[:B], ids[:B]


def pallas_score_topk(user_vecs, item_table, item_bias, k: int,
                      bucket: int = 128, item_tile: int = 2048,
                      user_block: int = 256, interpret: bool = False):
    """(top_vals, top_ids): fused Pallas bucket-max pass + exact top-k
    over the [B, I/bucket] maxima. Same guarantee as `lax.approx_max_k`
    at reduction ratio I/L: every returned score/id exact; recall < 1
    only from top-k collisions within a bucket."""
    I = item_table.shape[0]
    assert k <= I, (k, I)
    # need at least k buckets; shrink bucket (power of two) until L >= k
    while bucket > 1 and I // bucket < k:
        bucket //= 2
    item_tile = max(bucket, item_tile - item_tile % bucket)
    vals, ids = bucket_max_scores(user_vecs, item_table, item_bias,
                                  bucket=bucket, item_tile=item_tile,
                                  user_block=user_block,
                                  interpret=interpret)
    top_vals, pos = jax.lax.top_k(vals, k)
    return top_vals, jnp.take_along_axis(ids, pos, axis=1)
