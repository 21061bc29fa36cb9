"""Compiled Pallas retrieval kernel: fused score + bucket-max top-k.

The XLA retrieval paths (ops/topk.py) compute `scores = U[ids] @ V.T + b`
as a standalone matmul whose [B, I] output round-trips through HBM before
`lax.top_k` / `lax.approx_max_k` consumes it — at the amazon config
(256 x 450,166 f32) that is ~460 MB written + read per batch, and the
whole path is bound by that traffic, not by the MXU.

This kernel streams the item table through VMEM block by block, computes
score chunks on the MXU, and keeps one running (max score, argmax id)
register pair per BUCKET of items — the [B, I] scores never exist in HBM.
The caller finishes with an exact `lax.top_k` over the small [B, L]
bucket-maxima array (L = I/bucket). Same algorithm `lax.approx_max_k`
lowers to (PartialReduce: bucket maxima + small exact top-k), with the
same guarantee: every returned (score, id) pair is exact; a true top-k
item is missed only when two of them land in one bucket, so expected
recall at k=100, L=I/128 matches approx_max_k's at the same reduction
ratio.

Bucket layout is STRIDED, not consecutive: within each `128*bucket`-item
grid block, bucket `l` holds the items at lane position `l` of each
128-wide row group. That makes every kernel output block a [UB, 128]
tile — Mosaic requires the last block dimension to be 128 (lane width) —
and turns the reduction into `bucket` running element-wise max/select
steps, a pure VPU pattern with no in-kernel sort/top-k primitive (which
Mosaic lacks; see ops/topk.py's interpret-only study kernel). Any
balanced partition of items into L buckets gives the identical recall
law, so the strided layout costs nothing.

HBM traffic per batch: the table itself (I*D*4 bytes) + O(B*L) outputs,
vs 2*B*I*4 + I*D*4 for the unfused XLA paths — a ~10-20x traffic cut for
B=256, D=64. bf16 tables halve the remaining table traffic.

No reference counterpart (the reference serves full dense score rows,
openrec/tf1/fast_dot_product_server.py:132-141); this is the TPU-native
serving accelerator for its biggest catalogs (tradesy 165,906 / amazon
450,166 items, tf1_examples/dataloader.py).

Correctness: tests/test_ops.py (interpret mode vs numpy/XLA oracles).
Measured compiled on real TPU: benchmarks/pallas_topk.py ->
benchmarks/pallas_topk.json, numbers in docs/PERF_NOTES.md.
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

_LANES = 128                     # TPU lane width = output-tile last dim
_MAX_VBLOCK_BYTES = 6 << 20      # keep the streamed table block + its
                                 # pipeline double-buffer well inside
                                 # ~16MB/core VMEM


def _round_up(x, m):
    return -(-x // m) * m


def _bucket_max_kernel(u_ref, v_ref, b_ref, vals_ref, ids_ref, *,
                       chunk, n_chunks, acc_dtype, reduction="chain"):
    """One (user block, item block) grid cell.

    The item block holds `n_chunks * chunk` consecutive items. Each chunk
    is scored on the MXU as [UB, chunk], then folded 128 lanes at a time
    into the running per-lane (max, row-code) accumulator. Strict `>`
    keeps the earliest item index on ties (reference argmax convention).

    VPU economy (this loop, not HBM, is the kernel's bound): the select
    chain tracks a SCALAR per-iteration row code instead of a
    materialized id tile, so the hot loop is cmp + 2 selects per 128
    items; global ids are reconstructed once per cell at the end.
    (Folding the bias into the matmul via an augmented D+1 dim was tried
    and measured SLOWER — 1.0→1.4-2.0ms at tradesy — the off-tile last
    dimension costs more in layout/DMA than the saved VPU add.)

    reduction='tree' (DEFAULT since r3): same number of compare/select
    ops, but pairs are folded in a binary tree whose dependency chain is
    log2 of the chain's — aimed at the VPU-latency bound. Within each
    level the lower half holds strictly smaller item indices, so strict
    `>` (keep lower on ties) preserves the earliest-index-wins
    convention. Measured (benchmarks/pallas_topk.json, r3 A/B in one
    run): with item_tile=4096 the tree is 14% faster than the chain at
    amazon scale (1.35 vs 1.57 ms/batch bf16) and ~3% at tradesy —
    wider MXU chunks widen the trees and cut sequential folds.
    """
    j = pl.program_id(1)
    ub = u_ref.shape[0]
    item_block = chunk * n_chunks
    lane = jax.lax.broadcasted_iota(jnp.int32, (ub, _LANES), 1)
    acc_v = jnp.full((ub, _LANES), -jnp.inf, acc_dtype)
    acc_c = jnp.zeros((ub, _LANES), jnp.int32)   # row code = c*(chunk/128)+a
    n_sub = chunk // _LANES
    for c in range(n_chunks):
        v_c = v_ref[c * chunk:(c + 1) * chunk, :]
        s = jax.lax.dot_general(
            u_ref[:], v_c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype,
        ) + b_ref[:, c * chunk:(c + 1) * chunk].astype(acc_dtype)
        if reduction == "tree" and n_sub > 1:
            # Adjacent pairing keeps every left subtree's index range
            # strictly below its right sibling's, so strict `>` (keep
            # left on ties) preserves earliest-index-wins at every level.
            vals = [s[:, a * _LANES:(a + 1) * _LANES]
                    for a in range(n_sub)]
            codes = list(range(n_sub))      # int ⇒ scalar code
            while len(vals) > 1:
                nv, nc = [], []
                for p in range(0, len(vals) - 1, 2):
                    a_v, b_v = vals[p], vals[p + 1]
                    upd = b_v > a_v
                    nv.append(jnp.where(upd, b_v, a_v))
                    nc.append(jnp.where(upd, codes[p + 1], codes[p]))
                if len(vals) % 2:
                    nv.append(vals[-1])
                    nc.append(codes[-1])
                vals, codes = nv, nc
            blk, code = vals[0], codes[0]
            upd = blk > acc_v
            acc_v = jnp.where(upd, blk, acc_v)
            acc_c = jnp.where(upd, c * n_sub + code, acc_c)
        else:
            for a in range(n_sub):
                blk = s[:, a * _LANES:(a + 1) * _LANES]
                upd = blk > acc_v
                acc_v = jnp.where(upd, blk, acc_v)
                acc_c = jnp.where(upd, c * n_sub + a, acc_c)
    vals_ref[:] = acc_v
    # code 0 ⇒ the bucket's first member, so even an all-padding bucket
    # reports a valid member id (numpy argmax-of-equals convention)
    ids_ref[:] = j * item_block + acc_c * _LANES + lane


def _bucket_max2_kernel(u_ref, v_ref, b_ref, vals1_ref, ids1_ref,
                        vals2_ref, ids2_ref, *, chunk, n_chunks,
                        acc_dtype):
    """Two-level variant (VERDICT r3 #6): per bucket keep the TOP-2
    (value, row-code) pairs, so a true top-k item is lost only when
    THREE top-k items share a bucket — the collision loss is squared
    (P_miss ≈ C(k-1,2)/L² vs (k-1)/2L), letting 0.995+ recall ride much
    larger buckets.

    Merge rule for two (first, second) pairs a, b (a1>=a2, b1>=b2):
      first  = max(a1, b1)
      second = max(min(a1, b1), a2, b2)   # b2<=b1 makes this exact
    ~3x the VPU select work of the top-1 kernel per fold; measured
    numbers in benchmarks/pallas_topk.json (two_level entries).
    Ties: strict `>` everywhere — the FIRST slot keeps the earliest
    index (argmax convention); the second slot's tie order among exact
    score ties is unspecified (scores themselves stay exact).
    """
    j = pl.program_id(1)
    ub = u_ref.shape[0]
    item_block = chunk * n_chunks
    lane = jax.lax.broadcasted_iota(jnp.int32, (ub, _LANES), 1)
    neg = jnp.full((ub, _LANES), -jnp.inf, acc_dtype)
    zero = jnp.zeros((ub, _LANES), jnp.int32)
    acc = (neg, zero, neg, zero)          # v1, c1, v2, c2
    n_sub = chunk // _LANES

    def merge(a, b):
        a1v, a1c, a2v, a2c = a
        b1v, b1c, b2v, b2c = b
        take_b = b1v > a1v
        v1 = jnp.where(take_b, b1v, a1v)
        c1 = jnp.where(take_b, b1c, a1c)
        lose_v = jnp.where(take_b, a1v, b1v)
        lose_c = jnp.where(take_b, a1c, b1c)
        s_v = jnp.where(b2v > a2v, b2v, a2v)
        s_c = jnp.where(b2v > a2v, b2c, a2c)
        take_l = lose_v > s_v
        v2 = jnp.where(take_l, lose_v, s_v)
        c2 = jnp.where(take_l, lose_c, s_c)
        return v1, c1, v2, c2

    for c in range(n_chunks):
        v_c = v_ref[c * chunk:(c + 1) * chunk, :]
        s = jax.lax.dot_general(
            u_ref[:], v_c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype,
        ) + b_ref[:, c * chunk:(c + 1) * chunk].astype(acc_dtype)
        # binary tree over the n_sub lane blocks, top-2 state per node
        nodes = [(s[:, a * _LANES:(a + 1) * _LANES],
                  c * n_sub + a, neg, zero) for a in range(n_sub)]
        while len(nodes) > 1:
            nxt = []
            for p in range(0, len(nodes) - 1, 2):
                nxt.append(merge(nodes[p], nodes[p + 1]))
            if len(nodes) % 2:
                nxt.append(nodes[-1])
            nodes = nxt
        acc = merge(acc, nodes[0])

    v1, c1, v2, c2 = acc
    vals1_ref[:] = v1
    ids1_ref[:] = j * item_block + c1 * _LANES + lane
    vals2_ref[:] = v2
    ids2_ref[:] = j * item_block + c2 * _LANES + lane


def _bucket_call_setup(user_vecs, item_table, item_bias, bucket,
                       item_tile, user_block):
    """Shared geometry + padding for the bucket kernels: returns
    (padded u/v/b, chunk, n_chunks, item_block, grid, in_specs, B_pad,
    L, final bucket). Single source of truth for the VMEM shrink rule,
    the -1e30 padding-bias sentinel, and the block specs."""
    B, D = user_vecs.shape
    I = item_table.shape[0]
    itemsize = jnp.dtype(item_table.dtype).itemsize
    # Items per grid step. Shrink (= lower reduction ratio, strictly
    # better recall) until the streamed table block fits the VMEM budget.
    while bucket > 1 and bucket * _LANES * D * itemsize > _MAX_VBLOCK_BYTES:
        bucket //= 2
    item_block = bucket * _LANES
    chunk = max(_LANES, min(_round_up(item_tile, _LANES), item_block))
    while item_block % chunk:
        chunk -= _LANES
    n_chunks = item_block // chunk

    I_pad = _round_up(I, item_block)
    UB = min(user_block, _round_up(B, 8))
    B_pad = _round_up(B, UB)
    L = I_pad // bucket

    u = jnp.zeros((B_pad, D), user_vecs.dtype).at[:B].set(user_vecs)
    v = jnp.zeros((I_pad, D), item_table.dtype).at[:I].set(item_table)
    b = jnp.full((1, I_pad), -1e30, jnp.float32)
    if item_bias is not None:
        b = b.at[0, :I].set(jnp.reshape(item_bias, (-1,)).astype(
            jnp.float32))
    else:
        b = b.at[0, :I].set(0.0)

    grid = (B_pad // UB, I_pad // item_block)
    in_specs = [
        pl.BlockSpec((UB, D), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((item_block, D), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, item_block), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((UB, _LANES), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    return (u, v, b, chunk, n_chunks, grid, in_specs, out_spec, UB,
            B_pad, L, bucket)


def _bucket_compiler_params(interpret):
    # Every (i, j) cell writes its own output block — no cross-cell
    # dependency. The default 16MB scoped-vmem budget is ~0.5MB short
    # of this kernel's working set at the default tile sizes; v5e has
    # 128MB physical VMEM, so give Mosaic real headroom.
    if not _HAS_PALLAS or interpret:
        return None
    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel"),
        vmem_limit_bytes=64 << 20)


def bucket_max2_scores(user_vecs, item_table, item_bias,
                       bucket: int = 256, item_tile: int = 4096,
                       user_block: int = 256, interpret: bool = False):
    """Two-level bucket reduction: [B, L] (top1 vals, top1 ids,
    top2 vals, top2 ids); same strided bucket layout as
    bucket_max_scores."""
    B = user_vecs.shape[0]
    (u, v, b, chunk, n_chunks, grid, in_specs, out_spec, _UB, B_pad, L,
     bucket) = _bucket_call_setup(user_vecs, item_table, item_bias,
                                  bucket, item_tile, user_block)
    kernel = functools.partial(_bucket_max2_kernel, chunk=chunk,
                               n_chunks=n_chunks, acc_dtype=jnp.float32)
    v1, i1, v2, i2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((B_pad, L), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, L), jnp.int32),
            jax.ShapeDtypeStruct((B_pad, L), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, L), jnp.int32),
        ],
        compiler_params=_bucket_compiler_params(interpret),
        interpret=interpret,
    )(u, v, b)
    return v1[:B], i1[:B], v2[:B], i2[:B]


def bucket_max_scores(user_vecs, item_table, item_bias,
                      bucket: int = 128, item_tile: int = 4096,
                      user_block: int = 256, interpret: bool = False,
                      reduction: str = "tree"):
    """[B, L] (bucket-max scores, argmax item ids) of u.V^T + b,
    L = I_pad/bucket, computed in one fused pass (never materializing
    [B, I]).

    user_vecs [B, D]; item_table [I, D]; item_bias [I] or [I, 1] or None.
    `bucket` = reduction ratio (items per bucket); `item_tile` = MXU chunk
    size per in-kernel dot (multiple of 128). Bucket membership is
    strided (see module docstring): item t belongs to bucket
    `(t // (128*bucket)) * 128 + t % 128`.

    Rows past I get a -1e30 bias so they never win (finite → NaN-free
    with padded zero user rows). The dot accumulates in fp32 regardless
    of table dtype (bf16 tables halve the table HBM traffic).
    """
    B = user_vecs.shape[0]
    (u, v, b, chunk, n_chunks, grid, in_specs, out_spec, _UB, B_pad, L,
     bucket) = _bucket_call_setup(user_vecs, item_table, item_bias,
                                  bucket, item_tile, user_block)
    kernel = functools.partial(_bucket_max_kernel, chunk=chunk,
                               n_chunks=n_chunks, acc_dtype=jnp.float32,
                               reduction=reduction)
    vals, ids = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((B_pad, L), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, L), jnp.int32),
        ],
        compiler_params=_bucket_compiler_params(interpret),
        interpret=interpret,
    )(u, v, b)
    return vals[:B], ids[:B]


def pallas_score_topk(user_vecs, item_table, item_bias, k: int,
                      bucket: int = 128, item_tile: int = 4096,
                      user_block: int = 256, interpret: bool = False,
                      recall_target: float | None = None,
                      reduction: str = "tree",
                      per_bucket: int = 1):
    """(top_vals, top_ids): fused Pallas bucket-max pass + exact top-k
    over the [B, L] maxima. Same guarantee as `lax.approx_max_k` at
    reduction ratio `bucket`: every returned score/id exact; recall < 1
    only from top-k collisions within a bucket.

    recall_target: if given, the `bucket` argument is IGNORED ENTIRELY —
    the ratio becomes the largest power of two whose expected recall
    (1 - (k-1)/(2L), the birthday bound for k uniform winners over L
    buckets) meets the target, which can be far LARGER than the `bucket`
    a caller passed as a VMEM/latency bound (the r4 min()-cap behavior
    was removed — it silently held the two-level kernel at the top-1
    default ratio). To bound the ratio yourself, pass
    recall_target=None and size `bucket` directly; the internal VMEM
    shrink in bucket_max*_scores still applies either way.

    per_bucket=2 switches to the two-level kernel (top-2 kept per
    bucket): recall loss needs THREE top-k items in one bucket, so the
    sizing law becomes L >= sqrt(C(k-1,2)/(1-target)) — far larger
    buckets at high recall floors (0.995+), at ~3x the in-kernel VPU
    select work. The final exact top-k runs over the concatenated
    [B, 2L] candidates."""
    I = item_table.shape[0]
    assert k <= I, (k, I)
    assert per_bucket in (1, 2), per_bucket
    if recall_target is not None and k > 1:
        if per_bucket == 2:
            import math
            pairs = (k - 1) * (k - 2) / 2.0
            l_min = math.sqrt(pairs / max(1e-6, 1.0 - recall_target)) \
                if pairs > 0 else 1.0
        else:
            l_min = (k - 1) / (2.0 * max(1e-6, 1.0 - recall_target))
        # recall_target OVERRIDES the bucket argument entirely (r4: the
        # old min(bucket, computed) silently capped the two-level kernel
        # at the top-1 default ratio, costing it 2.2x at amazon/0.995);
        # bucket_max*_scores still shrinks oversized ratios to VMEM.
        bucket = max(1, int(I / max(l_min, 1.0)))
        while bucket & (bucket - 1):          # round down to power of two
            bucket &= bucket - 1
    # Need at least k NON-EMPTY buckets, else top_k over the [B, L]
    # maxima returns padding lanes (ids >= I at -1e30) — counting the
    # padded L = 128*ceil(I/(128*bucket)) is not enough when the tail
    # block is short (e.g. I=16500, k=250, bucket=128: L=256 but only
    # 244 buckets hold a real item). With n = ceil(I/item_block) grid
    # blocks, the first n-1 are fully populated (128 lanes each) and the
    # tail block populates min(I - (n-1)*item_block, 128) lanes. Shrink
    # the ratio (power of two) until the real count meets k; at bucket=1
    # the count equals I >= k (asserted above), so this terminates.
    # bucket_max_scores' internal VMEM shrink only lowers the ratio
    # further, which only increases the non-empty count — safe.
    def _nonempty_buckets(ratio):
        blk = _LANES * ratio
        n = -(-I // blk)
        return _LANES * (n - 1) + min(I - (n - 1) * blk, _LANES)

    # (per_bucket=2 could count 2 candidates per bucket, but a bucket
    # holding a single real item fills its second slot with -1e30
    # padding — require k first slots to stay safe for any layout)
    while bucket > 1 and _nonempty_buckets(bucket) < k:
        bucket //= 2
    if per_bucket == 2:
        v1, i1, v2, i2 = bucket_max2_scores(
            user_vecs, item_table, item_bias, bucket=bucket,
            item_tile=item_tile, user_block=user_block,
            interpret=interpret)
        vals = jnp.concatenate([v1, v2], axis=1)
        ids = jnp.concatenate([i1, i2], axis=1)
    else:
        vals, ids = bucket_max_scores(user_vecs, item_table, item_bias,
                                      bucket=bucket, item_tile=item_tile,
                                      user_block=user_block,
                                      interpret=interpret,
                                      reduction=reduction)
    top_vals, pos = jax.lax.top_k(vals, k)
    return top_vals, jnp.take_along_axis(ids, pos, axis=1)
