"""Full-catalog score + top-k retrieval.

`topk_approx` is the production path for big catalogs: exact `lax.top_k`
is sort-bound on TPU (measured 14.3ms per 256-user batch at tradesy
scale, 165,906 items), while `lax.approx_max_k` lowers to the TPU
PartialReduce op at ~10× that speed (1.37ms) with recall ≥ 0.995 and
every returned (score, id) exact — see benchmarks/retrieval_dtype.py and
docs/PERF_NOTES.md. `topk_xla` is the exact-ranking path (eval parity).

`fused_score_topk` is a Pallas study kernel that streams the catalog
through VMEM in tiles with a running top-k per user block (never
materializing [B, I]). Mosaic cannot currently lower `lax.top_k` inside a
TPU kernel, so on TPU it is only runnable in interpret mode. The
COMPILED production kernel that achieves the same fusion without an
in-kernel sort is `ops/bucketed_topk.pallas_score_topk` (strided
bucket-max; 1.4-1.5× approx_max_k on real TPU — docs/PERF_NOTES.md).
Production retrieval: `pallas_score_topk` or `topk_approx` for big
catalogs, `topk_xla` for exact ranking / eval parity; row-sharded
catalogs use parallel/embedding.py's `sharded_topk` /
`sharded_pallas_topk`.
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


def topk_xla(user_vecs, item_table, item_bias, k):
    scores = user_vecs @ item_table.T + jnp.reshape(item_bias, (-1,))
    return jax.lax.top_k(scores, k)


def topk_approx(user_vecs, item_table, item_bias, k,
                recall_target: float = 0.99):
    """Fused score + approximate top-k via the TPU PartialReduce op
    (`lax.approx_max_k`). Measured (v5e, 256×165,906×64, k=100):
    0.033ms vs 0.224ms for exact `lax.top_k` — ~7× — at 0.996 observed
    recall with recall_target=0.99 (docs/PERF_NOTES.md). The returned ids
    are exact for every hit; only near-tie tail items can be swapped."""
    scores = user_vecs @ item_table.T + jnp.reshape(item_bias, (-1,))
    return jax.lax.approx_max_k(scores, k, recall_target=recall_target)


def _round_up(x, m):
    return -(-x // m) * m


def _fused_topk_kernel(u_ref, v_ref, b_ref, vals_ref, idx_ref, *,
                       k_pad, item_tile, num_items):
    """One user block: stream item tiles, keep a running top-k_pad."""
    B = u_ref.shape[0]
    num_tiles = num_items // item_tile

    def body(t, carry):
        best_v, best_i = carry
        v_tile = v_ref[pl.ds(t * item_tile, item_tile), :]
        b_tile = b_ref[pl.ds(t * item_tile, item_tile), :]
        scores = jnp.dot(u_ref[:], v_tile.T,
                         preferred_element_type=jnp.float32) \
            + b_tile[:, 0][None, :]
        ids = (t * item_tile
               + jax.lax.broadcasted_iota(jnp.int32, (B, item_tile), 1))
        # merge candidates with running best, re-select top k_pad
        cat_v = jnp.concatenate([best_v, scores], axis=1)
        cat_i = jnp.concatenate([best_i, ids], axis=1)
        new_v, pos = jax.lax.top_k(cat_v, k_pad)
        new_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return new_v, new_i

    init_v = jnp.full((B, k_pad), -jnp.inf, jnp.float32)
    init_i = jnp.zeros((B, k_pad), jnp.int32)
    best_v, best_i = jax.lax.fori_loop(0, num_tiles, body,
                                       (init_v, init_i))
    vals_ref[:] = best_v
    idx_ref[:] = best_i


def fused_score_topk(user_vecs, item_table, item_bias, k,
                     user_block: int = 128, item_tile: int = 2048,
                     interpret: bool = False):
    """(top_vals, top_ids) of u·Vᵀ+b without materializing [B, I].

    Shapes: user_vecs [B, D]; item_table [I, D]; item_bias [I] or [I, 1].
    B, I are padded internally; ids beyond I never win (scores -inf via
    bias padding). NOTE: compiled TPU execution currently requires the
    in-kernel top_k primitive Mosaic doesn't provide — use interpret=True
    or `topk_xla` (see module docstring).
    """
    if not _HAS_PALLAS:
        return topk_xla(user_vecs, item_table, item_bias, k)

    B, D = user_vecs.shape
    I = item_table.shape[0]
    k_pad = max(128, _round_up(k, 128))
    item_tile = min(item_tile, _round_up(I, 128))
    I_pad = _round_up(I, item_tile)
    B_pad = _round_up(B, min(user_block, _round_up(B, 8)))
    user_block = min(user_block, B_pad)

    u = jnp.zeros((B_pad, D), user_vecs.dtype).at[:B].set(user_vecs)
    v = jnp.zeros((I_pad, D), item_table.dtype).at[:I].set(item_table)
    b = jnp.full((I_pad, 1), -jnp.inf, jnp.float32).at[:I, 0].set(
        jnp.reshape(item_bias, (-1,)))

    kernel = functools.partial(_fused_topk_kernel, k_pad=k_pad,
                               item_tile=item_tile, num_items=I_pad)
    grid = (B_pad // user_block,)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((user_block, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((I_pad, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((I_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((user_block, k_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((user_block, k_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, k_pad), jnp.int32),
        ],
        interpret=interpret,
    )(u, v, b)
    return vals[:B, :k], idx[:B, :k]
