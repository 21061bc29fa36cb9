"""O(batch) sparse embedding training — gather → step → scatter.

Motivation (SURVEY.md §7 "rows-touched sparse optimizer"): even lazy_adam
touches every row of every table each step (where-masked full-table ops),
so per-step HBM traffic scales with |catalog|. For production-size tables
(Criteo's 10M-row tables, Amazon's 450k items) the right cost is O(batch):

  1. unique-ify the batch's ids per table (padded to a static cap),
  2. gather those rows (+ their optimizer moments),
  3. run the model's loss with the table leaf REPLACED by a `SubTable`
     view — `embedding_lookup` remaps ids to positions inside the gathered
     rows, so autodiff never materializes a [V, D] gradient,
  4. Adam/Adagrad on the gathered rows only,
  5. scatter rows (+ moments) back with donated buffers (in-place
     dynamic-update-scatter).

Everything is static-shaped (unique via sort + mask padding) — one XLA
program, no recompiles.

Measurement/operational rule (docs/PERF_NOTES.md "donation poisoning"):
on the axon TPU backend, any device->host fetch (float(loss),
np.asarray of a prediction) permanently disables the donated in-place
scatter for all later steps in the process — the step then copies
params+moments every call (0.6 -> 63 ms/step at Criteo scale). In
training loops built on this step, compute interval metrics ON DEVICE
and fetch once after the timed region (see
benchmarks/dlrm_training_run.py); block_until_ready is safe.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


@jax.tree_util.register_pytree_node_class
class SubTable:
    """A gathered view of an embedding table.

    Duck-types the array for `embedding_lookup`: indexing by original ids
    resolves inside the gathered rows via binary search over the sorted
    unique ids. Ids not in the view (shouldn't happen for the step's own
    batch) clamp to some row — same contract as lookup's clip mode.
    """

    def __init__(self, uids_sorted, rows):
        self.uids_sorted = uids_sorted    # [K] int32, sorted (with pad)
        self.rows = rows                  # [K, D]

    @property
    def shape(self):
        return self.rows.shape

    @property
    def dtype(self):
        return self.rows.dtype

    def lookup(self, ids):
        pos = jnp.searchsorted(self.uids_sorted, ids)
        pos = jnp.clip(pos, 0, self.rows.shape[0] - 1)
        return jnp.take(self.rows, pos, axis=0)

    @property
    def T(self):
        raise TypeError(
            "full-table ops are not available on a SubTable view; "
            "score() must use the full table (run it outside "
            "sparse_train_step)")

    def tree_flatten(self):
        return (self.uids_sorted, self.rows), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _compact_sorted(sorted_ids, cap: int):
    """(uids, valid) from PRE-SORTED ids: first-occurrence positions are
    scattered to the front of a [cap] buffer initialized with the max id
    (= the last unique), so pads alias a real id and the result stays
    sorted — one cumsum + one O(n) scatter, no argsort/re-sort."""
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]])
    k = jnp.minimum(jnp.sum(is_first), cap)
    # non-first entries (and uniques past cap) scatter out of bounds ->
    # dropped
    pos = jnp.where(is_first, jnp.cumsum(is_first) - 1, cap)
    uids = jnp.full((cap,), sorted_ids[-1], sorted_ids.dtype).at[pos].set(
        sorted_ids, mode="drop")
    valid = jnp.arange(cap) < k
    return uids, valid


def unique_padded(ids, cap: int):
    """(uids, valid): sorted unique ids padded to length cap by repeating
    the last unique id, plus a mask marking real (non-pad) entries.

    Lookups always resolve to the FIRST matching position (searchsorted),
    so pad duplicates never receive gradients; scatters must mask their
    contribution with `valid` (pads alias a real id — an unmasked
    scatter-add would double-apply to that row).
    """
    ids = jnp.reshape(ids, (-1,))
    return _compact_sorted(jnp.sort(ids), cap)


class Columns:
    """Explicit opt-in wrapper for the per-column dedup path: wrap a
    [B, T] id matrix whose columns index DISJOINT, increasing id ranges
    (the `unique_padded_columns` contract). A spec returning a bare 2-D
    array is flattened through the ordinary flat-sort dedup — ndim alone
    never selects the columns path, because a user's [B, 2] stacked
    pos/neg ids (same id range in both columns) would silently violate
    the global-sortedness SubTable.searchsorted requires."""

    def __init__(self, ids_bt):
        self.ids_bt = ids_bt


def unique_padded_columns(ids_bt):
    """Per-column unique for [B, T] ids whose columns index DISJOINT,
    increasing id ranges (e.g. per-table offset ids: column t covers
    [offset_t, offset_t + rows_t), offsets increasing).

    Returns (uids [T*B], valid [T*B]) — per-column sorted uniques (cap B
    each, pads alias that column's max id) concatenated in column order,
    which the disjoint-increasing-ranges contract makes GLOBALLY sorted,
    as SubTable.searchsorted requires.

    Why: one flat sort of B*T ids is the dominant cost of the sparse
    step's dedup at DLRM scale (batch 4096 x 26 tables = 106k ids); T
    batched B-element sorts are far cheaper on the VPU (lane-parallel)
    — see benchmarks/dlrm_sparse_roofline.py 'colu' variants.
    """
    cols = ids_bt.T                           # [T, B]
    B = cols.shape[1]
    sorted_cols = jnp.sort(cols, axis=1)
    uids, valid = jax.vmap(lambda s: _compact_sorted(s, B))(sorted_cols)
    return jnp.reshape(uids, (-1,)), jnp.reshape(valid, (-1,))


class ColumnIds:
    """[B, T] offset-id matrix plus static per-table (counts, offsets):
    returned by a spec extractor to opt the sparse step into the MIXED
    static/dedup scheme (`unique_padded_mixed`). counts/offsets must be
    python ints (they size static segments at trace time); columns must
    cover disjoint, increasing id ranges."""

    def __init__(self, ids_bt, counts, offsets):
        self.ids_bt = ids_bt
        self.counts = tuple(int(c) for c in counts)
        self.offsets = tuple(int(o) for o in offsets)


def unique_padded_mixed(col_ids: ColumnIds):
    """(uids, valid) for ColumnIds — the observation: a table with
    count <= B rows never has more uniques than its OWN row count, so
    its 'unique set' can be the full static range [offset, offset+count)
    with NO sort at all; `valid` is then the touched-this-batch mask
    (one O(B) scatter), which preserves exact lazy semantics — untouched
    rows contribute zero to params AND moments, identically to the flat
    path where they are simply absent. Only big tables (count > B) pay
    a per-column sort-dedup. Segments concatenate in offset order, so
    the result is globally sorted (disjoint increasing ranges), as
    SubTable.searchsorted requires.

    At the Criteo-Kaggle config (batch 4096, 26 tables, 15 of them with
    count <= 4096) this cuts the dedup sort from 106k to ~45k ids AND
    the gathered/updated rowset from 106k to ~64k rows."""
    ids_bt = col_ids.ids_bt
    B = ids_bt.shape[0]
    segs_u, segs_v = [], []
    for t, (c, o) in enumerate(zip(col_ids.counts, col_ids.offsets)):
        if c <= B:
            segs_u.append(jnp.arange(o, o + c, dtype=ids_bt.dtype))
            # Clamp contract-violating ids below the offset to c (out of
            # bounds -> dropped): mode="drop" alone only drops indices
            # PAST the end; a negative index would wrap numpy-style and
            # mark the wrong row as touched.
            idx = ids_bt[:, t] - o
            idx = jnp.where(idx >= 0, idx, c)
            segs_v.append(jnp.zeros((c,), bool)
                          .at[idx].set(True, mode="drop"))
        else:
            u, v = unique_padded(ids_bt[:, t], B)
            segs_u.append(u)
            segs_v.append(v)
    return jnp.concatenate(segs_u), jnp.concatenate(segs_v)


_HASH_EMPTY = np.int32(2 ** 31 - 1)


class Hashed:
    """Explicit opt-in wrapper for the SORT-FREE hash-slot dedup path:
    wrap the flat id array and the sparse step dedups it by parallel
    insertion into a 2×-cap power-of-two slot table (double-hash probe)
    instead of the flat sort — `unique_hashed`. Lookups inside the loss
    resolve by re-probing the slot table (`HashSubTable`), so no sorted
    order is ever needed.

    Trade-off vs flat sort (the r4 roofline: the 106k-id sort is ~0.3ms
    of the 0.5ms Criteo step): removes the sort entirely, but the
    gathered rowset grows from cap to S = 2^ceil(log2(2·cap)) slots
    (~2.5× the HBM floor at Criteo-Kaggle batch 4096). Measured A/B in
    benchmarks/dlrm_sparse_roofline.py (`sparse_ab`).

    Contract: ids are non-negative int32 < 2^31-1 (the empty sentinel).

    rounds / lookup_unroll: unrolled probe rounds for insertion and for
    the in-loss lookup (stragglers always finish under a while_loop, so
    these are perf knobs, not correctness ones).
    """

    def __init__(self, ids, rounds: int = 8, lookup_unroll: int = 8):
        self.ids = ids
        self.rounds = int(rounds)
        self.lookup_unroll = int(lookup_unroll)


def _hash_probe(ids_i32, S: int):
    """(h0, stride) for double hashing into a power-of-two table: two
    multiplicative (Knuth/Fibonacci) hashes; stride forced odd so the
    probe sequence (h0 + r·stride) mod S visits every slot exactly once
    over r = 0..S-1 (odd stride is coprime with S = 2^k)."""
    shift = jnp.uint32(32 - (int(S).bit_length() - 1))
    u = ids_i32.astype(jnp.uint32)
    h0 = (u * jnp.uint32(2654435761)) >> shift
    stride = ((u * jnp.uint32(2246822519)) >> shift) | jnp.uint32(1)
    return h0, stride


def unique_hashed(ids, rounds: int = 8):
    """(uids [S], valid [S]) by parallel hash-slot insertion — no sort.

    S = smallest power of two ≥ 2·len(ids) (load factor ≤ 0.5 even if
    every id is unique). Each round, every not-yet-landed id scatter-mins
    itself into its next probe slot ONLY if that slot was empty at the
    round start — settled ids are never evicted (occupancy is monotone),
    so termination is guaranteed: an alive id's probe sequence visits all
    S slots and at most S/2 are ever occupied. `rounds` unrolled rounds
    run inline (typical batches settle in ≤ 4); rare stragglers finish
    under a `lax.while_loop` (dynamic trip count, int-only carry).

    Returned uids hold the ids in SLOT ORDER (not sorted); empty slots
    hold the sentinel 2^31-1, which is out of bounds for any real table —
    gather them with mode='clip' and scatter with mode='drop' (pads then
    cost nothing; there is no aliased-pad masking subtlety). `valid`
    marks occupied slots. Duplicate ids all resolve to one slot, so
    gradient accumulation order matches the sorted paths' (operand
    order), keeping trajectories bit-identical with flat/mixed dedup
    (tests/test_sparse_step.py)."""
    flat = jnp.reshape(ids, (-1,)).astype(jnp.int32)
    n = int(flat.shape[0])
    S = 1 << (2 * n - 1).bit_length()
    h0, stride = _hash_probe(flat, S)
    mask = jnp.uint32(S - 1)
    EMPTY = jnp.int32(_HASH_EMPTY)

    def round_fn(r, slots, landed):
        pos = ((h0 + r.astype(jnp.uint32) * stride) & mask) \
            .astype(jnp.int32)
        cur = jnp.take(slots, pos, mode="clip")
        landed = landed | (cur == flat)
        cand = jnp.where(~landed & (cur == EMPTY), flat, EMPTY)
        slots = slots.at[pos].min(cand, mode="drop")
        landed = landed | (jnp.take(slots, pos, mode="clip") == flat)
        return slots, landed

    slots = jnp.full((S,), EMPTY, jnp.int32)
    landed = jnp.zeros((n,), bool)
    unrolled = min(max(rounds, 0), S)
    for r in range(unrolled):
        slots, landed = round_fn(jnp.uint32(r), slots, landed)

    def cond(c):
        r, _, landed = c
        return jnp.logical_and(~jnp.all(landed), r < S)

    def body(c):
        r, slots, landed = c
        slots, landed = round_fn(r, slots, landed)
        return r + 1, slots, landed

    _, slots, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(unrolled), slots, landed))
    return slots, slots != EMPTY


def hash_positions(slot_ids, ids, unroll: int = 8):
    """Slot position of each id in a `unique_hashed` table, by retracing
    the same probe sequence. Every looked-up id must be present (the
    sparse step only looks up the batch the table was built from);
    integer-only ops, so autodiff through the caller's gather is
    untouched. Stragglers past `unroll` rounds finish under a bounded
    while_loop (int carries — no reverse-mode obstruction)."""
    S = int(slot_ids.shape[0])
    idsi = jnp.asarray(ids).astype(jnp.int32)
    h0, stride = _hash_probe(idsi, S)
    mask = jnp.uint32(S - 1)
    pos = (h0 & mask).astype(jnp.int32)
    found = jnp.take(slot_ids, pos, mode="clip") == idsi
    for r in range(1, min(max(unroll, 1), S)):
        cand = ((h0 + jnp.uint32(r) * stride) & mask).astype(jnp.int32)
        pos = jnp.where(found, pos, cand)
        found = found | (jnp.take(slot_ids, pos, mode="clip") == idsi)

    def cond(c):
        r, _, found = c
        return jnp.logical_and(~jnp.all(found), r < S)

    def body(c):
        r, pos, found = c
        cand = ((h0 + r.astype(jnp.uint32) * stride) & mask) \
            .astype(jnp.int32)
        pos = jnp.where(found, pos, cand)
        found = found | (jnp.take(slot_ids, pos, mode="clip") == idsi)
        return r + 1, pos, found

    _, pos, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(min(max(unroll, 1), S)), pos, found))
    return pos


@jax.tree_util.register_pytree_node_class
class HashSubTable:
    """A gathered view keyed by a `unique_hashed` slot table (the
    sort-free sibling of `SubTable`): lookup re-probes the slot table
    instead of binary-searching sorted uids."""

    def __init__(self, slot_ids, rows, unroll: int = 8):
        self.slot_ids = slot_ids          # [S] int32, EMPTY-sentinel pads
        self.rows = rows                  # [S, D]
        self.unroll = int(unroll)

    @property
    def shape(self):
        return self.rows.shape

    @property
    def dtype(self):
        return self.rows.dtype

    def lookup(self, ids):
        pos = hash_positions(self.slot_ids, ids, unroll=self.unroll)
        return jnp.take(self.rows, pos, axis=0, mode="clip")

    @property
    def T(self):
        raise TypeError(
            "full-table ops are not available on a HashSubTable view; "
            "score() must use the full table (run it outside "
            "sparse_train_step)")

    def tree_flatten(self):
        return (self.slot_ids, self.rows), self.unroll

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, unroll=aux)


class SparseAdamState(NamedTuple):
    count: jnp.ndarray
    mu: dict
    nu: dict


def _path_of(key):
    return key if isinstance(key, tuple) else (key,)


def _get_path(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set_path(tree, path, value):
    """Functionally set tree[path...] = value (dicts/lists copied along
    the path)."""
    if not path:
        return value
    head, rest = path[0], path[1:]
    if isinstance(tree, dict):
        out = dict(tree)
        out[head] = _set_path(tree[head], rest, value)
        return out
    out = list(tree)
    out[head] = _set_path(tree[head], rest, value)
    return out


def _extractor(spec):
    if callable(spec):
        return spec
    keys = list(spec)
    return lambda batch: jnp.concatenate(
        [jnp.reshape(batch[k], (-1,)) for k in keys])


def dlrm_table_specs(num_tables: int):
    """Specs for models/dlrm.py: table i is indexed by
    batch['sparse_features'][:, i]."""
    return {("embed_tables", i):
            (lambda batch, i=i: batch["sparse_features"][:, i])
            for i in range(num_tables)}


def dlrm_fused_table_spec(model, columnwise: bool = False,
                          mode: str = None):
    """Spec for DLRM(fused_tables=True): one table, offset ids.

    mode (or legacy columnwise=True for 'columns'):
      None/'flat'  — one flat B*T-id sort-dedup (default).
      'columns'    — [B, T] matrix: per-column dedup (T batched
                     B-element sorts). MEASURED SLOWER standalone at
                     Criteo scale (0.51 vs 0.41 ms sparse-only,
                     benchmarks/dlrm_sparse_roofline.json r3 — batched
                     small sorts + vmapped scatter don't beat XLA's one
                     flat sort); kept for other shapes.
      'mixed'      — ColumnIds: tables with count <= batch contribute
                     their full static row range (no sort, touched mask
                     only); big tables dedup per column. Cuts both the
                     sort width and the gathered rowset (~40% at
                     Criteo-Kaggle batch 4096); exact lazy semantics
                     preserved (bit-identical trajectories,
                     tests/test_sparse_step.py).
      'hash'       — Hashed: SORT-FREE dedup by parallel insertion into
                     a 2×-cap hash-slot table (`unique_hashed`); lookups
                     re-probe (`HashSubTable`). Same exact lazy
                     semantics / bit-identical trajectories — but a
                     MEASURED NEGATIVE on this environment's backend
                     (PERF_NOTES r5): fetch-synced full-step cost is
                     137-1039 ms/step across runs vs flat's stable
                     60-64 (the dynamic while_loop probe continuations
                     serialize at run-varying costs). A design study,
                     not a production path here. 'hashR' (e.g.
                     'hash4') sets both probe-round knobs to R.

    Per-table offset ranges are disjoint and increasing by construction,
    satisfying the columns/mixed contracts."""
    mode = "columns" if columnwise and mode is None else (mode or "flat")
    if mode.startswith("hash"):
        # 'hashR' (e.g. 'hash4') sets both probe-round knobs to R
        r = int(mode[4:]) if len(mode) > 4 else 8
        return {"embed_fused":
                lambda batch: Hashed(model.flat_sparse_ids(
                    batch["sparse_features"]).reshape(-1),
                    rounds=r, lookup_unroll=r)}
    if mode == "mixed":
        counts = tuple(model.ln_emb)
        offsets = tuple(model.table_offsets[:-1])
        return {"embed_fused":
                lambda batch: ColumnIds(
                    model.flat_sparse_ids(batch["sparse_features"]),
                    counts, offsets)}
    if mode == "columns":
        return {"embed_fused":
                lambda batch: Columns(model.flat_sparse_ids(
                    batch["sparse_features"]))}
    return {"embed_fused":
            lambda batch: model.flat_sparse_ids(
                batch["sparse_features"]).reshape(-1)}


def make_sparse_train_step(model, table_specs,
                           learning_rate=1e-3, b1=0.9, b2=0.999, eps=1e-7,
                           dense_tx: optax.GradientTransformation = None,
                           id_cap: int = None):
    """Build (init_fn, step_fn) with O(batch) updates for the given tables.

    table_specs: {param key or path tuple: id spec}, where id spec is a
    list of batch keys or a callable(batch) -> flat ids, e.g.
      {"user_embed": ["user_id"],
       "item_embed": ["p_item_id", "n_item_id"],
       ("embed_tables", 3): lambda b: b["sparse_features"][:, 3]}
    (see dlrm_table_specs). Dense (non-table) params use `dense_tx`
    (default Adam with the same hyperparameters).

    step_fn(params, opt_state, batch, rng) -> (params, opt_state, loss).
    """
    if dense_tx is None:
        dense_tx = optax.adam(learning_rate, b1=b1, b2=b2, eps=eps)
    specs = {_path_of(k): _extractor(v) for k, v in table_specs.items()}
    top_table_keys = {p[0] for p in specs}

    def _split_dense(params):
        dense = {}
        for k, v in params.items():
            if k in top_table_keys and (k,) in specs:
                continue          # whole leaf is a table
            if k in top_table_keys:
                # container of tables (e.g. embed_tables list): every entry
                # must be covered — mixed containers are not supported.
                sub_idx = {p[1] for p in specs if p[0] == k and len(p) == 2}
                assert isinstance(v, list) and sub_idx == set(range(len(v))), (
                    f"container '{k}' mixes sparse and dense entries")
                continue
            dense[k] = v
        return dense

    def init_fn(params):
        mu = {p: jnp.zeros_like(_get_path(params, p)) for p in specs}
        nu = {p: jnp.zeros_like(_get_path(params, p)) for p in specs}
        return {"sparse": SparseAdamState(jnp.zeros([], jnp.int32), mu, nu),
                "dense": dense_tx.init(_split_dense(params))}

    def step_core(params, opt_state, batch, rng):
        sparse_state: SparseAdamState = opt_state["sparse"]

        # 1) unique ids + caps (static from batch shapes). The per-column
        # dedup path (unique_padded_columns' disjoint-increasing-ranges
        # contract) is explicit opt-in via the Columns wrapper, the
        # sort-free hash-slot path via Hashed; bare arrays of any rank
        # flatten through the flat sort-dedup.
        # id_cap does not apply to Columns/ColumnIds/Hashed.
        uids, valid = {}, {}
        hashed_paths = {}              # path -> lookup unroll
        for path, extract in specs.items():
            raw = extract(batch)
            if isinstance(raw, Hashed):
                uids[path], valid[path] = unique_hashed(raw.ids,
                                                        rounds=raw.rounds)
                hashed_paths[path] = raw.lookup_unroll
                continue
            if isinstance(raw, ColumnIds):
                uids[path], valid[path] = unique_padded_mixed(raw)
                continue
            if isinstance(raw, Columns):
                uids[path], valid[path] = unique_padded_columns(raw.ids_bt)
                continue
            all_ids = jnp.reshape(raw, (-1,))
            cap = id_cap or all_ids.shape[0]
            uids[path], valid[path] = unique_padded(
                all_ids, min(cap, all_ids.shape[0]))

        # 2) gather rows (mode='clip': hash-path empty slots hold an
        # out-of-bounds sentinel and clamp to some row; their
        # contributions are masked/dropped below)
        rows = {path: jnp.take(_get_path(params, path), uids[path],
                               axis=0, mode="clip")
                for path in specs}

        # 3) loss over SubTable views + dense params
        dense_params = _split_dense(params)

        def loss_fn(rows_and_dense):
            r, dense = rows_and_dense
            p = params
            for k, v in dense.items():
                p = _set_path(p, (k,), v)
            for path in specs:
                view = (HashSubTable(uids[path], r[path],
                                     unroll=hashed_paths[path])
                        if path in hashed_paths
                        else SubTable(uids[path], r[path]))
                p = _set_path(p, path, view)
            total, _aux = model.loss(p, batch, rng)
            return total

        (loss), grads = jax.value_and_grad(loss_fn)((rows, dense_params))
        row_grads, dense_grads = grads

        # 4) Adam on gathered rows; sorted-path pad entries (valid=False)
        # alias a real id, so every scatter contribution is masked to
        # zero for them; hash-path empties hold an out-of-bounds sentinel
        # and mode='drop' discards them outright.
        count = sparse_state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        alpha = learning_rate * jnp.sqrt(c2) / c1   # keras Adam form
        new_params = params
        new_mu, new_nu = {}, {}
        for path in specs:
            g = row_grads[path]
            v = valid[path][:, None].astype(g.dtype)
            mu_old = jnp.take(sparse_state.mu[path], uids[path], axis=0,
                              mode="clip")
            nu_old = jnp.take(sparse_state.nu[path], uids[path], axis=0,
                              mode="clip")
            mu_rows = b1 * mu_old + (1 - b1) * g
            nu_rows = b2 * nu_old + (1 - b2) * g * g
            step = -alpha * mu_rows / (jnp.sqrt(nu_rows) + eps)
            # 5) scatter deltas back (donated → in-place); pads add zero.
            new_params = _set_path(
                new_params, path,
                _get_path(params, path).at[uids[path]].add(step * v,
                                                           mode="drop"))
            new_mu[path] = sparse_state.mu[path].at[uids[path]].add(
                (mu_rows - mu_old) * v, mode="drop")
            new_nu[path] = sparse_state.nu[path].at[uids[path]].add(
                (nu_rows - nu_old) * v, mode="drop")

        updates, dense_state = dense_tx.update(
            dense_grads, opt_state["dense"], dense_params)
        for k, u in updates.items():
            new_params = _set_path(
                new_params, (k,), optax.apply_updates(dense_params[k], u))

        new_params = model.post_step(new_params, batch)
        return new_params, {"sparse": SparseAdamState(count, new_mu,
                                                      new_nu),
                            "dense": dense_state}, loss

    step_fn = partial(jax.jit, donate_argnums=(0, 1))(step_core)
    return init_fn, step_fn, step_core


def make_sparse_device_loop(model, table_specs, sampler, k: int,
                            **hyper):
    """K sparse steps with on-device sampling — one XLA program.

    Composes the two O(batch) ideas: batches are drawn inside the scan
    (device_sampler) and each step touches only the gathered rows, so
    per-step cost is independent of both catalog size and host speed.

    Returns (init_fn, loop_fn): loop_fn(params, opt_state, rng) ->
    (params, opt_state, losses[k]).
    """
    init_fn, _, step_core = make_sparse_train_step(model, table_specs,
                                                   **hyper)

    @partial(jax.jit, donate_argnums=(0, 1))
    def loop_fn(params, opt_state, rng):
        rngs = jax.random.split(rng, k)

        def body(carry, step_rng):
            params, opt_state = carry
            r_sample, r_loss = jax.random.split(step_rng)
            batch = sampler.sample(r_sample)
            params, opt_state, loss = step_core(params, opt_state, batch,
                                                r_loss)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), rngs)
        return params, opt_state, losses

    return init_fn, loop_fn
