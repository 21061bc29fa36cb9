"""O(batch) sparse step (gather→Adam→scatter) vs the masked lazy_adam
oracle: identical math, different data movement."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openrec_tpu.data.samplers import PairwiseSampler
from openrec_tpu.data.store import InteractionStore
from openrec_tpu.models import BPR
from openrec_tpu.training.optim import lazy_adam
from openrec_tpu.training.sparse import (
    make_sparse_train_step, unique_padded)
from tests.conftest import make_interactions

SPECS = {"user_embed": ["user_id"],
         "item_embed": ["p_item_id", "n_item_id"],
         "item_bias": ["p_item_id", "n_item_id"]}


def test_unique_padded():
    ids = jnp.asarray([5, 3, 5, 9, 3, 3])
    uids, valid = unique_padded(ids, 6)
    np.testing.assert_array_equal(np.asarray(uids), [3, 5, 9, 9, 9, 9])
    np.testing.assert_array_equal(np.asarray(valid),
                                  [True, True, True, False, False, False])


def test_unique_padded_cap_below_uniques():
    ids = jnp.asarray([5, 3, 5, 9, 3, 3, 7, 1])
    uids, valid = unique_padded(ids, 3)       # uniques {1,3,5,7,9} > cap
    np.testing.assert_array_equal(np.asarray(uids), [1, 3, 5])
    np.testing.assert_array_equal(np.asarray(valid), [True] * 3)


def test_unique_padded_columns_matches_flat():
    from openrec_tpu.training.sparse import unique_padded_columns

    rng = np.random.default_rng(3)
    counts = (7, 3, 19)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    B = 16
    ids_bt = jnp.asarray(np.stack(
        [rng.integers(0, c, B) + o for c, o in zip(counts, offsets)],
        axis=1).astype(np.int32))
    uids, valid = unique_padded_columns(ids_bt)
    u, v = np.asarray(uids), np.asarray(valid)
    # globally sorted (required by SubTable.searchsorted)
    assert (np.diff(u) >= 0).all()
    # valid entries == the true unique set
    flat = np.asarray(ids_bt).reshape(-1)
    np.testing.assert_array_equal(np.sort(u[v]), np.unique(flat))
    # pads alias a real id of their column (searchsorted-first safe)
    assert set(u[~v].tolist()) <= set(flat.tolist())
    # every original id resolves to its own row (SubTable contract)
    pos = np.searchsorted(u, flat)
    np.testing.assert_array_equal(u[pos], flat)


def test_unique_hashed_matches_unique():
    from openrec_tpu.training.sparse import (_HASH_EMPTY, hash_positions,
                                             unique_hashed)

    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, 500, 300).astype(np.int32))
    uids, valid = unique_hashed(ids)
    u, v = np.asarray(uids), np.asarray(valid)
    S = len(u)
    assert S >= 2 * 300 and (S & (S - 1)) == 0     # 2×-cap power of two
    # occupied slots hold exactly the unique set; empties the sentinel
    np.testing.assert_array_equal(np.sort(u[v]),
                                  np.unique(np.asarray(ids)))
    assert (u[~v] == _HASH_EMPTY).all()
    # every original id probes to its own slot (HashSubTable contract)
    pos = np.asarray(hash_positions(uids, ids))
    np.testing.assert_array_equal(u[pos], np.asarray(ids))


def test_unique_hashed_straggler_while_loop():
    """rounds=0 forces EVERY insertion through the dynamic while_loop
    continuation (and unroll=1 lookups through theirs): same invariants."""
    from openrec_tpu.training.sparse import hash_positions, unique_hashed

    rng = np.random.default_rng(11)
    # dense id range → heavy collisions
    ids = jnp.asarray(rng.integers(0, 40, 256).astype(np.int32))
    uids, valid = unique_hashed(ids, rounds=0)
    u, v = np.asarray(uids), np.asarray(valid)
    np.testing.assert_array_equal(np.sort(u[v]),
                                  np.unique(np.asarray(ids)))
    pos = np.asarray(hash_positions(uids, ids, unroll=1))
    np.testing.assert_array_equal(u[pos], np.asarray(ids))


def test_hash_positions_grad_safe():
    """jax.grad flows through a HashSubTable lookup (integer-only
    while_loop in the position probe must not obstruct reverse mode)."""
    from openrec_tpu.training.sparse import HashSubTable, unique_hashed

    ids = jnp.asarray([3, 7, 3, 1, 9, 7], jnp.int32)
    uids, valid = unique_hashed(ids, rounds=1)

    def f(rows):
        view = HashSubTable(uids, rows)
        return jnp.sum(view.lookup(ids) ** 2)

    rows = jnp.ones((uids.shape[0], 4), jnp.float32)
    g = jax.grad(f)(rows)
    # each unique id's slot row is looked up len(dups) times → grad 2*dups
    u, v = np.asarray(uids), np.asarray(valid)
    counts = {3: 2, 7: 2, 1: 1, 9: 1}
    gn = np.asarray(g)
    for slot in range(len(u)):
        expect = 2.0 * counts.get(int(u[slot]), 0) if v[slot] else 0.0
        np.testing.assert_allclose(gn[slot], expect)


def _setup():
    store = InteractionStore(make_interactions(), 40, 100, seed=0)
    model = BPR(total_users=40, total_items=100, dim_user_embed=8,
                dim_item_embed=8, l2_weight=0.0)
    params = model.init(jax.random.PRNGKey(0))
    s = PairwiseSampler(store, batch_size=64, seed=0)
    return model, params, s


def test_sparse_step_matches_lazy_adam():
    model, params, s = _setup()
    batches = [{k: jnp.asarray(v) for k, v in s.sample().items()}
               for _ in range(5)]

    # oracle: dense masked lazy_adam
    tx = lazy_adam(0.01)
    p_ref = params
    st_ref = tx.init(p_ref)
    for b in batches:
        grads = jax.grad(lambda p: model.loss(p, b)[0])(p_ref)
        upd, st_ref = tx.update(grads, st_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)

    # sparse gather/scatter path
    init_fn, step_fn, _ = make_sparse_train_step(model, SPECS,
                                                 learning_rate=0.01)
    p = params
    st = init_fn(p)
    for b in batches:
        p, st, loss = step_fn(p, st, b, jax.random.PRNGKey(0))

    for key in ("user_embed", "item_embed", "item_bias"):
        np.testing.assert_allclose(np.asarray(p[key]),
                                   np.asarray(p_ref[key]),
                                   rtol=1e-4, atol=1e-7), key


def test_sparse_step_leaves_untouched_rows():
    model, params, s = _setup()
    b = {k: jnp.asarray(v) for k, v in s.sample().items()}
    init_fn, step_fn, _ = make_sparse_train_step(model, SPECS,
                                                 learning_rate=0.1)
    st = init_fn(params)
    p, st, _ = step_fn(params, st, b, jax.random.PRNGKey(0))
    touched = set(np.asarray(b["user_id"]).tolist())
    ue = np.asarray(p["user_embed"])
    # jit donation invalidates `params`; re-init for comparison
    orig = np.asarray(model.init(jax.random.PRNGKey(0))["user_embed"])
    for u in range(40):
        if u in touched:
            assert not np.allclose(ue[u], orig[u])
        else:
            np.testing.assert_array_equal(ue[u], orig[u])


def test_sparse_device_loop_learns():
    from openrec_tpu.data.device_sampler import DevicePairwiseSampler
    from openrec_tpu.training.sparse import make_sparse_device_loop
    from tests.conftest import make_low_rank

    train, test = make_low_rank()
    store = InteractionStore(train, 64, 256, seed=0)
    model = BPR(total_users=64, total_items=256, dim_user_embed=16,
                dim_item_embed=16, l2_weight=0.0)
    sampler = DevicePairwiseSampler(store, batch_size=512)
    init_fn, loop_fn = make_sparse_device_loop(
        model, SPECS, sampler, k=100, learning_rate=0.05)
    params = model.init(jax.random.PRNGKey(0))
    st = init_fn(params)
    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(10):
        rng, sub = jax.random.split(rng)
        params, st, losses = loop_fn(params, st, sub)
        if first is None:
            first = float(np.mean(np.asarray(losses)))
    last = float(np.mean(np.asarray(losses)))
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_sparse_step_dlrm_tables():
    from openrec_tpu.models import DLRM
    from openrec_tpu.training.sparse import dlrm_table_specs

    model = DLRM(m_spa=4, ln_emb=(50, 80, 30), ln_bot=(8, 4),
                 ln_top=(16, 1), dim_dense=3, loss_func="bce")
    params = model.init(jax.random.PRNGKey(0))
    orig = jax.tree_util.tree_map(np.asarray, params)
    rng = np.random.default_rng(0)
    B = 32
    batch = {
        "dense_features": jnp.asarray(
            rng.normal(size=(B, 3)).astype(np.float32)),
        "sparse_features": jnp.asarray(np.stack(
            [rng.integers(0, c, B) for c in (50, 80, 30)],
            axis=1).astype(np.int32)),
        "label": jnp.asarray(rng.integers(0, 2, B).astype(np.float32)),
    }
    init_fn, step_fn, _ = make_sparse_train_step(
        model, dlrm_table_specs(3), learning_rate=0.01)
    st = init_fn(params)
    p = params
    losses = []
    for i in range(20):
        p, st, loss = step_fn(p, st, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # touched rows moved; untouched rows in table 0 unchanged
    touched = set(np.asarray(batch["sparse_features"])[:, 0].tolist())
    t0_new = np.asarray(p["embed_tables"][0])
    for r in range(50):
        if r in touched:
            assert not np.allclose(t0_new[r], orig["embed_tables"][0][r])
        else:
            np.testing.assert_array_equal(t0_new[r],
                                          orig["embed_tables"][0][r])
    # dense MLP weights trained too
    assert not np.allclose(np.asarray(p["mlp_top"][0]["w"]),
                           orig["mlp_top"][0]["w"])


def test_dlrm_fused_tables_matches_separate():
    from openrec_tpu.models import DLRM

    kw = dict(m_spa=4, ln_emb=(50, 80, 30), ln_bot=(8, 4), ln_top=(16, 1),
              dim_dense=3, loss_func="bce")
    m_sep = DLRM(**kw)
    m_fused = DLRM(fused_tables=True, **kw)
    p_sep = m_sep.init(jax.random.PRNGKey(0))
    p_fused = m_fused.init(jax.random.PRNGKey(0))
    # identical rows, different layout
    np.testing.assert_array_equal(
        np.asarray(p_fused["embed_fused"][:50]),
        np.asarray(p_sep["embed_tables"][0]))
    rng = np.random.default_rng(0)
    B = 16
    batch = {
        "dense_features": jnp.asarray(
            rng.normal(size=(B, 3)).astype(np.float32)),
        "sparse_features": jnp.asarray(np.stack(
            [rng.integers(0, c, B) for c in (50, 80, 30)],
            axis=1).astype(np.int32)),
        "label": jnp.asarray(rng.integers(0, 2, B).astype(np.float32)),
    }
    l1, _ = m_sep.loss(p_sep, batch)
    l2, _ = m_fused.loss(p_fused, batch)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_dlrm_fused_sparse_step():
    from openrec_tpu.models import DLRM
    from openrec_tpu.training.sparse import dlrm_fused_table_spec

    model = DLRM(m_spa=4, ln_emb=(50, 80, 30), ln_bot=(8, 4),
                 ln_top=(16, 1), dim_dense=3, loss_func="bce",
                 fused_tables=True)
    params = model.init(jax.random.PRNGKey(0))
    init_fn, step_fn, _ = make_sparse_train_step(
        model, dlrm_fused_table_spec(model), learning_rate=0.01)
    st = init_fn(params)
    rng = np.random.default_rng(1)
    B = 32
    batch = {
        "dense_features": jnp.asarray(
            rng.normal(size=(B, 3)).astype(np.float32)),
        "sparse_features": jnp.asarray(np.stack(
            [rng.integers(0, c, B) for c in (50, 80, 30)],
            axis=1).astype(np.int32)),
        "label": jnp.asarray(rng.integers(0, 2, B).astype(np.float32)),
    }
    p = params
    losses = []
    for i in range(20):
        p, st, loss = step_fn(p, st, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_dlrm_fused_columnwise_matches_flat_dedup():
    """The per-column dedup path (default spec) and the flat-sort path
    produce bit-identical training trajectories."""
    from openrec_tpu.models import DLRM
    from openrec_tpu.training.sparse import dlrm_fused_table_spec

    model = DLRM(m_spa=4, ln_emb=(50, 80, 30), ln_bot=(8, 4),
                 ln_top=(16, 1), dim_dense=3, loss_func="bce",
                 fused_tables=True)
    rng = np.random.default_rng(5)
    B = 32
    batches = [{
        "dense_features": jnp.asarray(
            rng.normal(size=(B, 3)).astype(np.float32)),
        "sparse_features": jnp.asarray(np.stack(
            [rng.integers(0, c, B) for c in (50, 80, 30)],
            axis=1).astype(np.int32)),
        "label": jnp.asarray(rng.integers(0, 2, B).astype(np.float32)),
    } for _ in range(4)]

    finals = []
    # 'mixed' exercises both segment kinds at B=32: counts 50/80 > B
    # dedup per column, count 30 <= B becomes a static touched-mask
    # segment; 'hash' is the sort-free slot-table path
    for mode in ("mixed", "columns", "flat", "hash"):
        params = model.init(jax.random.PRNGKey(0))
        init_fn, step_fn, _ = make_sparse_train_step(
            model, dlrm_fused_table_spec(model, mode=mode),
            learning_rate=0.01)
        st = init_fn(params)
        p = params
        for i, b in enumerate(batches):
            p, st, _ = step_fn(p, st, b, jax.random.PRNGKey(i))
        finals.append(jax.tree_util.tree_map(np.asarray, p))
    for other in finals[1:]:
        jax.tree_util.tree_map(np.testing.assert_array_equal,
                               finals[0], other)
