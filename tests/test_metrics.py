"""Ranking metrics vs a direct numpy transcription of the reference
tf2 semantics (openrec/tf2/metrics/ranking_metrics.py:8-69)."""

import numpy as np

from openrec_tpu.metrics import AUC, NDCG, Precision, Recall


def ref_auc(pos_mask, pred, excl_mask):
    out = []
    for pm, pr, em in zip(pos_mask, pred, excl_mask):
        ev = ~(pm | em)
        ev_pred = pr[ev]
        pos_pred = pr[pm]
        cnt = (ev_pred[None, :] <= pos_pred[:, None]).sum()
        out.append(cnt / (len(pos_pred) * len(ev_pred)))
    return np.array(out, dtype=np.float32)


def ref_rank_above(pm, pr, em):
    p = np.exp(pr) * (~em)
    pos_pred = p[pm]
    return (p[None, :] > pos_pred[:, None]).sum(1)


def ref_recall(pos_mask, pred, excl_mask, at):
    out = []
    for pm, pr, em in zip(pos_mask, pred, excl_mask):
        ranks = ref_rank_above(pm, pr, em)
        out.append([(ranks < k).sum() / pm.sum() for k in at])
    return np.array(out, dtype=np.float32).T


def ref_ndcg(pos_mask, pred, excl_mask, at):
    out = []
    for pm, pr, em in zip(pos_mask, pred, excl_mask):
        ranks = ref_rank_above(pm, pr, em).astype(np.float64)
        recip = 1.0 / np.log2(ranks + 2)
        out.append([np.sum(recip * (ranks < k)) for k in at])
    return np.array(out, dtype=np.float32).T


def _case(seed=0, B=6, I=50):
    rng = np.random.default_rng(seed)
    pred = rng.normal(size=(B, I)).astype(np.float32)
    pos = np.zeros((B, I), dtype=bool)
    excl = np.zeros((B, I), dtype=bool)
    for b in range(B):
        idx = rng.choice(I, size=8, replace=False)
        pos[b, idx[:4]] = True
        excl[b, idx[4:]] = True
    return pos, pred, excl


def test_auc_matches_reference():
    pos, pred, excl = _case()
    np.testing.assert_allclose(np.asarray(AUC(pos, pred, excl)),
                               ref_auc(pos, pred, excl), rtol=1e-5)


def test_recall_matches_reference():
    pos, pred, excl = _case(1)
    at = (5, 10, 25)
    got = np.asarray(Recall(pos, pred, excl, at=at))  # [B, len(at)]
    want = ref_recall(pos, pred, excl, at).T
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ndcg_matches_reference():
    pos, pred, excl = _case(2)
    at = (5, 25)
    got = np.asarray(NDCG(pos, pred, excl, at=at))
    want = ref_ndcg(pos, pred, excl, at).T
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_precision():
    pos, pred, excl = _case(3)
    at = (10,)
    got = np.asarray(Precision(pos, pred, excl, at=at))
    ranks = [ref_rank_above(pm, pr, em) for pm, pr, em
             in zip(pos, pred, excl)]
    want = np.array([[(r < 10).sum() / 10.0] for r in ranks],
                    dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ties_and_exclusion_edge_cases():
    # All scores identical: every eval item ties every positive; AUC = 1
    # under the reference's <= convention.
    B, I = 2, 20
    pred = np.zeros((B, I), dtype=np.float32)
    pos = np.zeros((B, I), dtype=bool)
    excl = np.zeros((B, I), dtype=bool)
    pos[:, :2] = True
    excl[:, 2:4] = True
    got = np.asarray(AUC(pos, pred, excl))
    want = ref_auc(pos, pred, excl)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # rank_above with full ties = 0 → every positive within any k.
    r = np.asarray(Recall(pos, pred, excl, at=(1,)))
    np.testing.assert_allclose(r, 1.0)
