"""Multi-vector kNN: exact mean-distance form vs numpy oracle
(datasets.py:412-451) and the fused WeightedRanker analog."""

import numpy as np
import pytest

from bigvectorbench_spark.operators import multivector as mv


@pytest.fixture(scope="module")
def mvdata(spark):
    rng = np.random.RandomState(1)
    T = rng.rand(120, 4, 8).astype(np.float32)  # 120 entities × 4 vectors × d=8
    Q = rng.rand(10, 4, 8).astype(np.float32)
    train = spark.createDataFrame(
        [(i, [[float(x) for x in v] for v in T[i]]) for i in range(len(T))],
        "id bigint, vecs array<array<float>>",
    ).cache()
    test = spark.createDataFrame(
        [(i, [[float(x) for x in v] for v in Q[i]]) for i in range(len(Q))],
        "qid bigint, vecs array<array<float>>",
    ).cache()
    return T, Q, train, test


def _oracle(T, Q, k, weights=None):
    out = {}
    w = np.array(weights) if weights is not None else None
    for qi in range(len(Q)):
        # mean over positions of per-position L2 (datasets.py:424-427)
        d = np.linalg.norm(T.astype(np.float64) - Q[qi].astype(np.float64), axis=2)
        d = (d * w).sum(axis=1) if w is not None else d.mean(axis=1)
        order = np.lexsort((np.arange(len(d)), d))[:k]
        out[qi] = list(order)
    return out


def test_mv_knn_matches_oracle(mvdata):
    T, Q, train, test = mvdata
    res = mv.mv_knn(train, test, k=10)
    got = {}
    for r in res.orderBy("qid", "rank").collect():
        got.setdefault(r["qid"], []).append(r["id"])
    assert got == _oracle(T, Q, 10)


def test_mv_knn_weighted(mvdata):
    T, Q, train, test = mvdata
    w = [0.4, 0.3, 0.2, 0.1]
    res = mv.mv_knn(train, test, k=5, weights=w)
    got = {}
    for r in res.orderBy("qid", "rank").collect():
        got.setdefault(r["qid"], []).append(r["id"])
    assert got == _oracle(T, Q, 5, weights=w)


def test_mv_knn_fused_reasonable_recall(mvdata):
    """Fusion is approximate (milvus/module.py:422-458); with generous
    per-vector over-fetch it should mostly agree with the exact form."""
    T, Q, train, test = mvdata
    exact = _oracle(T, Q, 10)
    res = mv.mv_knn_fused(train, test, k=10, per_vector_k=60)
    got = {}
    for r in res.orderBy("qid", "rank").collect():
        got.setdefault(r["qid"], []).append(r["id"])
    recalls = [len(set(got[q]) & set(exact[q])) / 10 for q in exact]
    assert np.mean(recalls) > 0.6


def test_mv_knn_fused_weight_validation(mvdata):
    _, _, train, test = mvdata
    with pytest.raises(ValueError):
        mv.mv_knn_fused(train, test, k=3, weights=[1.0, 1.0])


def _indexed_oracle(T, Q, k, fetch, overfetch, weights):
    """Numpy replay of mv_indexed_fused: per-position BQ (mean thresholds
    over id-sorted rows, (hamming, id) lexsort pre-rank, exact-L2 refine)
    + the 9-dp DECIMAL WeightedRanker ladder, rank on 6-dp score."""
    from decimal import Decimal

    n, v, d = T.shape
    ids = np.arange(n)
    scores: dict[tuple[int, int], Decimal] = {}
    for j in range(v):
        Xj = T[:, j, :].astype(np.float64)
        thr = Xj.mean(axis=0)
        bits = Xj > thr[None, :]
        for qi in range(len(Q)):
            qb = Q[qi, j, :].astype(np.float64) > thr
            ham = (bits != qb[None, :]).sum(axis=1)
            cand = ids[np.lexsort((ids, ham))[:fetch * overfetch]]
            dd = np.linalg.norm(
                Xj[cand] - Q[qi, j, :].astype(np.float64), axis=1)
            keep = cand[np.lexsort((cand, dd))[:fetch]]
            for i in keep:
                di = float(np.linalg.norm(
                    Xj[i] - Q[qi, j, :].astype(np.float64)))
                c = Decimal(str(round(weights[j] / (1.0 + round(di, 4)), 9)))
                scores[(qi, int(i))] = scores.get((qi, int(i)), Decimal(0)) + c
    out = {}
    for qi in range(len(Q)):
        rows = sorted(
            ((round(float(s), 6), i) for (q, i), s in scores.items() if q == qi),
            key=lambda t: (-t[0], t[1]))[:k]
        out[qi] = [(i, s) for s, i in rows]
    return out


def test_mv_indexed_fused_matches_numpy_replay(mvdata):
    """The strongest pin: the whole indexed pipeline — per-position BQ
    thresholds, hamming pre-rank, exact refine, DECIMAL fusion ladder,
    rank-on-rounded-score — replayed in numpy, ids AND scores equal."""
    T, Q, train, test = mvdata
    w = [0.25, 0.25, 0.25, 0.25]
    res = mv.mv_indexed_fused(train, test, k=5, weights=w, num_vectors=4,
                              per_vector_k=10, overfetch=4)
    got = {}
    for r in res.orderBy("qid", "rank").collect():
        got.setdefault(r["qid"], []).append((r["id"], round(r["score"], 6)))
    want = _indexed_oracle(T, Q, k=5, fetch=10, overfetch=4, weights=w)
    assert got == want


def test_mv_indexed_fused_full_budget_matches_brute(mvdata):
    """With the candidate budget opened to the whole corpus the hamming
    pre-rank cannot drop anyone, so indexed fusion selects the same
    entities as the brute fused form (scores differ only in the DECIMAL
    ladder's sub-1e-6 rounding)."""
    T, Q, train, test = mvdata
    n = len(T)
    brute = mv.mv_knn_fused(train, test, k=5, per_vector_k=n)
    idxd = mv.mv_indexed_fused(train, test, k=5, per_vector_k=n,
                               overfetch=1)
    b, i = {}, {}
    for r in brute.orderBy("qid", "rank").collect():
        b.setdefault(r["qid"], []).append(r["id"])
    for r in idxd.orderBy("qid", "rank").collect():
        i.setdefault(r["qid"], []).append(r["id"])
    assert b == i


def test_mv_indexed_fused_weight_validation(mvdata):
    _, _, train, test = mvdata
    with pytest.raises(ValueError):
        mv.mv_indexed_fused(train, test, k=3, weights=[1.0])
