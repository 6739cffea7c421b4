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
