"""Weak-supervision quality classifier: fit determinism, numpy parity of
the scoring fold, and it-actually-learns pins."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigvectorbench_spark.operators.classifier import (
    QualityClassifier, fit_logistic_numpy)


def test_fit_logistic_numpy_deterministic_and_learns():
    rng = np.random.RandomState(47)
    X = rng.randint(-5, 6, size=(400, 8)).astype(np.int64)
    true_w = np.array([2.0, -1.5, 0.0, 1.0, 0.0, 0.5, -2.0, 0.0])
    y = ((X @ true_w) > 0).astype(np.int64)
    w1, b1 = fit_logistic_numpy(X, y)
    w2, b2 = fit_logistic_numpy(X, y)
    np.testing.assert_array_equal(w1, w2)
    assert b1 == b2
    p = 1.0 / (1.0 + np.exp(-(X @ w1 + b1)))
    assert ((p >= 0.5) == y).mean() >= 0.95   # separable-ish → near-perfect


def _docs(spark):
    rows = []
    for i in range(120):
        if i % 2 == 0:  # clean natural text
            rows.append((i, "the quick brown fox jumps over the lazy dog and "
                            "runs far into the quiet green field today"))
        else:           # noisy junk
            rows.append((i, "@@## 123 456 !!! %%% 789 $$$ 000 ### @@@ !!!"))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_fit_and_score_separate_quality_classes(spark):
    docs = _docs(spark)
    clf = QualityClassifier.fit(docs, dim=32, quality_threshold=0.5,
                                train_filter="_id % 3 != 0")
    scored = {r["doc_id"]: (r["quality_prob"], r["predicted"])
              for r in clf.score(docs).collect()}
    # held-out docs (id % 3 == 0) must classify correctly too
    held = [i for i in range(120) if i % 3 == 0]
    acc = np.mean([scored[i][1] == (1 if i % 2 == 0 else 0) for i in held])
    assert acc >= 0.95, acc
    assert all(0.0 <= scored[i][0] <= 1.0 for i in scored)


def test_score_matches_numpy_fold(spark):
    """The Column dot-fold + sigmoid reproduces the numpy arithmetic on
    the same integer features (6-dp round)."""
    from bigvectorbench_spark.functions import embed as em, text as tx

    docs = _docs(spark).limit(20)
    clf = QualityClassifier.fit(_docs(spark), dim=32, quality_threshold=0.5)
    feats = {r["doc_id"]: np.array(r["x"]) for r in docs.select(
        "doc_id", em.hashed_embedding(
            em.token_hashes(tx.tokens(F.col("text"))), dim=32).alias("x")
    ).collect()}
    got = {r["doc_id"]: r["quality_prob"] for r in clf.score(docs).collect()}
    w = np.array(clf.weights)
    for i, x in feats.items():
        want = round(float(1.0 / (1.0 + np.exp(-(x @ w + clf.bias)))), 6)
        assert abs(got[i] - want) < 2e-6, (i, got[i], want)


def test_fit_validations(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="no training rows"):
        QualityClassifier.fit(docs, dim=32, quality_threshold=0.5,
                              train_filter="_id < 0")
    same = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog and runs far "
             "into the quiet green field today") for i in range(30)],
        "doc_id bigint, text string")
    with pytest.raises(ValueError, match="degenerate supervision"):
        QualityClassifier.fit(same, dim=32)
