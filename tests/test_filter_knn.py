"""Filtered kNN: per-query predicates, template compilation, pre/post plans."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigvectorbench_spark.operators import filter_knn as fknn
from bigvectorbench_spark.plans import selectivity as sel
from tests.conftest import make_blobs


def test_template_compilation():
    t = "label_0 <= {label_0} and label_1 == {label_1} or label_0 != {x}"
    assert (
        fknn.compile_filter_template(t)
        == "label_0 <= __q_label_0 and label_1 = __q_label_1 or label_0 != __q_x"
    )
    # >= / <= must survive the == rewrite
    assert fknn.compile_filter_template("a >= {b}") == "a >= __q_b"


@pytest.fixture(scope="module")
def fdata(spark):
    X = make_blobs(400, 8, seed=2)
    rng = np.random.RandomState(7)
    labs = rng.randint(0, 100, size=(400, 2))
    train = spark.createDataFrame(
        [(i, [float(x) for x in X[i]], int(labs[i, 0]), int(labs[i, 1])) for i in range(350)],
        "id bigint, vec array<float>, label_0 int, label_1 int",
    ).cache()
    test = spark.createDataFrame(
        [(i, [float(x) for x in X[350 + i]], int(labs[350 + i, 0]), int(labs[350 + i, 1]))
         for i in range(30)],
        "qid bigint, vec array<float>, label_0 int, label_1 int",
    ).cache()
    return X, labs, train, test


def _numpy_filtered(X, labs, qi, k):
    """Oracle: the random_filter dataset semantics (datasets.py:385-394)."""
    q = X[350 + qi].astype(np.float64)
    mask = (labs[:350, 0] <= labs[350 + qi, 0]) & (labs[:350, 1] <= labs[350 + qi, 1])
    ids = np.where(mask)[0]
    d = np.sqrt(((X[ids].astype(np.float64) - q) ** 2).sum(axis=1))
    order = np.lexsort((ids, d))[:k]
    return list(ids[order])


TEMPLATE = "label_0 <= {label_0} and label_1 <= {label_1}"


def test_filtered_knn_matches_oracle(fdata):
    X, labs, train, test = fdata
    res = fknn.filtered_knn(
        train, test, k=10, filter_template=TEMPLATE, query_param_cols=["label_0", "label_1"]
    )
    got = {}
    for r in res.orderBy("qid", "rank").collect():
        got.setdefault(r["qid"], []).append(r["id"])
    for qi in range(30):
        assert got.get(qi, []) == _numpy_filtered(X, labs, qi, 10), f"qid={qi}"


def test_filtered_knn_angular_matches_numpy(fdata):
    """Covers the below-join norm-fold branch (pair_dist_below_join)."""
    X, labs, train, test = fdata
    res = fknn.filtered_knn(
        train, test, k=5, metric="angular",
        filter_template=TEMPLATE, query_param_cols=["label_0", "label_1"],
    )
    got = {}
    for r in res.orderBy("qid", "rank").collect():
        got.setdefault(r["qid"], []).append(r["id"])
    for qi in range(30):
        q = X[350 + qi].astype(np.float64)
        mask = (labs[:350, 0] <= labs[350 + qi, 0]) & (labs[:350, 1] <= labs[350 + qi, 1])
        ids = np.where(mask)[0]
        T = X[ids].astype(np.float64)
        d = 1.0 - (T @ q) / (np.linalg.norm(T, axis=1) * np.linalg.norm(q))
        order = np.lexsort((ids, d))[:5]
        assert got.get(qi, []) == list(ids[order]), f"qid={qi}"


def test_filtered_knn_or_template(fdata):
    """The DSL admits or-disjunctions (weaviate/utils.py:105-179 grammar);
    most reference backends raise on them — we support them for free via
    Catalyst."""
    X, labs, train, test = fdata
    res = fknn.filtered_knn(
        train, test, k=5,
        filter_template="label_0 <= {label_0} or label_1 == {label_1}",
        query_param_cols=["label_0", "label_1"],
    )
    got = {}
    for r in res.orderBy("qid", "rank").collect():
        got.setdefault(r["qid"], []).append(r["id"])
    for qi in list(got)[:5]:
        q = X[350 + qi].astype(np.float64)
        mask = (labs[:350, 0] <= labs[350 + qi, 0]) | (labs[:350, 1] == labs[350 + qi, 1])
        ids = np.where(mask)[0]
        d = np.sqrt(((X[ids].astype(np.float64) - q) ** 2).sum(axis=1))
        assert got[qi] == list(ids[np.lexsort((ids, d))[:5]])


def test_filtered_knn_queries_with_no_matches(fdata):
    _, _, train, test = fdata
    res = fknn.filtered_knn(
        train,
        test.withColumn("label_0", F.lit(-1)),
        k=5,
        filter_template=TEMPLATE,
        query_param_cols=["label_0", "label_1"],
    )
    assert res.count() == 0


def test_postfilter_knn_agrees_when_overfetch_sufficient(fdata):
    X, labs, train, test = fdata
    # high-selectivity predicate: label_0 <= 95 keeps ~95% of rows
    t95 = test.withColumn("label_0", F.lit(95)).withColumn("label_1", F.lit(95))
    pre = fknn.filtered_knn(train, t95, k=5, filter_template=TEMPLATE,
                            query_param_cols=["label_0", "label_1"])
    post = fknn.postfilter_knn(train, t95, k=5, metric="euclidean",
                               filter_template=TEMPLATE,
                               query_param_cols=["label_0", "label_1"],
                               selectivity=0.9)
    a = [(r["qid"], r["id"]) for r in pre.orderBy("qid", "rank").collect()]
    b = [(r["qid"], r["id"]) for r in post.orderBy("qid", "rank").collect()]
    assert a == b


def test_selectivity_estimate_and_plan(fdata):
    _, labs, train, _ = fdata
    ratio = sel.estimate_selectivity(train, "label_0 <= 50")
    true_ratio = (labs[:350, 0] <= 50).mean()
    assert ratio == pytest.approx(true_ratio, abs=1e-9)
    assert sel.choose_plan(0.5, 10) == sel.FilterPlan("post", 0.5, 30)
    assert sel.choose_plan(0.05, 10).strategy == "pre"


def test_adaptive_filtered_knn_both_branches(fdata):
    X, labs, train, test = fdata
    res, plan = sel.adaptive_filtered_knn(
        train, test, 5, "euclidean",
        filter_template=TEMPLATE, query_param_cols=["label_0", "label_1"],
        representative_predicate="label_0 <= 50 and label_1 <= 50",
    )
    assert plan.strategy in ("pre", "post")
    assert res.count() > 0
