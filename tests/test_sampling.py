"""Weighted (A-ES) and stratified sampling: python-oracle parity,
weight-proportional frequencies, determinism, and plan shapes."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from bigvectorbench_spark.operators import sampling as sm


def _py_u(doc_id, seed):
    h = int(hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:15], 16)
    return (h % sm.U_GRID + 1) / sm.U_GRID


def _py_weighted(rows, n, seed=1):
    keyed = sorted(
        (round(-math.log(_py_u(i, seed)) / w, 9), i)
        for i, w in rows if w > 0)
    return keyed[:n]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, float(1 + i % 7), f"s{i % 3}") for i in range(200)],
        "doc_id bigint, w double, source string").cache()


def test_weighted_matches_python_oracle(spark, docs):
    got = sm.weighted_sample(docs, n=20, weight_col="w").collect()
    expect = _py_weighted([(r["doc_id"], r["w"]) for r in docs.collect()], 20)
    assert [(r["skey"], r["doc_id"]) for r in
            sorted(got, key=lambda r: (r["skey"], r["doc_id"]))] == \
        [(pytest.approx(k), i) for k, i in expect]


def test_weighted_excludes_nonpositive_and_is_exact_size(spark):
    df = spark.createDataFrame(
        [(0, 0.0), (1, -1.0)] + [(i, 1.0) for i in range(2, 30)],
        "doc_id bigint, w double")
    got = sm.weighted_sample(df, n=10, weight_col="w").collect()
    assert len(got) == 10
    assert all(r["doc_id"] >= 2 for r in got)


def test_weighted_frequencies_follow_weights():
    """Across 60 seeds, a weight-9 row's PER-ROW draw frequency must far
    exceed a weight-1 row's (law-of-large-numbers smoke on the shared
    python twin — the Spark path is pinned to it row-for-row above)."""
    rows = [(i, 9.0 if i < 10 else 1.0) for i in range(110)]
    heavy = light = 0
    for seed in range(60):
        for _, i in _py_weighted(rows, 10, seed=seed):
            if i < 10:
                heavy += 1
            else:
                light += 1
    per_heavy = heavy / 10
    per_light = light / 100
    # exact 9:1 odds erode under without-replacement saturation; >3x is
    # the no-bug floor (a uniform sampler gives ~1x)
    assert per_heavy / max(per_light, 1e-9) > 3


def test_stratified_exact_quota_and_python_parity(spark, docs):
    got = sm.stratified_sample(docs, group_col="source", quota=5).collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r["source"], []).append((r["srank"], r["doc_id"]))
    rows = [(r["doc_id"], r["source"]) for r in docs.collect()]
    for g in ("s0", "s1", "s2"):
        members = sorted((_py_u(i, 1), i) for i, s in rows if s == g)[:5]
        expect = [i for _, i in members]
        assert sorted(i for _, i in by_g[g]) == sorted(expect), g
        assert sorted(r for r, _ in by_g[g]) == [1, 2, 3, 4, 5]


def test_stratified_small_group_keeps_all(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id bigint, source string")
    got = sm.stratified_sample(df, group_col="source", quota=5).collect()
    assert len(got) == 3


def test_plans(spark, docs):
    top = sm.weighted_sample(docs, n=10, weight_col="w")
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global sort materialization
    strat = sm.stratified_sample(docs, group_col="source", quota=5)
    plan2 = strat._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan2  # rank bound applied pre-exchange
