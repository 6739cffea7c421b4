"""Salted joins preserve join semantics; bucketed tables join without
exchanges."""

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from bigvectorbench_spark.plans import skew


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_equals_plain_join(spark):
    # heavily skewed large side: 90% of rows share key 1
    large = spark.createDataFrame(
        [(1 if i % 10 else i, i) for i in range(1000)], "k bigint, payload bigint")
    small = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "k bigint, val string")
    plain = large.join(small, "k").groupBy("k").count()
    salted = skew.salted_join(large, small, "k", salts=4).groupBy("k").count()
    a = sorted((r["k"], r["count"]) for r in plain.collect())
    b = sorted((r["k"], r["count"]) for r in salted.collect())
    assert a == b


def test_salted_join_validates(spark):
    df = spark.range(1).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        skew.salted_join(df, df, "k", salts=0)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    a = spark.createDataFrame([(i, i * 2) for i in range(500)], "k bigint, x bigint")
    b = spark.createDataFrame([(i, i * 3) for i in range(500)], "k bigint, y bigint")
    skew.write_bucketed(a, "t_bucketed_a", "k", buckets=4)
    skew.write_bucketed(b, "t_bucketed_b", "k", buckets=4)
    ta, tb = spark.table("t_bucketed_a"), spark.table("t_bucketed_b")
    # disable broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, "k")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing pre-paid the shuffle
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_b")
