"""Per-query timing protocol → percentile/QPS metrics pipeline."""

import pytest

from bigvectorbench_spark import fixtures as fx
from bigvectorbench_spark.operators import metrics as mx
from bigvectorbench_spark.operators import timing as tm


def test_individual_query_timing_feeds_metrics(spark):
    train, test = fx.random_float(spark, n=300, d=8)
    train = train.cache(); train.count()
    times = tm.time_individual_queries(spark, train, test.limit(5), k=3, runs=2)
    rows = times.collect()
    assert len(rows) == 5
    assert all(r["latency"] > 0 for r in rows)
    p = mx.latency_percentiles(times, percentiles=(0.5,)).collect()[0]
    assert p["p5"] > 0
    q = mx.qps(times).collect()[0]["qps"]
    assert q > 0


def test_batch_latency_frame(spark):
    _, test = fx.random_float(spark, n=300, d=8)
    lat = tm.batch_latency_frame(spark, test.limit(10), batch_seconds=2.0)
    rows = lat.collect()
    assert len(rows) == 10
    assert all(r["latency"] == pytest.approx(0.2) for r in rows)
