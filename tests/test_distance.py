"""Distance kernel unit tests mirroring the reference's hand-value tests
(/root/reference/test/distance_test.py:8-43, test/jaccard_test.py:5-14)."""

import math

import pytest
from pyspark.sql import functions as F

from bigvectorbench_spark.functions import distance as dist


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _arr(vals, typ="array<float>"):
    return F.lit(vals).cast(typ)


def test_euclidean(spark):
    # distance_test.py: euclidean((0,1),(1,0)) == sqrt(2)
    v = _eval(spark, dist.l2_dist(_arr([0.0, 1.0]), _arr([1.0, 0.0])))
    assert v == pytest.approx(math.sqrt(2), abs=1e-9)
    assert _eval(spark, dist.l2_dist(_arr([1.0, 2.0]), _arr([1.0, 2.0]))) == 0.0


def test_angular(spark):
    # orthogonal -> 1, identical -> 0, opposite -> 2 (distance_test.py)
    assert _eval(spark, dist.angular_dist(_arr([1.0, 0.0]), _arr([0.0, 1.0]))) == pytest.approx(1.0)
    assert _eval(spark, dist.angular_dist(_arr([1.0, 1.0]), _arr([1.0, 1.0]))) == pytest.approx(0.0, abs=1e-9)
    assert _eval(spark, dist.angular_dist(_arr([1.0, 1.0]), _arr([-1.0, -1.0]))) == pytest.approx(2.0)


def test_hamming(spark):
    a = _arr([True, False, True, False], "array<boolean>")
    b = _arr([True, True, False, False], "array<boolean>")
    assert _eval(spark, dist.hamming_dist(a, b)) == pytest.approx(0.5)
    assert _eval(spark, dist.hamming_dist(a, a)) == 0.0


def test_jaccard(spark):
    a = _arr([1, 2, 3], "array<int>")
    b = _arr([2, 3, 4], "array<int>")
    assert _eval(spark, dist.jaccard_dist(a, b)) == pytest.approx(1 - 2 / 4)
    # empty sets -> similarity 0 -> distance 1 (jaccard_test.py, distance.py:12-16)
    e = _arr([], "array<int>")
    assert _eval(spark, dist.jaccard_dist(e, e)) == pytest.approx(1.0)
    assert _eval(spark, dist.jaccard_dist(a, a)) == pytest.approx(0.0)


def test_jaccard_validity(spark):
    # d >= 1-1e-5 is invalid (distance.py:38)
    assert _eval(spark, dist.jaccard_valid(F.lit(0.5)))
    assert not _eval(spark, dist.jaccard_valid(F.lit(1.0)))


def test_norms_and_unit(spark):
    assert _eval(spark, dist.norm_sq(_arr([3.0, 4.0]))) == pytest.approx(25.0)
    assert _eval(spark, dist.norm_l2(_arr([3.0, 4.0]))) == pytest.approx(5.0)
    u = _eval(spark, dist.unit_vec(_arr([3.0, 4.0])))
    assert u == pytest.approx([0.6, 0.8])


def test_metric_dispatch_unknown(spark):
    with pytest.raises(ValueError):
        dist.metric_dist("cosine??", F.lit([1.0]), F.lit([1.0]))
