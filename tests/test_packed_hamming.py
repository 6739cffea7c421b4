"""Packed-binary hamming: pack_bits round-trip + kNN parity with the
boolean-array path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigvectorbench_spark.functions import distance as dx
from bigvectorbench_spark.operators import knn as knn_ops


def test_pack_bits_values(spark):
    df = spark.createDataFrame([([True] + [False] * 63 + [True, True],)], "b array<boolean>")
    words = df.select(dx.pack_bits(F.col("b")).alias("w")).collect()[0]["w"]
    assert len(words) == 2
    assert words[0] == -(2 ** 63)  # first bit -> high bit of word 0
    assert words[1] == 3           # two tail bits in low positions


def test_pack_bits_empty_and_odd(spark):
    df = spark.createDataFrame([([],), ([True],)], "b array<boolean>")
    rows = df.select(F.size(dx.pack_bits(F.col("b"))).alias("n")).collect()
    assert [r["n"] for r in rows] == [0, 1]


def test_hamming_packed_matches_unpacked(spark):
    rng = np.random.RandomState(11)
    B = rng.rand(90, 70) > 0.5  # d=70: exercises the partial tail word
    train = spark.createDataFrame(
        [(i, [bool(b) for b in B[i]]) for i in range(70)], "id bigint, vec array<boolean>")
    test = spark.createDataFrame(
        [(i, [bool(b) for b in B[70 + i]]) for i in range(20)], "qid bigint, vec array<boolean>")
    a = knn_ops.knn(train, test, k=5, metric="hamming", method="expr")
    b = knn_ops.knn_hamming_packed(train, test, k=5)
    ra = [(r["qid"], r["id"], round(r["dist"], 9)) for r in a.orderBy("qid", "rank").collect()]
    rb = [(r["qid"], r["id"], round(r["dist"], 9)) for r in b.orderBy("qid", "rank").collect()]
    assert ra == rb


def test_prepacked_table(spark):
    rng = np.random.RandomState(12)
    B = rng.rand(40, 64) > 0.5
    raw = spark.createDataFrame(
        [(i, [bool(b) for b in B[i]]) for i in range(40)], "id bigint, vec array<boolean>")
    packed = raw.select("id", dx.pack_bits(F.col("vec")).alias("vec"))
    q = packed.limit(3).withColumnRenamed("id", "qid")
    res = knn_ops.knn_hamming_packed(packed, q, k=1, d=64, packed=True)
    top1 = {r["qid"]: (r["id"], r["dist"]) for r in res.collect()}
    for qid, (i, dist) in top1.items():
        assert i == qid and dist == 0.0
    with pytest.raises(ValueError):
        knn_ops.knn_hamming_packed(packed, q, k=1, packed=True)  # d required


def test_pack_signs_matches_pack_bits_composition(spark):
    """pack_signs (fused threshold+pack straight from the float column) is
    bit-identical to pack_bits applied to the thresholded booleans, at word
    boundaries and odd tails."""
    rng = np.random.RandomState(5)
    for d in (1, 63, 64, 65, 128, 130):
        X = (rng.randn(20, d) * 0.5).astype(np.float64)
        df = spark.createDataFrame(
            [(i, [float(x) for x in X[i]]) for i in range(20)],
            "id bigint, vec array<double>")
        fused = df.select("id", dx.pack_signs(F.col("vec"), d).alias("w"))
        twostep = df.select(
            "id",
            dx.pack_bits(F.transform("vec", lambda x: x > 0)).alias("w"))
        a = {r["id"]: r["w"] for r in fused.collect()}
        b = {r["id"]: r["w"] for r in twostep.collect()}
        assert a == b, d
