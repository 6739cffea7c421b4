"""SQ8-style quantization: reconstruction error bounds and near-exact recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigvectorbench_spark.operators import quantize as qz
from bigvectorbench_spark.operators.knn import knn
from tests.conftest import make_blobs


def test_quantize_roundtrip_error(spark):
    X = make_blobs(50, 16, seed=3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(50)], "id bigint, vec array<float>")
    rt = qz.quantize_table(df).select(
        "id", "vec", qz.dequantize_vec(F.col("qvec")).alias("deq"))
    for r in rt.collect():
        v, d = np.array(r["vec"]), np.array(r["deq"])
        # error bounded by scale/2 = max|v|/254 per component
        assert np.abs(v - d).max() <= np.abs(v).max() / 254 + 1e-6


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame([(0, [0.0, 0.0])], "id bigint, vec array<float>")
    r = qz.quantize_table(df).select(qz.dequantize_vec(F.col("qvec")).alias("d")).collect()[0]
    assert r["d"] == [0.0, 0.0]


def test_knn_quantized_recall(spark):
    X = make_blobs(600, 16, seed=5)
    train = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(500)], "id bigint, vec array<float>")
    test = spark.createDataFrame(
        [(i, [float(x) for x in X[500 + i]]) for i in range(30)], "qid bigint, vec array<float>")
    exact = knn(train, test, k=10, method="expr")
    tq = qz.quantize_table(train).drop("vec")
    approx = qz.knn_quantized(tq, test, k=10, method="expr")
    e = {}
    for r in exact.collect():
        e.setdefault(r["qid"], set()).add(r["id"])
    a = {}
    for r in approx.collect():
        a.setdefault(r["qid"], set()).add(r["id"])
    recall = np.mean([len(a[q] & e[q]) / 10 for q in e])
    assert recall > 0.97  # int8 error is tiny relative to blob separation
