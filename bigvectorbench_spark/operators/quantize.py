"""Scalar quantization (SQ8 analog) — SURVEY §2.7's IVF_SQ8 capability
(milvus/module.py:595-620) expressed as a storage/bandwidth option.

Per-vector symmetric int8 quantization: ``q_i = round(v_i / scale)`` with
``scale = max|v| / 127``.  The quantized column is 4× smaller than float32
(and pairs with the packed-binary path for bits); search dequantizes inside
the scan — an approximate path whose recall loss is bounded by the
quantization error, reported the same way the reference reports SQ8 recall.

Column layout: ``struct<scale: float, q: array<tinyint>>``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigvectorbench_spark.operators.knn import knn


def quantize_vec(vec: Column) -> Column:
    """float array → struct(scale, int8 array).  Zero vectors get scale 1
    (all-zero codes)."""
    mx = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = (F.when(mx > 0, mx).otherwise(F.lit(1.0)) / F.lit(127.0)).cast("float")
    q = F.transform(vec, lambda x: F.round(x / scale).cast("tinyint"))
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_vec(qv: Column) -> Column:
    """struct(scale, q) → ARRAY<FLOAT> approximation of the original."""
    return F.transform(qv["q"], lambda x: (x.cast("float") * qv["scale"]).cast("float"))


def quantize_table(df: DataFrame, *, vec_col: str = "vec", out_col: str = "qvec") -> DataFrame:
    """Materialize the quantized column (index-build step, M2); the caller
    typically drops the float column afterwards for the 4× storage win."""
    return df.withColumn(out_col, quantize_vec(F.col(vec_col)))


def knn_quantized(
    train_q: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "euclidean",
    *,
    qvec_col: str = "qvec",
    query_vec_col: str = "vec",
    id_col: str = "id",
    qid_col: str = "qid",
    method: str = "auto",
) -> DataFrame:
    """kNN over a quantized table: dequantize in the scan projection (narrow,
    codegen) and reuse the standard kNN engine — queries stay full-precision,
    matching the reference's SQ8 semantics (only stored vectors are coded)."""
    deq = train_q.withColumn("__vec", dequantize_vec(F.col(qvec_col)))
    return knn(
        deq, queries, k, metric,
        vec_col="__vec", query_vec_col=query_vec_col,
        id_col=id_col, qid_col=qid_col, method=method,
    )
