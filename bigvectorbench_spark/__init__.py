"""bigvectorbench_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of BenchCouncil/BigVectorBench.

The reference (/root/reference, read-only snapshot 2025-02-22) is a vector-DB
benchmark harness; its query surface is k-nearest-neighbor search over
dense/sparse/binary vector tables under four metrics, optionally constrained
by scalar predicates, over multiple vectors per row, or cross-modal — plus
ground-truth computation, DML latency workloads, and a
recall/QPS/percentile/Pareto metrics pipeline (SURVEY.md §2).

This package re-expresses that surface Spark-first:

- vectors are ``ARRAY<FLOAT>`` columns in Parquet-backed DataFrames;
- every operator is a function ``DataFrame -> DataFrame`` built from
  ``pyspark.sql.functions`` so Catalyst can push filters, prune columns and
  broadcast the (always small) query side;
- the only Python-side kernels are Arrow-batched (``mapInPandas`` GEMM
  scoring) and only where they beat whole-stage codegen.
"""

from bigvectorbench_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
