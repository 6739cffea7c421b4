"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for the 100 TB design point and merely *sized down* for
local testing: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), Arrow on (all pandas-UDF kernels are Arrow-batched), UTC session
timezone (deterministic timestamp semantics vs the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB these would be cluster-level conf (shuffle partitions sized to
# ~128 MB per task, executor-count-aware); locally we size to the core count.
_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.shuffle.partitions": "32",
    # ARRAY<FLOAT> vectors decode fastest with the vectorized reader.
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Queries are broadcast by design; keep the threshold generous so the
    # query side of every kNN join stays a broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # The driver's events table stores TIMESTAMP(NANOS), which Spark's
    # reader rejects by default; read as long and convert in load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # InferFiltersFromGenerate copies the ENTIRE generator child expression
    # into an inferred `size(child) > 0 AND isnotnull(child)` filter, which
    # predicate pushdown then carries below projections — substituting every
    # column alias with its full expression.  For explode-of-computed-array
    # pipelines (window hashes, shingles) the array expression contains a
    # higher-order lambda over a tokenized column, and after substitution the
    # tokenizer lands INSIDE the lambda, re-evaluated once per array element:
    # measured 25s → 5.3s on the 5k-doc Zipf decontamination query, with the
    # duplicated filter running single-threaded in the pre-repartition scan
    # task.  The rule's benefit (dropping empty-array rows before Generate)
    # is negligible for these plans; operators that want it add an explicit
    # cheap size() filter on the materialized column instead (curation.py).
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    "spark.driver.memory": "8g",
}


def get_spark(app_name: str = "bigvectorbench-spark", **overrides: str) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores),
    mirroring the reference's ``--cpuset-cpus`` knob (main.py:387-429).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    for k, v in {**_DEFAULTS, **overrides}.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
