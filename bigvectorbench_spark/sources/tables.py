"""Standard loader for the driver's synthetic tables (TESTDATA.md).

Handles the one physical-type quirk: ``events.ts`` is parquet
TIMESTAMP(NANOS), which Spark reads (under ``nanosAsLong``) as a raw long.
Values carry only microsecond precision, so ``timestamp_micros(ns div 1000)``
is a lossless conversion that matches what DuckDB sees natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name in ("events", "orders", "lineitem"):
        # self-sufficient under ANY session (the driver builds its own):
        # nanosAsLong is required to read events at all, and UTC pins
        # timestamp semantics to match the DuckDB oracle's naive timestamps
        # regardless of host timezone.  Both confs are runtime-settable.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division: ns / 1000 in DOUBLE loses precision at epoch scale
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
