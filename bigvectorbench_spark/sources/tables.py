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
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer division: ns/1000 in DOUBLE loses precision at epoch scale
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Spark 4.1 reads TIMESTAMP(NANOS) parquet as TIMESTAMP_NTZ when
            # the session planned the scan before nanosAsLong took effect.
            # With the session pinned to UTC above, NTZ -> TIMESTAMP keeps the
            # same instant DuckDB's naive epoch_us sees, and downstream
            # unix_micros/window arithmetic type-checks.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


_ROWS_CACHE: dict[str, int] = {}


def table_rows(sf_dir: str, name: str) -> int:
    """Row count from the parquet FOOTER (pyarrow metadata), no Spark job.

    Plan-construction decisions that depend on corpus size (HNSW shard
    count, adaptive query-block strides) must not cost a full-table
    ``count()`` action before the query even runs (VERDICT r5 "What's
    wrong #4") — the footer already stores the exact row count, the same
    statistic a cluster catalog serves.  Handles both a single
    ``name.parquet`` file and a directory of part files (the sharded
    layout scripts/gen_sf.py writes at sf1)."""
    import os

    path = os.path.join(sf_dir, f"{name}.parquet")
    if path in _ROWS_CACHE:
        return _ROWS_CACHE[path]
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        n = sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path) if f.endswith(".parquet"))
    else:
        n = pq.read_metadata(path).num_rows
    _ROWS_CACHE[path] = n
    return n


_DIM_CACHE: dict[tuple[str, str, str], int] = {}


def table_dim(sf_dir: str, name: str, col: str) -> int:
    """Element count of a list column's first row, read with pyarrow from
    the parquet file directly (one tiny batch, no Spark job) — the
    table_rows convention for the other plan-construction statistic
    vector operators need: the vector width.  Matches
    ``df.select(size(col)).first()`` on any table whose column width is
    uniform (every shipped embedding table)."""
    import os

    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (path, name, col)
    if key in _DIM_CACHE:
        return _DIM_CACHE[key]
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        path = next(os.path.join(path, f) for f in sorted(os.listdir(path))
                    if f.endswith(".parquet"))
    batch = next(pq.ParquetFile(path).iter_batches(batch_size=1,
                                                   columns=[col]))
    d = len(batch.column(0)[0])
    _DIM_CACHE[key] = d
    return d


def table_fingerprint(sf_dir: str, name: str) -> str:
    """Short content fingerprint from the parquet FOOTERS (no data read):
    md5 over row counts, byte sizes, and every column chunk's min/max
    statistics.  A corpus REGENERATED with a new seed keeps its shape —
    and, for incompressible float payloads, even its byte size — but the
    leaf-column value ranges virtually never survive a reseed, so
    derived-artifact cache keys that include this can't serve a stale
    index for a same-shaped, different-content corpus."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    files = (sorted(os.path.join(path, f) for f in os.listdir(path)
                    if f.endswith(".parquet"))
             if os.path.isdir(path) else [path])
    h = hashlib.md5()
    for f in files:
        md = pq.read_metadata(f)
        h.update(f"{md.num_rows}:{os.path.getsize(f)}".encode())
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for c in range(g.num_columns):
                st = g.column(c).statistics
                if st is not None:
                    h.update(repr((st.min, st.max, st.null_count)).encode())
    return h.hexdigest()[:12]
