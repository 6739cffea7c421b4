"""Structured Streaming ingest — the Spark analog of the reference's
sequential-mutation workloads (SURVEY §2.6 note: the reference has no stream
operators; its insert/update/delete latency sweeps, runner.py:245-335, map to
micro-batch ingest here).

Pattern: ``readStream`` (file or rate source) → ``foreachBatch`` upsert into
a log-structured parquet table — each micro-batch is appended with a
monotonically increasing batch id, and readers resolve latest-version rows
exactly like ``operators/mutation.py``.  Per-micro-batch wall clock is the
latency metric Spark can honestly report (SURVEY §7 hard part 6: per-query
millisecond serving latency is out of scope by design).

At scale this is the standard Delta-style CDC pattern: watermarked event-time
windows for aggregation live in ``windowed_event_counts`` below.
"""

from __future__ import annotations

import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_upsert_to_table(
    stream: DataFrame,
    table_path: str,
    checkpoint_path: str,
    *,
    id_col: str = "id",
    await_termination: bool = True,
):
    """Micro-batch upsert: each batch lands as parquet with (__seq=batch_id,
    __op='u') columns; ``read_upsert_table`` resolves latest-per-id.  Uses
    availableNow so tests and backfills drain the source and stop."""
    batch_times: list[tuple[int, float]] = []

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.perf_counter()
        (
            batch_df.withColumn("__seq", F.lit(batch_id + 1).cast("long"))
            .write.mode("append")
            .parquet(table_path)
        )
        batch_times.append((batch_id, time.perf_counter() - t0))

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q, batch_times


def read_upsert_table(spark: SparkSession, table_path: str, id_col: str = "id") -> DataFrame:
    """Latest-version view of a stream-upserted table."""
    from pyspark.sql import Window

    df = spark.read.parquet(table_path)
    w = Window.partitionBy(id_col).orderBy(F.col("__seq").desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__seq")
    )


def windowed_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "1 hour",
    group_col: Optional[str] = "event_type",
) -> DataFrame:
    """Tumbling-window counts with a watermark for late data — works on both
    a streaming and a batch DataFrame (same plan; batch ignores the
    watermark), so the oracle can check it in batch mode."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), window_duration).alias("w")]
    if group_col:
        keys.append(F.col(group_col))
    out = df.groupBy(*keys).agg(F.count("*").alias("n_events"))
    return out.select(
        F.col("w.start").alias("window_start"),
        *([group_col] if group_col else []),
        "n_events",
    )


def sessionize(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Session windows (gap-based).  Streaming uses Spark's native
    ``session_window``; the same call works in batch for oracle checking.
    Output: (user_id, session_start, session_end, n_events)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, gap)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("s"), F.col(user_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(
    stream: DataFrame,
    *,
    id_cols: "list[str] | tuple[str, ...]" = ("id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact in-flight dedup with bounded state: emit the first occurrence
    of each key, drop re-arrivals within the watermark horizon, and evict
    key state once the watermark passes it.

    This is the streaming form of ``operators/dedup.py::exact_dedup`` for
    continuous ingest: state size is bounded by (arrival rate × horizon),
    never corpus size, which is what makes exact dedup feasible on an
    unbounded stream — the batch operator re-keys the whole corpus; this
    one only remembers the recent past and relies on a downstream batch
    compaction for cross-horizon duplicates (the standard lambda split).

    Uses ``dropDuplicatesWithinWatermark`` (Spark 3.5+): duplicates are
    dropped when they arrive while the first occurrence is still in state;
    rows pass through immediately (append mode, no emission latency).
    In batch mode falls back to plain ``dropDuplicates`` so the same call
    is oracle-checkable.
    """
    cols = list(id_cols)
    if not stream.isStreaming:
        return stream.dropDuplicates(cols)
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(cols)


def streaming_pii_scrub(
    stream: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    group_col: str = "source",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Continuous PII accounting over a document stream: the stateless
    detect/redact scan (operators/curation.py rules — regexes evaluated in
    whole-stage codegen per micro-batch, identical semantics to the batch
    ``pii_scrub_report``) feeding a watermarked tumbling-window rollup per
    group.  State is one counter row per (window, group) — bounded by the
    watermark horizon, never by stream length.

    The split mirrors how a curation pipeline deploys: the REDACTED text
    continues downstream (callers keep the ``redacted`` column from
    ``pii_redact``); this rollup is the monitoring leg.  In batch mode the
    same call degrades to a per-group batch report with a window column,
    so the operator is oracle-checkable on static data.
    """
    from bigvectorbench_spark.operators.curation import pii_counts

    c = pii_counts(F.col(text_col))
    scanned = stream.select(
        F.col(ts_col), F.col(group_col),
        c["email"].alias("n_email"),
        c["phone"].alias("n_phone"),
        c["ip"].alias("n_ip"),
    )
    if stream.isStreaming:
        scanned = scanned.withWatermark(ts_col, watermark)
    return (
        scanned.groupBy(F.window(ts_col, window).alias("win"),
                        F.col(group_col))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_email").cast("bigint").alias("n_emails"),
            F.sum("n_phone").cast("bigint").alias("n_phones"),
            F.sum("n_ip").cast("bigint").alias("n_ips"),
            F.sum(((F.col("n_email") + F.col("n_phone") + F.col("n_ip")) > 0)
                  .cast("int")).cast("bigint").alias("n_docs_with_pii"),
        )
    )


def append_shard_batch(batch_df: DataFrame, batch_id: int, path: str, *,
                       n_shards: int = 32, seed: int = 42,
                       id_col: str = "doc_id") -> None:
    """Idempotent micro-batch shard append: the batch is shard-assigned
    with the SAME seeded hash as ``packing.write_shards`` (so shard
    membership is consistent across batches and with any earlier bulk
    write-then-stream handoff), ordered within shard, and written under
    ``batch=<id>/shard=<k>/`` via DYNAMIC partition overwrite.  A
    replayed batch — foreachBatch re-runs its last batch after a crash —
    OVERWRITES its own ``batch=<id>`` partitions instead of appending
    duplicates: exactly-once file-sink semantics without a transaction
    log, because the batch id IS the partition key.  Loaders read
    ``path`` recursively; the shard column spans batches."""
    from bigvectorbench_spark.operators.packing import shard_assign

    spark = batch_df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        a = shard_assign(batch_df, n_shards=n_shards, seed=seed,
                         id_col=id_col)
        okey = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"o{int(seed)}|"),
                               F.col(id_col).cast("string"))), 1, 8),
            16, 10).cast("bigint")
        (
            a.withColumn("order_key", okey)
            .withColumn("batch", F.lit(int(batch_id)).cast("long"))
            .repartition(n_shards, "shard")
            .sortWithinPartitions("shard", "order_key")
            .write.mode("overwrite").partitionBy("batch", "shard")
            .parquet(path)
        )
    finally:
        spark.conf.set(key, old)


def stream_append_shards(stream: DataFrame, path: str,
                         checkpoint_path: str, *, n_shards: int = 32,
                         seed: int = 42, id_col: str = "doc_id",
                         await_termination: bool = True):
    """Streaming ingestion into the training-shard layout: every
    micro-batch lands via ``append_shard_batch`` (idempotent replay —
    see there), checkpointed so a restart resumes at the next batch.
    ``availableNow`` drains the backlog and stops, the pattern tests and
    backfills use; drop the trigger for continuous tailing."""
    q = (
        stream.writeStream
        .foreachBatch(lambda b, i: append_shard_batch(
            b, i, path, n_shards=n_shards, seed=seed, id_col=id_col))
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def bloom_probe_batch(batch_df: DataFrame, bloom, *, m_bits: int,
                      k: int, ngram: int = 8, id_col: str = "doc_id",
                      text_col: str = "text",
                      group_col: str = "source") -> DataFrame:
    """One stateless decontamination pass over a (micro-)batch of
    documents: tokenize → token hashes → distinct rolling ``ngram``-window
    hashes → ``bloom_probe_any`` against the STATIC bitmap — the exact
    hash ladder of ``curation.bloom_decontaminate_report``'s probe side,
    so streamed flags are bit-identical to the batch report's.  Returns
    (id, group, bloom_hit); the text column is dropped after hashing so
    only fixed-width rows flow to the sink.

    ``bloom``: raw bytes or a ``Broadcast`` handle — a per-trigger caller
    should pass the handle (see ``streaming_bloom_decontaminate``) so the
    bitmap ships once, not per micro-batch.

    A micro-batch arriving as fewer input splits than the cluster has
    cores is REPARTITIONED before the hash ladder: a one-file 25k-doc
    trigger otherwise runs the whole tokenize→hash→probe ladder on ONE
    core — measured p50 15.8 s/batch where the spread ladder reads ~1 s
    (SCALE_BLOOM_STREAM_r10.json before/after; the tiny-bitmap control
    pinned the cost to the single-partition ladder, not the bitmap).
    The reshuffle moves only the raw micro-batch (bounded by the trigger
    size) and is skipped when the input already carries ≥cores splits —
    the backfill/availableNow case."""
    from bigvectorbench_spark.functions import text as tx
    from bigvectorbench_spark.operators import bloom as bl
    from bigvectorbench_spark.operators.curation import (
        rolling_window_hashes, token_hashes)

    par = batch_df.sparkSession.sparkContext.defaultParallelism
    if batch_df.rdd.getNumPartitions() < par:
        batch_df = batch_df.repartition(par)

    # Staged projections, NOT one inline expression: rolling_window_hashes
    # references its input in the per-window lambda, and an INLINE
    # tokenize+hash expression would re-evaluate there PER WINDOW (~100x
    # per doc — measured: the 500k-doc probe went from minutes-grade to
    # 24+ min before this split).  With th materialized as a column, the
    # CollapseProject duplicate-reference guard keeps it evaluated once
    # (the curation.py tokenized-frame discipline).
    whs = (batch_df
           .select(F.col(id_col), F.col(group_col),
                   tx.tokens(F.col(text_col)).alias("tk"))
           .select(id_col, group_col, token_hashes(F.col("tk")).alias("th"))
           .select(id_col, group_col,
                   F.array_distinct(rolling_window_hashes(F.col("th"), ngram))
                   .alias("whs")))
    return bl.bloom_probe_any(whs, "whs", bloom, m_bits=m_bits, k=k,
                              out_col="bloom_hit").drop("whs")


def streaming_bloom_decontaminate(
    doc_stream: DataFrame, bloom: bytes, path: str, checkpoint_path: str, *,
    m_bits: int, k: int, ngram: int = 8, id_col: str = "doc_id",
    text_col: str = "text", group_col: str = "source",
    await_termination: bool = True):
    """Mid-stream eval decontamination (VERDICT r8 ask #8): arriving
    documents probe a STATIC Bloom bitmap artifact — the zero-state
    streaming shape ``streaming/search.py`` establishes (the bitmap is
    built once from the eval inventory by ``bloom.bloom_build``, is
    broadcast ONCE at stream setup, and holds NO stream state), composed
    into the same dedup/PII ingest stage family.  One-sided error carries
    over: a flagged document is possibly contaminated (bounded fp), an
    unflagged one is definitely clean — the direction decontamination
    tolerates, so downstream consumers can drop flagged rows in-flight.

    Two serving-path findings from measuring at the 49.9M-hash inventory
    (SCALE_BLOOM_STREAM_r10.json): the bitmap broadcasts ONCE here and
    every trigger reuses the handle (hygiene — the 188 MB bitmap must not
    re-ship per micro-batch; measured cost-neutral at this scale since
    workers cache the value, but it bounds driver/JVM churn), and — the
    actual defect the measurement caught — a one-file micro-batch ran the
    whole hash ladder on one core (p50 15.8 s/batch); bloom_probe_batch
    now spreads thin micro-batches across the cluster before the ladder.

    Results land under ``batch=<id>/`` with dynamic partition overwrite
    (the ``search_batch`` sink): a crash-replayed micro-batch overwrites
    its own partitions — exactly-once file-sink semantics.  Final-state
    parity with the batch ``bloom_decontaminate_report`` is pinned in
    test_streaming_bloom."""
    from bigvectorbench_spark.streaming.search import streaming_search

    bc = doc_stream.sparkSession.sparkContext.broadcast(bloom)
    return streaming_search(
        doc_stream, path, checkpoint_path,
        search_fn=lambda b: bloom_probe_batch(
            b, bc, m_bits=m_bits, k=k, ngram=ngram, id_col=id_col,
            text_col=text_col, group_col=group_col),
        await_termination=await_termination)
