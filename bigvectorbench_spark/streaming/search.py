"""Streaming vector search: query vectors arrive as a stream, the corpus
(or its index artifact) is static — the serving shape of every production
vector store (the reference's backends hold the index server-side and take
query traffic; reference runner.py:195-226 batch protocol).

Spark-first recasting: each micro-batch of queries is one BATCH kNN
against the static corpus — the whole batch-side machinery (broadcast
query block, kernel partial top-k, index pruning, exact refine) is reused
verbatim through ``foreachBatch``, and results land under ``batch=<id>/``
via dynamic partition overwrite, so a crash-replayed micro-batch
overwrites its own partitions instead of appending duplicates —
exactly-once file-sink semantics with the batch id as the partition key
(the ``append_shard_batch`` discipline, streaming/ingest.py).

State design for 100 TB: there is NO streaming state at all — the index
is a static artifact (parquet codes/centroids/graphs, re-servable across
jobs), each micro-batch is an independent bounded job, and the sink is
partition-atomic.  Corpus updates compose through the incremental path
(``ivf_delta`` — assign-only, no refit) rather than through stream state.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F


def search_batch(batch_df: DataFrame, batch_id: int, path: str, *,
                 search_fn: Callable[[DataFrame], DataFrame]) -> None:
    """Idempotent micro-batch search: run ``search_fn`` (any batch search —
    ``knn(train, q)``, ``BQIndex.search(codes, q)``, ``ivf.search`` …)
    on the arrived query block and write its result under ``batch=<id>/``
    with dynamic partition overwrite (replay-safe, see module doc)."""
    res = search_fn(batch_df).withColumn(
        "batch", F.lit(int(batch_id)).cast("long"))
    # the conf must be set on the session the WRITE runs under — that is
    # the RESULT's session (search_fn usually roots the plan in the static
    # corpus's session, not the micro-batch's streaming clone; setting the
    # mode on batch_df.sparkSession alone leaves the write in static mode,
    # which silently clobbers every earlier batch= partition)
    spark = res.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        res.write.mode("overwrite").partitionBy("batch").parquet(path)
    finally:
        spark.conf.set(key, old)


def streaming_search(query_stream: DataFrame, path: str,
                     checkpoint_path: str, *,
                     search_fn: Callable[[DataFrame], DataFrame],
                     await_termination: bool = True):
    """Drive ``search_batch`` over a query stream.  ``availableNow``
    drains the backlog and stops (the test/backfill shape); drop the
    trigger for continuous serving.  The result table at ``path`` is the
    reference's result-tree analog, keyed by micro-batch."""
    q = (
        query_stream.writeStream
        .foreachBatch(lambda b, i: search_batch(
            b, i, path, search_fn=search_fn))
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def streaming_knn(query_stream: DataFrame, train: DataFrame, path: str,
                  checkpoint_path: str, *, k: int = 10,
                  metric: str = "euclidean", method: str = "expr",
                  await_termination: bool = True):
    """Convenience wiring: exact batch kNN per micro-batch.  ``method``
    follows operators.knn (expr = Catalyst-visible; gemm collects the
    micro-batch's queries — bounded by the trigger — for the kernel)."""
    from bigvectorbench_spark.operators.knn import knn

    return streaming_search(
        query_stream, path, checkpoint_path,
        search_fn=lambda q: knn(train, q, k=k, metric=metric, method=method),
        await_termination=await_termination)
