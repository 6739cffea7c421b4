"""applyInPandasWithState running top-k: streaming result converges to the
batch oracle across multiple micro-batches."""

import json

import pytest

from bigvectorbench_spark.streaming import stateful as sst


@pytest.fixture()
def batches():
    # two micro-batches per key; global top-3 spans both
    b1 = [("q1", 1, 0.9), ("q1", 2, 0.1), ("q1", 3, 0.5), ("q2", 1, 0.4)]
    b2 = [("q1", 4, 0.2), ("q1", 5, 0.8), ("q2", 2, 0.3), ("q2", 3, 0.35)]
    return b1, b2


def test_streaming_topk_converges_to_batch(spark, tmp_path, batches):
    b1, b2 = batches
    src = tmp_path / "src"
    src.mkdir()
    for name, batch in [("a", b1), ("b", b2)]:
        (src / f"{name}.json").write_text(
            "\n".join(json.dumps({"key": k, "id": i, "score": s}) for k, i, s in batch))

    stream = spark.readStream.schema("key string, id bigint, score double").option(
        "maxFilesPerTrigger", 1).json(str(src))
    out = sst.streaming_topk(stream, k=3)
    q = (out.writeStream.format("memory").queryName("topk_sink")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()

    # latest emission per key = final state
    sink = spark.sql("select * from topk_sink").collect()
    final = {}
    for r in sink:
        final.setdefault((r["key"], r["rank"]), []).append((r["id"], r["score"]))
    # build final per-key list from the LAST update (memory sink appends
    # updates; the last occurrence per (key, rank) is the converged one)
    latest = {}
    for r in sink:
        latest[(r["key"], r["rank"])] = (r["id"], r["score"])

    all_rows = spark.createDataFrame(b1 + b2, "key string, id bigint, score double")
    oracle = {(r["key"], r["rank"]): (r["id"], r["score"])
              for r in sst.topk_batch(all_rows, k=3).collect()}
    assert latest == oracle


def test_topk_batch_tiebreak(spark):
    df = spark.createDataFrame(
        [("k", 5, 0.5), ("k", 2, 0.5), ("k", 9, 0.1)], "key string, id bigint, score double")
    rows = sst.topk_batch(df, k=2).orderBy("rank").collect()
    assert [(r["id"], r["rank"]) for r in rows] == [(9, 1), (2, 2)]  # id asc on tie
