"""Streaming ingestion into the training-shard layout: consistent shard
membership across micro-batches, batch-partitioned files, and idempotent
batch replay (the exactly-once property of the batch=<id> partition key)."""

import json
import os

from bigvectorbench_spark.streaming.ingest import (
    append_shard_batch, stream_append_shards)


def _write_file(path, rows, mtime):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(path, (mtime, mtime))


def test_stream_append_shards_layout_and_membership(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_file(str(src / "a.json"),
                [{"doc_id": i, "text": f"t{i}"} for i in range(80)], 1000)
    _write_file(str(src / "b.json"),
                [{"doc_id": i, "text": f"t{i}"} for i in range(80, 140)], 2000)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).json(str(src))
    )
    out = str(tmp_path / "shards")
    stream_append_shards(stream, out, str(tmp_path / "ck"), n_shards=4,
                         seed=42)

    batches = sorted(p.name for p in (tmp_path / "shards").iterdir()
                     if p.name.startswith("batch="))
    assert batches == ["batch=0", "batch=1"]

    back = spark.read.parquet(out)
    assert back.count() == 140
    # shard membership is batch-independent and equals the bulk writer's
    from bigvectorbench_spark.operators.packing import shard_assign
    df = spark.createDataFrame([(i, f"t{i}") for i in range(140)],
                               "doc_id long, text string")
    want = {r["doc_id"]: r["shard"]
            for r in shard_assign(df, n_shards=4, seed=42).collect()}
    for r in back.select("doc_id", "shard").collect():
        assert want[r["doc_id"]] == r["shard"]


def test_append_shard_batch_replay_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "shards")
    b0 = spark.createDataFrame([(i, f"t{i}") for i in range(50)],
                               "doc_id long, text string")
    b1 = spark.createDataFrame([(i, f"t{i}") for i in range(50, 90)],
                               "doc_id long, text string")
    append_shard_batch(b0, 0, out, n_shards=4, seed=42)
    append_shard_batch(b1, 1, out, n_shards=4, seed=42)
    assert spark.read.parquet(out).count() == 90
    # crash-replay of batch 1: overwrites its own partitions, no dups
    append_shard_batch(b1, 1, out, n_shards=4, seed=42)
    back = spark.read.parquet(out)
    assert back.count() == 90
    assert back.select("doc_id").distinct().count() == 90
    # and batch 0's files were untouched by batch 1's dynamic overwrite
    assert spark.read.parquet(out).filter("batch = 0").count() == 50
