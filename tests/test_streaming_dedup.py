"""Streaming exact dedup: first occurrence passes, in-horizon duplicates
drop, state evicts past the watermark (a post-eviction re-arrival passes
again). Scripted micro-batches via maxFilesPerTrigger=1 (mtime order)."""

import json
import os

import pytest

from bigvectorbench_spark.streaming.ingest import streaming_dedup


def _write_file(path, rows, mtime):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(path, (mtime, mtime))


def _drain(out_df, checkpoint):
    emitted = []

    def _collect(batch_df, _bid):
        emitted.extend(r.asDict() for r in batch_df.collect())

    q = (
        out_df.writeStream.foreachBatch(_collect)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return emitted


def test_streaming_dedup_drops_in_horizon_dups_and_evicts_state(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    ck = str(tmp_path / "ck")
    # batch 1: k1, k2 — both first occurrences
    _write_file(src / "f1.json", [
        {"ts": "2026-01-01 10:00:00", "key": "k1"},
        {"ts": "2026-01-01 10:05:00", "key": "k2"},
    ], mtime=1_000)
    # batch 2: k1 again while still in state (dropped); k3 at 12:00 advances
    # the watermark to 11:30, strictly past k1/k2 state expiry (first
    # occurrence + 1 h horizon = 11:00/11:05) → both evicted
    _write_file(src / "f2.json", [
        {"ts": "2026-01-01 10:06:00", "key": "k1"},
        {"ts": "2026-01-01 12:30:00", "key": "k3"},
    ], mtime=2_000)
    # batch 3: another advancer — state cleanup runs with the 11:30
    # watermark during this batch, evicting k1/k2
    _write_file(src / "f3.json", [
        {"ts": "2026-01-01 13:00:00", "key": "k4"},
    ], mtime=3_000)
    # batch 4: k1 re-arrives after eviction → passes again
    _write_file(src / "f4.json", [
        {"ts": "2026-01-01 13:30:00", "key": "k1"},
    ], mtime=4_000)

    stream = (
        spark.readStream.schema("ts timestamp, key string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    rows = _drain(streaming_dedup(stream, id_cols=["key"], watermark="1 hour"), ck)
    got = [(r["key"], str(r["ts"])) for r in sorted(rows, key=lambda r: r["ts"])]
    assert got == [
        ("k1", "2026-01-01 10:00:00"),
        ("k2", "2026-01-01 10:05:00"),
        ("k3", "2026-01-01 12:30:00"),
        ("k4", "2026-01-01 13:00:00"),
        ("k1", "2026-01-01 13:30:00"),
    ]


def test_streaming_dedup_batch_fallback(spark):
    df = spark.createDataFrame(
        [("k1", 1), ("k1", 2), ("k2", 3)], "key string, v int")
    out = streaming_dedup(df, id_cols=["key"])
    assert out.count() == 2
