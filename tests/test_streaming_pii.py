"""Streaming PII accounting: stateless scan + watermarked window rollup
(streaming/ingest.py::streaming_pii_scrub); batch fallback equivalence."""

import json
import os

from pyspark.sql import functions as F

from bigvectorbench_spark.streaming.ingest import streaming_pii_scrub


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
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return emitted


def test_streaming_pii_scrub_counts_per_window(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    _write_file(src / "f1.json", [
        {"ts": "2026-01-01 10:00:10", "source": "a",
         "text": "write to jo@x.io or ab@y.co"},
        {"ts": "2026-01-01 10:01:00", "source": "a", "text": "clean"},
        {"ts": "2026-01-01 10:02:00", "source": "b",
         "text": "call +1-555-1234"},
        {"ts": "2026-01-01 10:07:00", "source": "a",
         "text": "late window from 10.1.2.3"},
    ], mtime=1_000)
    stream = (
        spark.readStream.schema("ts timestamp, source string, text string")
        .option("maxFilesPerTrigger", "1").json(str(src))
    )
    rows = _drain(streaming_pii_scrub(stream), str(tmp_path / "ck"))
    got = {(r["win"]["start"].minute, r["source"]):
           (r["n_docs"], r["n_emails"], r["n_phones"], r["n_ips"],
            r["n_docs_with_pii"]) for r in rows}
    assert got[(0, "a")] == (2, 2, 0, 0, 1)   # 10:00 window: 2 docs, 1 w/ pii
    assert got[(0, "b")] == (1, 0, 1, 0, 1)
    assert got[(5, "a")] == (1, 0, 0, 1, 1)   # 10:05 window


def test_streaming_pii_scrub_batch_fallback_matches(spark):
    df = spark.createDataFrame(
        [("2026-01-01 10:00:10", "a", "mail x@y.zz"),
         ("2026-01-01 10:01:10", "a", "none")],
        "ts string, source string, text string",
    ).select(F.col("ts").cast("timestamp"), "source", "text")
    out = streaming_pii_scrub(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_docs"], r["n_emails"], r["n_docs_with_pii"]) == (2, 1, 1)
