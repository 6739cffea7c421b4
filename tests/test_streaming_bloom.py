"""Mid-stream Bloom decontamination (VERDICT r8 ask #8): streamed flags
are bit-identical to the batch probe, the final state agrees with the
batch bloom_decontaminate_report, and a replayed micro-batch overwrites
itself (exactly-once file sink)."""

import json

import pytest
from pyspark.sql import functions as F

from bigvectorbench_spark.functions import text as tx
from bigvectorbench_spark.operators import bloom as bl
from bigvectorbench_spark.operators.curation import (
    bloom_decontaminate_report, rolling_window_hashes, token_hashes)
from bigvectorbench_spark.streaming.ingest import (
    bloom_probe_batch, streaming_bloom_decontaminate)
from bigvectorbench_spark.streaming.search import search_batch

EVAL_MOD, NGRAM = 7, 3


@pytest.fixture(scope="module")
def docs(spark):
    """60 docs; id % 7 == 0 are the eval inventory.  Train docs whose id
    % 5 == 1 embed a verbatim eval phrase (true contamination); the rest
    are distinct."""
    rows = []
    for i in range(60):
        if i % EVAL_MOD == 0:
            text = f"secret eval question number {i} about spark shuffles"
        elif i % 5 == 1:
            ev = EVAL_MOD * ((i % 3) + 1)
            text = (f"prefix words {i} secret eval question number {ev} "
                    f"about spark shuffles trailing {i}")
        else:
            text = f"ordinary training document {i} with unique tokens t{i}"
        rows.append((i, text, "web" if i % 2 == 0 else "code"))
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, source string").cache()


def _eval_inventory(docs):
    return (docs.filter(F.col("doc_id") % EVAL_MOD == 0)
            .select(F.array_distinct(rolling_window_hashes(
                token_hashes(tx.tokens(F.col("text"))), NGRAM)).alias("whs"))
            .select(F.explode("whs").alias("wh")).distinct())


def _train(docs):
    return docs.filter(F.col("doc_id") % EVAL_MOD != 0)


def test_streaming_flags_match_batch_and_report(spark, tmp_path, docs):
    eval_whs = _eval_inventory(docs).cache()
    m_bits, k = bl.bloom_params(eval_whs.count(), 1e-6)
    bm = bl.bloom_build(eval_whs, "wh", m_bits=m_bits, k=k)

    train = _train(docs)
    src = tmp_path / "docs"
    src.mkdir()
    rows = train.collect()
    for part, chunk in enumerate([rows[:20], rows[20:40], rows[40:]]):
        (src / f"{part}.json").write_text("\n".join(
            json.dumps({"doc_id": r["doc_id"], "text": r["text"],
                        "source": r["source"]}) for r in chunk))
    stream = spark.readStream.schema(
        "doc_id bigint, text string, source string").option(
        "maxFilesPerTrigger", 1).json(str(src))
    out = str(tmp_path / "flags")
    streaming_bloom_decontaminate(
        stream, bm, out, str(tmp_path / "ckpt"),
        m_bits=m_bits, k=k, ngram=NGRAM)

    got = spark.read.parquet(out)
    # every train doc flows through exactly once, text dropped
    assert got.count() == train.count()
    assert set(got.columns) == {"doc_id", "source", "bloom_hit", "batch"}

    # streamed flags are bit-identical to the batch probe (same ladder)
    batch_flags = {r["doc_id"]: r["bloom_hit"] for r in bloom_probe_batch(
        train, bm, m_bits=m_bits, k=k, ngram=NGRAM).collect()}
    assert {r["doc_id"]: r["bloom_hit"] for r in got.collect()} == batch_flags

    # final-state parity vs the batch report: per-group train counts
    # agree, and the streamed flags form a superset of the exact
    # contamination (no false negatives — the report's own gate)
    report = {r["source"]: r for r in bloom_decontaminate_report(
        docs, eval_mod=EVAL_MOD, ngram=NGRAM, fp_rate=1e-6).collect()}
    streamed = {r["source"]: r for r in (
        got.groupBy("source").agg(
            F.count("*").alias("n_train"),
            F.sum(F.col("bloom_hit").cast("int")).alias("n_bloom"))
        .collect())}
    assert set(report) == set(streamed)
    for g in report:
        assert streamed[g]["n_train"] == report[g]["n_train"]
        assert streamed[g]["n_bloom"] >= report[g]["n_contaminated"]
        assert report[g]["superset_ok"] and report[g]["fp_extra_ok"]
    # the fixture really plants contamination — the gate is not vacuous
    assert sum(r["n_contaminated"] for r in report.values()) > 0


def test_streaming_bloom_replay_is_idempotent(spark, tmp_path, docs):
    """A crash-replayed micro-batch overwrites its own batch= partition."""
    eval_whs = _eval_inventory(docs)
    m_bits, k = bl.bloom_params(eval_whs.count(), 1e-6)
    bm = bl.bloom_build(eval_whs, "wh", m_bits=m_bits, k=k)
    train = _train(docs).limit(10).cache()
    out = str(tmp_path / "replay")
    for _ in range(2):  # same (batch_df, batch_id) twice -> ONE copy
        search_batch(train, 3, out, search_fn=lambda b: bloom_probe_batch(
            b, bm, m_bits=m_bits, k=k, ngram=NGRAM))
    got = spark.read.parquet(out)
    assert got.count() == 10
    assert got.select("batch").distinct().collect()[0]["batch"] == 3
