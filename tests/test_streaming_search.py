"""Streaming vector search: per-micro-batch kNN equals the batch oracle,
index-backed serving composes, and a replayed batch overwrites itself."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigvectorbench_spark.operators.bq import BQIndex
from bigvectorbench_spark.operators.knn import knn
from bigvectorbench_spark.streaming.search import search_batch, streaming_knn, streaming_search
from tests.conftest import make_blobs


@pytest.fixture()
def corpus(spark):
    X = make_blobs(300, 16, seed=43)
    return X, spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(300)],
        "id bigint, vec array<float>")


def _write_query_files(tmp_path, X, groups):
    src = tmp_path / "queries"
    src.mkdir()
    for name, qids in groups:
        (src / f"{name}.json").write_text("\n".join(
            json.dumps({"qid": int(q), "vec": [float(x) for x in X[q]]})
            for q in qids))
    return src


def test_streaming_knn_matches_batch_oracle(spark, tmp_path, corpus):
    X, train = corpus
    src = _write_query_files(tmp_path, X, [("a", [0, 1, 2]), ("b", [3, 4])])
    stream = spark.readStream.schema("qid bigint, vec array<float>").option(
        "maxFilesPerTrigger", 1).json(str(src))
    out = str(tmp_path / "results")
    streaming_knn(stream, train, out, str(tmp_path / "ckpt"), k=5)

    got = spark.read.parquet(out)
    # batching granularity is the trigger's business (availableNow may fold
    # the backlog); the contract is the partition layout + the values
    assert got.select("batch").distinct().count() >= 1
    allq = train.filter(F.col("id") < 5).select(
        F.col("id").alias("qid"), "vec")
    oracle = sorted((r["qid"], r["rank"], r["id"])
                    for r in knn(train, allq, k=5, method="expr").collect())
    assert sorted((r["qid"], r["rank"], r["id"]) for r in got.collect()) == oracle


def test_streaming_search_with_bq_index(spark, tmp_path, corpus):
    """Index-backed serving: the static artifact (BQ codes) is built once;
    each micro-batch searches it through the same search_fn the batch
    path uses."""
    X, train = corpus
    idx = BQIndex.fit(train, sort_col="id")
    codes = idx.encode(train, keep=["id"]).cache()
    codes.count()
    src = _write_query_files(tmp_path, X, [("a", [10, 11]), ("b", [12])])
    stream = spark.readStream.schema("qid bigint, vec array<float>").option(
        "maxFilesPerTrigger", 1).json(str(src))
    out = str(tmp_path / "bq_results")
    streaming_search(
        stream, out, str(tmp_path / "bq_ckpt"),
        search_fn=lambda q: idx.search(codes, q, k=5, refine_train=train,
                                       overfetch=60))  # full-cover: exact
    got = spark.read.parquet(out)
    allq = train.filter(F.col("id").isin([10, 11, 12])).select(
        F.col("id").alias("qid"), "vec")
    oracle = sorted((r["qid"], r["rank"], r["id"])
                    for r in knn(train, allq, k=5, method="expr").collect())
    assert sorted((r["qid"], r["rank"], r["id"]) for r in got.collect()) == oracle


def test_search_batch_replay_is_idempotent(spark, tmp_path, corpus):
    """A crash-replayed micro-batch overwrites its own batch= partition:
    running the same (batch_df, batch_id) twice leaves ONE copy."""
    X, train = corpus
    q = train.filter("id < 3").select(F.col("id").alias("qid"), "vec")
    out = str(tmp_path / "replay")
    fn = lambda b: knn(train, b, k=4, method="expr")
    search_batch(q, 7, out, search_fn=fn)
    search_batch(q, 7, out, search_fn=fn)   # replay
    got = spark.read.parquet(out)
    assert got.count() == 12                 # 3 qids × k, not doubled
    assert [r["batch"] for r in got.select("batch").distinct().collect()] == [7]
