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


def test_streaming_search_absorbs_ivf_delta_mid_stream(spark, tmp_path, corpus):
    """The serving composition the two pieces were built for (VERDICT r7
    #7): a query stream serves over an IVF index; between micro-batches a
    delta arrives and is ABSORBED (assign-only, no refit — the ivf_delta
    path); the next micro-batch sees it.  Protocol = the production
    restart shape: one availableNow drain per serving generation, same
    checkpoint, so batch 1 resumes exactly after batch 0.

    Parity: nprobe=nlist makes the IVF search exact, so batch-0 results
    must equal exact kNN on the BASE corpus and batch-1 results exact kNN
    on base+delta — and the delta rows (planted as near-copies of the
    batch-1 queries) must surface at rank 1 only after the absorb."""
    from bigvectorbench_spark.operators.similarity import IVFIndex

    X, train = corpus
    base = train.filter("id < 280")
    idx = IVFIndex.fit(base, nlist=4, seed=1, max_iter=8, sort_col="id")
    holder = {"indexed": idx.assign(base).cache()}
    holder["indexed"].count()

    out = str(tmp_path / "delta_results")
    ckpt = str(tmp_path / "delta_ckpt")
    src = tmp_path / "queries"
    src.mkdir()

    def _serve():
        stream = spark.readStream.schema("qid bigint, vec array<float>").json(
            str(src))
        streaming_search(stream, out, ckpt,
                         search_fn=lambda q: idx.search(
                             holder["indexed"], q, k=5, nprobe=4))

    # generation 1: queries 0-2 against the base index
    (src / "a.json").write_text("\n".join(
        json.dumps({"qid": int(q), "vec": [float(x) for x in X[q]]})
        for q in (0, 1, 2)))
    _serve()

    # absorb the delta: near-copies of queries 10-12 at fresh ids 1000+,
    # assigned into the EXISTING cells (no refit — similarity.ivf_delta)
    delta = spark.createDataFrame(
        [(1000 + q, [float(x) + 1e-4 for x in X[q]]) for q in (10, 11, 12)],
        "id bigint, vec array<float>")
    holder["indexed"] = holder["indexed"].unionByName(
        idx.assign(delta)).cache()
    holder["indexed"].count()

    # generation 2: queries 10-12 resume from the same checkpoint
    (src / "b.json").write_text("\n".join(
        json.dumps({"qid": int(q), "vec": [float(x) for x in X[q]]})
        for q in (10, 11, 12)))
    _serve()

    got = spark.read.parquet(out)
    batches = sorted(r["batch"] for r in got.select("batch").distinct().collect())
    assert len(batches) == 2
    b0 = got.filter(F.col("batch") == batches[0])
    b1 = got.filter(F.col("batch") == batches[1])

    def _triples(df):
        return sorted((r["qid"], r["rank"], r["id"]) for r in df.collect())

    q0 = train.filter(F.col("id").isin([0, 1, 2])).select(
        F.col("id").alias("qid"), "vec")
    q1 = train.filter(F.col("id").isin([10, 11, 12])).select(
        F.col("id").alias("qid"), "vec")
    assert _triples(b0) == _triples(knn(base, q0, k=5, method="expr"))
    full = base.unionByName(delta)
    assert _triples(b1) == _triples(knn(full, q1, k=5, method="expr"))
    # the planted near-duplicates surface at rank 1 — but only post-absorb
    top1 = {r["qid"]: r["id"] for r in b1.filter("rank = 1").collect()}
    assert top1 == {10: 10, 11: 11, 12: 12} or all(
        v in (q, 1000 + q) for q, v in top1.items())
    assert not [r for r in b0.collect() if r["id"] >= 1000]
    assert [r for r in b1.collect() if r["id"] >= 1000]


def test_streaming_lexical_search_absorbs_sparse_delta_mid_stream(spark, tmp_path):
    """The sparse twin of the IVF∘streaming composition: a TEXT query
    stream serves over the sparse inverted index (external queries
    weighted under frozen corpus stats — text_query_weights); between
    micro-batches a delta document arrives and absorbs stale-idf
    (stale_weight_postings union, zero existing postings touched); the
    next micro-batch surfaces it at rank 1.  Batch-0 parity: streaming
    results equal the batch sparse_topk with the same external queries."""
    from bigvectorbench_spark.operators import sparse as sp

    rows = [
        (0, "spark shuffles partitions across the cluster machines"),
        (1, "the lazy dog sleeps in the warm afternoon sun"),
        (2, "gardening roses need water sun and patient care"),
        (3, "distributed joins shuffle rows between cluster machines"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    base_post = sp.lexical_postings(docs).cache()
    holder = {"idx": sp.sparse_postings(docs, post=base_post).cache()}
    holder["idx"].count()

    def _search(qbatch):
        qw = sp.text_query_weights(qbatch, base_post)
        return sp.sparse_topk(None, None, k=3, wpost=holder["idx"],
                              qweights=qw)

    out = str(tmp_path / "lex_results")
    ckpt = str(tmp_path / "lex_ckpt")
    src = tmp_path / "queries"
    src.mkdir()

    def _serve():
        stream = spark.readStream.schema("qid bigint, text string").json(
            str(src))
        streaming_search(stream, out, ckpt, search_fn=_search)

    q_text = "spark cluster machines shuffle partitions"
    (src / "a.json").write_text(json.dumps({"qid": 100, "text": q_text}))
    _serve()

    # batch parity for generation 1
    qdf = spark.createDataFrame([(100, q_text)], "qid bigint, text string")
    expect = sorted(
        (r["qid"], r["rank"], r["doc_id"])
        for r in sp.sparse_topk(None, None, k=3, wpost=holder["idx"],
                                qweights=sp.text_query_weights(
                                    qdf, base_post)).collect())
    got0 = spark.read.parquet(out).filter("batch = 0")
    assert sorted((r["qid"], r["rank"], r["doc_id"])
                  for r in got0.collect()) == expect

    # absorb a delta doc that is an exact copy of the NEXT query's text
    q2_text = "quantum gardening manual for patient roses"
    delta = spark.createDataFrame([(50, q2_text)], "doc_id bigint, text string")
    holder["idx"] = holder["idx"].unionByName(
        sp.stale_weight_postings(delta, base_post)).cache()
    holder["idx"].count()

    (src / "b.json").write_text(json.dumps({"qid": 101, "text": q2_text}))
    _serve()

    got = spark.read.parquet(out)
    assert sorted(r["batch"] for r in
                  got.select("batch").distinct().collect()) == [0, 1]
    top1 = got.filter("batch = 1 AND qid = 101 AND rank = 1").collect()
    assert [r["doc_id"] for r in top1] == [50]
    # generation 1 could not have seen doc 50
    assert got0.filter("doc_id = 50").count() == 0
