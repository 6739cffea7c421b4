"""BM25 retrieval and vocabulary heavy hitters vs pure-python oracles."""

import math

import pytest

from bigvectorbench_spark.operators import retrieval as rt


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "web"),
        (1, "the lazy dog sleeps in the sun all day", "web"),
        (2, "quick quick quick brown foxes everywhere", "web"),
        (3, "spark shuffles partitions across the cluster", "code"),
        (4, "partitions and shuffles and joins in spark", "code"),
        (5, "a completely different document about gardening roses", "web"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string").cache()


def _py_bm25(corpus, query_terms, k1=1.2, b=0.75):
    """Reference BM25 with the same rounding discipline as the operator."""
    toks = {i: t.split() for i, t, _ in corpus}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for i, tk in toks.items():
        s = 0.0
        for t in set(query_terms):
            tf = tk.count(t)
            if tf == 0:
                continue
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            tfn = tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
            s += round(idf * tfn, 9)
        if s > 0:
            scores[i] = round(s, 6)
    return scores


def test_bm25_scores_match_python_oracle(spark, docs):
    corpus = [(r["doc_id"], r["text"], r["source"]) for r in docs.collect()]
    queries = spark.createDataFrame(
        [(100, ["quick", "fox"]), (101, ["spark", "partitions"]), (102, ["dog"])],
        "qid bigint, terms array<string>",
    )
    got = rt.bm25_topk(docs, queries, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], {})[r["doc_id"]] = r["score"]
    for qid, terms in [(100, ["quick", "fox"]), (101, ["spark", "partitions"]), (102, ["dog"])]:
        expect = _py_bm25(corpus, terms)
        assert by_q[qid] == pytest.approx(expect), f"qid={qid}"


def test_bm25_rank_order_and_k(spark, docs):
    queries = spark.createDataFrame([(1, ["quick"])], "qid bigint, terms array<string>")
    got = sorted(rt.bm25_topk(docs, queries, k=1).collect(), key=lambda r: r["rank"])
    # doc 2 has tf=3 for "quick" → highest score
    assert len(got) == 1 and got[0]["doc_id"] == 2 and got[0]["rank"] == 1


def test_bm25_duplicate_query_terms_count_once(spark, docs):
    q1 = spark.createDataFrame([(1, ["dog", "dog"])], "qid bigint, terms array<string>")
    q2 = spark.createDataFrame([(1, ["dog"])], "qid bigint, terms array<string>")
    r1 = {(r["doc_id"], r["score"]) for r in rt.bm25_topk(docs, q1).collect()}
    r2 = {(r["doc_id"], r["score"]) for r in rt.bm25_topk(docs, q2).collect()}
    assert r1 == r2


def test_top_terms_per_group(docs):
    got = rt.top_terms(docs, group_col="source", n=2).collect()
    by_grp = {}
    for r in got:
        by_grp.setdefault(r["source"], []).append((r["rank"], r["term"], r["n_occurrences"]))
    # web ties at 4 occurrences ("quick", "the") break alphabetically
    assert sorted(by_grp["web"]) == [(1, "quick", 4), (2, "the", 4)]
    # code ties at 2 occurrences break alphabetically: "and", "partitions"
    assert sorted(by_grp["code"]) == [(1, "and", 2), (2, "partitions", 2)]


def test_postings_and_stats(docs):
    post = {(r["term"], r["doc_id"]): (r["tf"], r["dl"]) for r in rt.postings(docs).collect()}
    assert post[("quick", 2)] == (3, 6)
    assert post[("the", 0)] == (2, 9)
    stats = rt.corpus_stats(docs).collect()[0]
    assert stats["n_docs"] == 6
    assert stats["avgdl"] == pytest.approx((9 + 9 + 6 + 6 + 7 + 7) / 6)
