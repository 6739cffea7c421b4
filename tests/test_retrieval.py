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


def _eval_py(results, qrels, k=10):
    """Independent python recomputation of retrieval_eval (same rounding)."""
    import math
    from collections import defaultdict
    from decimal import Decimal

    W = [round(1.0 / math.log2(r + 1), 9) for r in range(1, k + 1)]
    rel = {(q, d): g for q, d, g in qrels if g > 0}
    by_q = defaultdict(list)
    for q, d, r in results:
        if r <= k:
            by_q[q].append((r, d))
    rels_by_q = defaultdict(list)
    for (q, d), g in rel.items():
        rels_by_q[q].append((g, d))
    out = {}
    for q, rows in by_q.items():
        dcg = Decimal(0)
        hits, frank = 0, None
        for r, d in rows:
            g = rel.get((q, d), 0)
            dcg += Decimal(str(round(float((1 << g) - 1) * W[r - 1], 9)))
            if g > 0:
                hits += 1
                frank = r if frank is None else min(frank, r)
        ideal = sorted(rels_by_q[q], key=lambda t: (-t[0], t[1]))[:k]
        idcg = Decimal(0)
        for i, (g, _) in enumerate(ideal):
            idcg += Decimal(str(round(float((1 << g) - 1) * W[i], 9)))
        n_rel = len(rels_by_q[q])
        out[q] = (
            len(rows), n_rel,
            round(hits / n_rel, 6) if n_rel else 0.0,
            round(1.0 / frank, 6) if frank else 0.0,
            round(float(dcg) / float(idcg), 6) if idcg > 0 else 0.0,
        )
    return out


def test_retrieval_eval_matches_python(spark):
    results = [(1, 10, 1), (1, 11, 2), (1, 12, 3),
               (2, 20, 1), (2, 21, 2),
               (3, 30, 1), (3, 31, 2)]          # q3: nothing relevant
    qrels = [(1, 10, 3), (1, 12, 1), (1, 99, 2),  # one miss (99 not retrieved)
             (2, 21, 2), (2, 22, 1), (2, 23, 1)]
    rdf = spark.createDataFrame(results, "qid bigint, doc_id bigint, rank bigint")
    qdf = spark.createDataFrame(qrels, "qid bigint, doc_id bigint, rel int")
    got = {r["qid"]: (r["n_retrieved"], r["n_relevant"], r["recall_at_10"],
                      r["mrr_at_10"], r["ndcg_at_10"])
           for r in rt.retrieval_eval(rdf, qdf, k=10).collect()}
    want = _eval_py(results, qrels, k=10)
    assert got == want
    # spot semantics: q1 found 2 of 3 relevant, first at rank 1
    assert got[1][2] == pytest.approx(round(2 / 3, 6))
    assert got[1][3] == 1.0
    # q3 has no judged-relevant docs at all -> all-zero metrics, not NULL
    assert got[3] == (2, 0, 0.0, 0.0, 0.0)


def test_retrieval_eval_perfect_ranking_is_1(spark):
    """Retrieving exactly the relevant docs in ideal (grade-desc) order is
    nDCG = recall = MRR = 1."""
    qrels = [(7, 1, 3), (7, 2, 2), (7, 3, 1)]
    results = [(7, 1, 1), (7, 2, 2), (7, 3, 3)]
    r = rt.retrieval_eval(
        spark.createDataFrame(results, "qid bigint, doc_id bigint, rank bigint"),
        spark.createDataFrame(qrels, "qid bigint, doc_id bigint, rel int"),
        k=3).collect()[0]
    assert (r["recall_at_3"], r["mrr_at_3"], r["ndcg_at_3"]) == (1.0, 1.0, 1.0)


def test_retrieval_eval_rank_cut_and_extra_qrels(spark):
    """Rows past rank k are ignored; qrels beyond k cap the ideal at k."""
    qrels = [(5, d, 1) for d in range(20)]       # 20 relevant
    results = [(5, d, d + 1) for d in range(15)]  # 15 retrieved, all relevant
    r = rt.retrieval_eval(
        spark.createDataFrame(results, "qid bigint, doc_id bigint, rank bigint"),
        spark.createDataFrame(qrels, "qid bigint, doc_id bigint, rel int"),
        k=10).collect()[0]
    assert r["n_retrieved"] == 10
    assert r["recall_at_10"] == pytest.approx(0.5)   # 10 of 20
    assert r["ndcg_at_10"] == 1.0                    # uniform grades, ideal order


def test_term_overlap_qrels_counts_distinct_terms(spark, docs):
    queries = spark.createDataFrame(
        [(100, ["quick", "the", "zzz-nowhere"])], "qid bigint, terms array<string>")
    got = {(r["qid"], r["doc_id"]): r["rel"]
           for r in rt.term_overlap_qrels(docs, queries).collect()}
    post = {}
    for r in rt.postings(docs).collect():
        post.setdefault(r["doc_id"], set()).add(r["term"])
    want = {}
    for d, terms in post.items():
        g = len({"quick", "the"} & terms)
        if g:
            want[(100, d)] = g
    assert got == want


def test_rrf_fuse_matches_python(spark):
    import math
    from decimal import Decimal

    run_a = [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)]
    run_b = [(1, 11, 1), (1, 13, 2), (2, 21, 1), (2, 20, 2)]
    A = spark.createDataFrame(run_a, "qid bigint, doc_id bigint, rank bigint")
    B = spark.createDataFrame(run_b, "qid bigint, doc_id bigint, rank bigint")
    got = {(r["qid"], r["doc_id"]): (r["score"], r["rank"])
           for r in rt.rrf_fuse([A, B], k=5, k0=60, weights=[1.0, 0.5]).collect()}
    scores = {}
    for rows, w in [(run_a, 1.0), (run_b, 0.5)]:
        for q, d, r in rows:
            scores[(q, d)] = scores.get((q, d), Decimal(0)) + \
                Decimal(str(round(w / (60.0 + r), 9)))
    want_rank = {}
    for q in (1, 2):
        docs = sorted(((d, float(round(s, 6))) for (qq, d), s in scores.items()
                       if qq == q), key=lambda t: (-t[1], t[0]))
        for i, (d, s) in enumerate(docs, 1):
            want_rank[(q, d)] = (s, i)
    assert got == want_rank
    # doc 11 in both runs outranks doc 10 (rank 1 in one run only)
    assert got[(1, 11)][1] == 1


def test_rrf_fuse_validations(spark):
    A = spark.createDataFrame([(1, 10, 1)], "qid bigint, doc_id bigint, rank bigint")
    with pytest.raises(ValueError, match="at least one run"):
        rt.rrf_fuse([])
    with pytest.raises(ValueError, match="weights for"):
        rt.rrf_fuse([A, A], weights=[1.0])


def test_mmr_select_diversifies():
    """Three near-duplicate high-rel docs + two distinct mid-rel docs:
    plain top-3 takes the duplicates, MMR at λ=0.5 keeps one duplicate
    and covers the other directions."""
    import numpy as np

    ids = [1, 2, 3, 4, 5]
    V = np.array([[1, 0, 0], [1, 0.01, 0], [1, 0, 0.01],   # same direction
                  [0, 1, 0], [0, 0, 1]], dtype=float)
    rel = [0.99, 0.98, 0.97, 0.8, 0.8]
    chosen, objs = rt.mmr_select_numpy(ids, rel, V, k=3, lamb=0.5)
    assert chosen[0] == 1                  # best rel first
    assert set(chosen) == {1, 4, 5}        # then the two NEW directions
    assert objs[0] > objs[1] >= objs[2]


def test_mmr_lambda_one_is_pure_relevance():
    import numpy as np
    rng = np.random.RandomState(51)
    V = rng.randn(8, 4)
    rel = [0.1, 0.9, 0.5, 0.8, 0.2, 0.7, 0.3, 0.6]
    chosen, _ = rt.mmr_select_numpy(list(range(8)), rel, V, k=4, lamb=1.0)
    assert chosen == [1, 3, 5, 7]          # rel order, ids break ties


def test_mmr_rerank_matches_numpy(spark):
    import numpy as np
    rng = np.random.RandomState(53)
    rows = []
    want = {}
    for q in (10, 20):
        V = rng.randint(-3, 4, size=(12, 6)).astype(float)
        rel = np.round(rng.rand(12), 6)
        ids = list(range(100, 112))
        for i, d in enumerate(ids):
            rows.append((q, d, float(rel[i]), [float(x) for x in V[i]]))
        c, o = rt.mmr_select_numpy(ids, rel, V, k=5, lamb=0.5)
        want[q] = list(zip(c, o, range(1, 6)))
    df = spark.createDataFrame(
        rows, "qid bigint, doc_id bigint, rel double, vec array<double>")
    got = {}
    for r in rt.mmr_rerank(df, k=5, lamb=0.5).collect():
        got.setdefault(r["qid"], []).append(
            (r["doc_id"], r["objective"], r["rank"]))
    for q in want:
        assert sorted(got[q], key=lambda t: t[2]) == want[q]
