"""Sketch-based profiling (HLL distinct, approximate percentiles) stays
within advertised error of the exact answers on real testdata."""

from pyspark.sql import functions as F

import __spark_entry__ as e
from bigvectorbench_spark.sources.tables import load_table


def test_corpus_stats_approx_close_to_exact(spark, sf_dir):
    approx = {r["source"]: r for r in
              e.queries()["corpus_stats_approx"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    exact = {r["source"]: r for r in docs.groupBy("source").agg(
        F.countDistinct("text").alias("nd"),
        F.expr("percentile(n_chars, 0.5)").alias("p50"),
        F.count("*").alias("n")).collect()}
    assert set(approx) == set(exact)
    for s, ex in exact.items():
        ap = approx[s]
        assert ap["n_docs"] == ex["n"]
        # HLL++ at rsd=0.01: allow 5% (generous vs the 1% target)
        assert abs(ap["n_distinct_texts_approx"] - ex["nd"]) <= max(2, 0.05 * ex["nd"])
        # percentile_approx with 10k accuracy: near-exact at test scales
        assert abs(ap["p50_chars_approx"] - ex["p50"]) <= max(2.0, 0.05 * ex["p50"])


def test_cm_watchlist_report_contract(spark):
    """Exact counts match a python recount; the CM contract booleans hold;
    a planted heavy term leads the watchlist."""
    from bigvectorbench_spark.operators.metrics import cm_watchlist_report

    rows = [(i, ("common " * 20) + f"tail{i} word{i % 5}", "s")
            for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = cm_watchlist_report(docs, top_n=5).collect()
    counts = {}
    for _, text, _ in rows:
        for t in text.split():
            counts[t] = counts.get(t, 0) + 1
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["term"], r["exact_count"]) for r in got] == expect
    assert got[0]["term"] == "common" and got[0]["exact_count"] == 1000
    assert all(r["overcount_ok"] and r["within_eps_ok"] for r in got)
