#!/usr/bin/env python
"""Selectivity regime for filtered sparse search (VERDICT r9 ask #3 —
the G5 treatment the dense filtered kNN got in SCALE_FILTER_IVF_r8):
where does the PREFILTER plan (semi-join allowed ids into the postings
before scoring) stop beating the POSTFILTER plan (score the full
query-vocabulary postings, semi-join the small aggregated score frame
before ranking)?

Reference policy analog: create_artificial_datasets.py:165-283 (the
selectivity ladder the reference builds filtered datasets at) +
pgvector/module.py:90-102 (the filtered-search SQL form).

Both plans return IDENTICAL rows on any fixed index (scores are
per-(qid, doc) sums — dropping a doc's postings before aggregation
equals dropping its row after), so the sweep is pure cost, plus the
composition question: does the auto_m-PRUNED index keep its recall under
a prefilter, or does filtering + pruning compose into a cliff?

Per selectivity s ∈ {0.001, 0.01, 0.25, 0.5, 0.85} on the 500k-doc Zipf
corpus (predicate doc_id % 1000 < s·1000 — uniform, deterministic):

  - pre_bcast (allowed-id set hinted broadcast via n_allowed — the plan
    the operator runs when the id set fits BROADCAST_IDS_MAX) vs
    pre_smj (unhinted — the planner's sort-merge fallback, what a
    too-big-to-broadcast id set costs) vs post, all on the
    auto_m-pruned SERVING index (best-of-2, noop sink) — the regime the
    100 TB path actually runs
  - pre wall on the EXACT index (1 run; post-exact is measured ONCE —
    its cost is selectivity-independent by construction)
  - top-10 recall of pruned-prefilter vs exact-prefilter (the cliff
    check; exact-prefilter is the filtered ground truth)

The winning-plan table calibrates sparse.FILTER_SPARSE_PRE_MAX_SEL (the
auto-mode threshold the declared sparse_filter_adaptive query runs
through).

Usage: python scripts/scale_filter_sparse.py [N_DOCS] [OUT_JSON]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bigvectorbench_spark import get_spark
from bigvectorbench_spark.operators import metrics as mx
from bigvectorbench_spark.operators import sparse as sp
from scale_retrieval import best_of, ensure_corpus

SELECTIVITIES = (0.001, 0.01, 0.25, 0.5, 0.85)
K = 10
PRUNED_RUNS = 2


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else "SCALE_FILTER_SPARSE_r10.json"
    root = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/bvb_scale")

    spark = get_spark("scale-filter-sparse")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(
        os.path.join(ensure_corpus(n, root), "documents.parquet"))

    t0 = time.perf_counter()
    wpost = sp.sparse_postings(docs, post=sp.lexical_postings(docs)).persist()
    total = wpost.count()
    build_s = round(time.perf_counter() - t0, 3)
    m = sp.auto_m(n)
    pruned = sp.prune_postings(wpost, m=m).persist()
    kept = pruned.count()

    step = max(1, n // 50)
    queries = (docs.filter(F.col("doc_id") % step == 0).limit(50)
               .select(F.col("doc_id").alias("qid"))).persist()
    n_q = queries.count()

    def timed(idx, pred, mode, runs, n_allowed=None):
        def _run():
            sp.filtered_sparse_topk(
                docs, queries, predicate=pred, k=K, wpost=idx, qwpost=wpost,
                mode=mode, n_allowed=n_allowed).write.format(
                "noop").mode("overwrite").save()
        return best_of(_run, runs=runs)

    # post-exact once: its scored-row count is the full query-vocabulary
    # posting set regardless of the predicate.
    post_exact_s, post_exact_runs = timed(wpost, "doc_id % 1000 < 250",
                                          "post", 1)

    points = []
    for sel in SELECTIVITIES:
        pred = f"doc_id % 1000 < {int(round(sel * 1000))}"
        n_allowed = docs.filter(pred).count()
        row = {"selectivity": sel, "predicate": pred, "n_allowed": n_allowed}
        row["pre_bcast_pruned_s"], row["pre_bcast_pruned_runs"] = timed(
            pruned, pred, "pre", PRUNED_RUNS, n_allowed=n_allowed)
        row["pre_smj_pruned_s"], row["pre_smj_pruned_runs"] = timed(
            pruned, pred, "pre", PRUNED_RUNS)
        row["post_pruned_s"], row["post_pruned_runs"] = timed(
            pruned, pred, "post", PRUNED_RUNS)
        row["pre_exact_s"], _ = timed(wpost, pred, "pre", 1,
                                      n_allowed=n_allowed)
        row["pre_wins"] = row["pre_bcast_pruned_s"] < row["post_pruned_s"]

        truth = sp.filtered_sparse_topk(
            docs, queries, predicate=pred, k=K, wpost=wpost,
            mode="pre", n_allowed=n_allowed).groupBy("qid").agg(
            F.collect_list("doc_id").alias("neighbors"))
        got = sp.filtered_sparse_topk(
            docs, queries, predicate=pred, k=K, wpost=pruned, qwpost=wpost,
            mode="pre", n_allowed=n_allowed).groupBy("qid").agg(
            F.collect_list("doc_id").alias("neighbors"))
        r = mx.recall_per_query(got, truth).agg(
            F.avg("recall").alias("mean"),
            F.min("recall").alias("min")).collect()[0]
        row["pruned_prefilter_recall_mean"] = round(r["mean"], 4)
        row["pruned_prefilter_recall_min"] = round(r["min"], 4)
        points.append(row)
        print(json.dumps(row), flush=True)

    rec = {
        "corpus_rows": n, "n_queries": n_q, "k": K,
        "index_build_s": build_s, "postings_total": total,
        "m": m, "postings_kept": kept,
        "post_exact_s": post_exact_s,
        "post_exact_note": ("postfilter on the EXACT index scores the full "
                            "query-vocabulary postings — cost is "
                            "selectivity-independent; measured once"),
        "points": points,
        "threshold_in_code": sp.FILTER_SPARSE_PRE_MAX_SEL,
    }
    print(json.dumps(rec))
    with open(out_json, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
