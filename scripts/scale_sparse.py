#!/usr/bin/env python
"""Scale decade for the sparse inner-product family (operators/sparse.py).

Protocol (the serving split, same as scale_retrieval): the weighted
inverted index is built and persisted ONCE per corpus (timed as build);
search measurements are then search-only over a fixed 50-query block.

Per corpus size (Zipf documents, gen_docs distribution — a 50k-word Zipf
vocabulary, so the df spectrum has the real stopword head the synthetic
sf tables lack):

  - weighted-index build wall (tokenize → postings → df → weights)
  - impact pruning at per-term cap m: postings kept / cut fraction
  - exact search vs pruned search (best-of-3, noop sink)
  - pruned-vs-exact top-10 recall (mean / min over the query block)

The claim under test: pruning cost-caps the head terms (scored rows fall
by the cut fraction of the QUERY-TERM postings, which skew to the head
since Zipf queries contain stopwords) while idf-weighting keeps recall
high — the property that makes the m-knob safe to turn at 100 TB.

Usage: python scripts/scale_sparse.py [N_SMALL N_BIG] [M|auto] [OUT_JSON]

M defaults to "auto": the sparse.auto_m rule (m = 0.04 * corpus docs,
floor 64) — the round-9 claim is that this holds the cut fraction and
recall constant across the decade WITHOUT hand-picking m per size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigvectorbench_spark import get_spark
from bigvectorbench_spark.operators import metrics as mx
from bigvectorbench_spark.operators import sparse as sp
from scale_retrieval import best_of, ensure_corpus

RUNS = 3


def measure(spark, n: int, m, root: str) -> dict:
    path = ensure_corpus(n, root)
    docs = spark.read.parquet(os.path.join(path, "documents.parquet"))

    t0 = time.perf_counter()
    wpost = sp.sparse_postings(docs, post=sp.lexical_postings(docs)).persist()
    total = wpost.count()
    # m="auto": the auto_m rule under test (VERDICT r8 ask #2) — resolve
    # here so the artifact records the value the rule picked, and the
    # prune below exercises the same resolution path users get.
    m_resolved = sp.auto_m(n) if m == "auto" else int(m)
    out = {"corpus_rows": n, "m": m_resolved, "m_mode": m}
    out["index_build_s"] = round(time.perf_counter() - t0, 3)
    out["postings_total"] = total

    t0 = time.perf_counter()
    # Pass the RESOLVED m (ADVICE r9 #2): the applied cap provably equals
    # the recorded one even on corpora with zero-token docs, and prune_s
    # times only the cut (no fallback distinct-count job folded in).
    pruned_idx = sp.prune_postings(wpost, m=m_resolved).persist()
    kept = pruned_idx.count()
    out["prune_s"] = round(time.perf_counter() - t0, 3)
    out["postings_kept"] = kept
    out["postings_cut_frac"] = round(1 - kept / total, 4)

    step = max(1, n // 50)
    queries = (docs.filter(F.col("doc_id") % step == 0).limit(50)
               .select(F.col("doc_id").alias("qid"))).persist()
    out["n_queries"] = queries.count()

    def _exact():
        sp.sparse_topk(docs, queries, k=10, wpost=wpost).write.format(
            "noop").mode("overwrite").save()

    def _pruned():
        sp.sparse_topk(docs, queries, k=10, wpost=pruned_idx,
                       qwpost=wpost).write.format(
            "noop").mode("overwrite").save()

    out["exact_search_s"], out["exact_runs"] = best_of(_exact)
    out["pruned_search_s"], out["pruned_runs"] = best_of(_pruned)

    exact = sp.sparse_topk(docs, queries, k=10, wpost=wpost).groupBy(
        "qid").agg(F.collect_list("doc_id").alias("neighbors"))
    pr = sp.sparse_topk(docs, queries, k=10, wpost=pruned_idx,
                        qwpost=wpost).groupBy("qid").agg(
        F.collect_list("doc_id").alias("neighbors"))
    r = mx.recall_per_query(pr, exact).agg(
        F.avg("recall").alias("mean"), F.min("recall").alias("min")).collect()[0]
    out["pruned_recall_mean"] = round(r["mean"], 4)
    out["pruned_recall_min"] = round(r["min"], 4)

    wpost.unpersist()
    pruned_idx.unpersist()
    queries.unpersist()
    return out


def main() -> None:
    args = [a for a in sys.argv[1:]]
    n_small = int(args[0]) if len(args) > 0 else 50_000
    n_big = int(args[1]) if len(args) > 1 else 500_000
    m = args[2] if len(args) > 2 else "auto"
    if m != "auto":
        m = int(m)
    out_json = args[3] if len(args) > 3 else "SCALE_SPARSE_r9.json"
    root = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/bvb_scale")

    spark = get_spark("scale-sparse")
    spark.sparkContext.setLogLevel("ERROR")
    points = [measure(spark, n, m, root) for n in (n_small, n_big)]
    growth = {
        k: round(points[1][k] / max(points[0][k], 1e-9), 2)
        for k in ("index_build_s", "exact_search_s", "pruned_search_s")
    }
    rec = {"runs": RUNS, "points": points, "growth_total": growth,
           "size_ratio": n_big / n_small}
    print(json.dumps(rec))
    with open(out_json, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
