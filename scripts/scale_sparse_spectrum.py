#!/usr/bin/env python
"""Spectrum-generality validation for auto_m (VERDICT r9 ask #4): the
0.04·n fast path is calibrated on the Zipf df spectrum — on a different
term-frequency shape it silently lands a different postings cut fraction
(and with it a different recall point).  sparse.auto_m_spectrum instead
holds the CUT FRACTION itself (≈14.2%, the measured Zipf-decade operating
point) by solving m from a bounded df histogram at index build.

This script runs both resolvers on both spectra and records the realized
cut fraction + pruned-vs-exact recall:

  - Zipf 50k and 500k (gen_docs zipf: 50k-word Zipf vocabulary — the
    stopword-headed shape auto_m was calibrated on)
  - uniform-df 50k and 500k (gen_docs "driver": a 30-word uniform
    vocabulary — every term is a stopword; df_t ≈ n for unigrams, the
    flat spectrum where 0.04·n is wrong by construction)

The claim: m="spectrum" holds cut ≈0.142 on BOTH shapes with no
per-corpus tuning, while m=0.04·n drifts on the uniform shape.  Recall
is measured everywhere EXCEPT uniform-500k, where exact search scores
~750M rows (30 unigrams × 500k df × 50 queries) — recorded as skipped,
not silently dropped; the 50k uniform point carries the recall evidence
for that shape.

Usage: python scripts/scale_sparse_spectrum.py [OUT_JSON]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bigvectorbench_spark import get_spark
from bigvectorbench_spark.operators import metrics as mx
from bigvectorbench_spark.operators import sparse as sp
from scale_retrieval import ensure_corpus

POINTS = (("zipf", 50_000, True), ("zipf", 500_000, True),
          ("uniform", 50_000, True), ("uniform", 500_000, False))


def ensure_uniform_corpus(n: int, root: str) -> str:
    out = os.path.join(root, f"docs_driver{n}")
    if not os.path.exists(os.path.join(out, "documents.parquet")):
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "gen_docs.py"),
             str(n), out, "42", "driver"],
            check=True)
    return out


def measure(spark, shape: str, n: int, with_recall: bool, root: str) -> dict:
    path = (ensure_corpus(n, root) if shape == "zipf"
            else ensure_uniform_corpus(n, root))
    docs = spark.read.parquet(os.path.join(path, "documents.parquet"))
    wpost = sp.sparse_postings(docs, post=sp.lexical_postings(docs)).persist()
    total = wpost.count()
    out = {"shape": shape, "corpus_rows": n, "postings_total": total}

    t0 = time.perf_counter()
    hist = sp.df_spectrum(wpost)
    out["spectrum_s"] = round(time.perf_counter() - t0, 3)
    out["spectrum_buckets"] = len(hist)

    resolutions = {"auto": sp.auto_m(n),
                   "spectrum": sp.auto_m_spectrum(None, spectrum=hist)}
    for mode, m in resolutions.items():
        pruned = sp.prune_postings(wpost, m=m).persist()
        kept = pruned.count()
        out[f"m_{mode}"] = m
        out[f"cut_frac_{mode}"] = round(1 - kept / total, 4)
        if with_recall:
            step = max(1, n // 50)
            queries = (docs.filter(F.col("doc_id") % step == 0).limit(50)
                       .select(F.col("doc_id").alias("qid")))
            exact = sp.sparse_topk(docs, queries, k=10, wpost=wpost).groupBy(
                "qid").agg(F.collect_list("doc_id").alias("neighbors"))
            pr = sp.sparse_topk(docs, queries, k=10, wpost=pruned,
                                qwpost=wpost).groupBy("qid").agg(
                F.collect_list("doc_id").alias("neighbors"))
            r = mx.recall_per_query(pr, exact).agg(
                F.avg("recall").alias("mean"),
                F.min("recall").alias("min")).collect()[0]
            out[f"recall_mean_{mode}"] = round(r["mean"], 4)
            out[f"recall_min_{mode}"] = round(r["min"], 4)
        pruned.unpersist()
    if not with_recall:
        out["recall_note"] = ("skipped: exact search on the uniform-500k "
                              "shape scores ~750M rows; the 50k uniform "
                              "point carries this shape's recall evidence")
    wpost.unpersist()
    return out


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SCALE_SPARSE_r10.json"
    root = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/bvb_scale")
    spark = get_spark("scale-sparse-spectrum")
    spark.sparkContext.setLogLevel("ERROR")
    points = []
    for shape, n, with_recall in POINTS:
        row = measure(spark, shape, n, with_recall, root)
        points.append(row)
        print(json.dumps(row), flush=True)
    rec = {"cut_target": sp._AUTO_M_CUT, "points": points}
    print(json.dumps(rec))
    with open(out_json, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
