#!/usr/bin/env python
"""Decade evidence for filtered ANN on the IVF-pruned path (VERDICT r6
ask #5): exact filtered kNN scans every predicate survivor (O(n·sel) per
query); the pruned path bounds work to the probed cells — post branch
additionally keeps the masked-GEMM kernel label-blind and bounded.

For each sf dir, with a FIXED ~100-query block (traffic-shaped):
  - exact filtered kNN wall (the baseline, both predicates)
  - filtered-IVF pre branch (eq predicate, ~10% selectivity) wall + recall
  - filtered-IVF post branch (range predicate, ~44%) wall + recall
at a scale-shaped index (nlist grows with sqrt(n), nprobe fixed → probed
fraction shrinks per decade, the same argument as IVF itself).

Usage: python scripts/scale_filter_ivf.py SF_DIR [SF_DIR ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigvectorbench_spark import get_spark
from bigvectorbench_spark.operators.filter_knn import filtered_ivf_knn, filtered_knn
from bigvectorbench_spark.operators.similarity import IVFIndex
from bigvectorbench_spark.operators import metrics as mx
from bigvectorbench_spark.sources.tables import table_rows

import __spark_entry__ as e

RUNS = 3
EQ = dict(filter_template="label == {l}", query_param_cols=["l"])
RANGE = dict(filter_template="label >= {lo} and label <= {hi}",
             query_param_cols=["lo", "hi"])


def best_of(fn, runs=RUNS):
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(round(time.perf_counter() - t0, 3))
    return min(times), times


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _recall(approx, exact):
    a = approx.groupBy("qid").agg(F.collect_list("id").alias("neighbors"))
    b = exact.groupBy("qid").agg(F.collect_list("id").alias("neighbors"))
    r = mx.recall_per_query(a, b).agg(F.avg("recall"), F.min("recall")).collect()[0]
    return round(float(r[0]), 4), round(float(r[1]), 4)


def measure(spark, sf):
    out = {"sf_dir": sf}
    n = table_rows(sf, "embeddings")
    out["corpus_rows"] = n
    t = e._train(spark, sf).cache()
    t.count()
    q = e._queries_block(spark, sf, n).join(
        e._train(spark, sf).select(F.col("id").alias("qid"), "label"), "qid")
    q = (q.withColumn("l", F.col("label"))
         .withColumn("lo", F.col("label") - 2)
         .withColumn("hi", F.col("label") + 2)).cache()
    out["n_queries"] = q.count()

    nlist = max(8, int(math.sqrt(n) / 4))
    out["nlist"], out["nprobe"] = nlist, 8
    t0 = time.perf_counter()
    idx = IVFIndex.fit(t, nlist=nlist, seed=1, max_iter=8, sort_col="id")
    indexed = idx.assign(t).cache()
    indexed.count()
    out["build_s"] = round(time.perf_counter() - t0, 3)
    out["probed_fraction"] = round(8 / nlist, 4)

    for name, kw, sel, strat in (
        ("eq_pre", EQ, 0.1, "pre"),
        ("range_post", RANGE, 0.44, "post"),
    ):
        exact = filtered_knn(t, q, k=10, **kw)
        out[f"{name}_exact_s"], out[f"{name}_exact_runs"] = best_of(
            lambda: _noop(filtered_knn(t, q, k=10, **kw)))
        out[f"{name}_ivf_s"], out[f"{name}_ivf_runs"] = best_of(
            lambda: _noop(filtered_ivf_knn(
                idx, indexed, q, k=10, nprobe=8, strategy=strat,
                selectivity=sel, **kw)))
        approx = filtered_ivf_knn(idx, indexed, q, k=10, nprobe=8,
                                  strategy=strat, selectivity=sel, **kw)
        out[f"{name}_recall_mean"], out[f"{name}_recall_min"] = _recall(approx, exact)
    spark.catalog.clearCache()
    return out


def main() -> int:
    spark = get_spark("scale-filter-ivf")
    spark.sparkContext.setLogLevel("ERROR")
    rows = [measure(spark, sf) for sf in sys.argv[1:]]
    for r in rows:
        print(json.dumps(r), flush=True)
    if len(rows) == 2 and rows[1]["corpus_rows"] == 10 * rows[0]["corpus_rows"]:
        per = {}
        for k in ("eq_pre_exact_s", "eq_pre_ivf_s",
                  "range_post_exact_s", "range_post_ivf_s", "build_s"):
            per[k] = round(rows[1][k] / rows[0][k], 2)
        print(json.dumps({"per_decade": per}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
