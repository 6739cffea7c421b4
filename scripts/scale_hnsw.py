#!/usr/bin/env python
"""Scale evidence for the serving-mode HNSW (VERDICT r5 ask #2).

For each sf dir: build the 8-shard serving index (timed), then measure —
with the SAME fixed ~100-query block on both paths —

  - search wall from the persisted artifact (best-of-N, the serving cost)
  - brute-force GEMM kNN wall on the identical query block (the baseline
    an index must beat asymptotically)
  - measured search WORK: distance evaluations per query vs shard rows
    (brute force = corpus size per query, by definition)
  - recall of the serving config vs exact kNN

Per-decade wall ratios compare like-for-like (fixed traffic, growing
corpus); the work ratio is the machine-independent form of the argument.

Usage: python scripts/scale_hnsw.py SF_DIR [SF_DIR ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigvectorbench_spark import get_spark
from bigvectorbench_spark.operators.hnsw import (
    hnsw_search, hnsw_search_work, load_or_build_hnsw)
from bigvectorbench_spark.operators.knn import knn
from bigvectorbench_spark.operators import metrics as mx
from bigvectorbench_spark.sources.tables import load_table, table_fingerprint, table_rows

import __spark_entry__ as e

RUNS = 3


def best_of(fn, runs=RUNS):
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(round(time.perf_counter() - t0, 3))
    return min(times), times


def measure(spark, sf):
    out = {"sf_dir": sf}
    n = table_rows(sf, "embeddings")
    out["corpus_rows"] = n
    t = e._train(spark, sf)
    q = e._queries_block(spark, sf, n)
    out["n_queries"] = q.count()

    # index build (timed cold: remove any cached artifact first)
    import shutil

    key = (f"{os.path.basename(str(sf).rstrip('/'))}_{n}"
           f"_{table_fingerprint(sf, 'embeddings')}")
    cache_root = os.environ.get(
        "SPARK_GRAFT_INDEX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".index_cache"))
    for d in os.listdir(cache_root) if os.path.isdir(cache_root) else []:
        if d.startswith(f"hnsw_{key}_"):
            shutil.rmtree(os.path.join(cache_root, d))
    t0 = time.perf_counter()
    shards = load_or_build_hnsw(t, cache_key=key, **e._HNSW_SCALE_CFG)
    shards.count()
    out["build_s"] = round(time.perf_counter() - t0, 3)

    # serving search from the persisted artifact
    def _search():
        hnsw_search(shards, q, k=10, ef=e._HNSW_SCALE_EF).write.format(
            "noop").mode("overwrite").save()

    out["hnsw_search_s"], out["hnsw_search_runs"] = best_of(_search)

    # brute GEMM on the identical query block
    def _gemm():
        knn(t, q, k=10, method="gemm").write.format(
            "noop").mode("overwrite").save()

    out["gemm_search_s"], out["gemm_search_runs"] = best_of(_gemm)

    # measured work: distance evals per query (brute force = n per query)
    w = hnsw_search_work(shards, q, k=10, ef=e._HNSW_SCALE_EF).collect()
    evals = sum(r["dist_evals"] for r in w)
    nq = w[0]["n_queries"]
    out["hnsw_dist_evals_per_query"] = round(evals / nq, 1)
    out["brute_dist_evals_per_query"] = n
    out["work_fraction"] = round(evals / (nq * n), 4)

    # recall of the serving config vs exact
    approx = hnsw_search(shards, q, k=10, ef=e._HNSW_SCALE_EF).groupBy(
        "qid").agg(F.collect_list("id").alias("neighbors"))
    exact = knn(t, q, k=10, method="expr").groupBy("qid").agg(
        F.collect_list("id").alias("neighbors"))
    r = mx.recall_per_query(approx, exact).agg(
        F.avg("recall"), F.min("recall")).collect()[0]
    out["recall_mean"] = round(float(r[0]), 4)
    out["recall_min"] = round(float(r[1]), 4)
    spark.catalog.clearCache()
    return out


def ef_sweep(spark, sf, efs):
    """Recall/QPS trade-off at one sf: the knob that buys back the
    large-shard recall tail (the reference's Pareto plot, as data)."""
    n = table_rows(sf, "embeddings")
    t = e._train(spark, sf)
    q = e._queries_block(spark, sf, n)
    key = (f"{os.path.basename(str(sf).rstrip('/'))}_{n}"
           f"_{table_fingerprint(sf, 'embeddings')}")
    shards = load_or_build_hnsw(t, cache_key=key, **e._HNSW_SCALE_CFG)
    exact = knn(t, q, k=10, method="expr").groupBy("qid").agg(
        F.collect_list("id").alias("neighbors"))
    exact.cache().count()
    for ef in efs:
        wall, runs = best_of(lambda: hnsw_search(shards, q, k=10, ef=ef)
                             .write.format("noop").mode("overwrite").save())
        approx = hnsw_search(shards, q, k=10, ef=ef).groupBy("qid").agg(
            F.collect_list("id").alias("neighbors"))
        r = mx.recall_per_query(approx, exact).agg(
            F.avg("recall"), F.min("recall")).collect()[0]
        w = hnsw_search_work(shards, q, k=10, ef=ef).collect()
        evals = sum(x["dist_evals"] for x in w) / w[0]["n_queries"]
        print(json.dumps({
            "sf_dir": sf, "ef": ef, "search_s": wall, "runs": runs,
            "recall_mean": round(float(r[0]), 4),
            "recall_min": round(float(r[1]), 4),
            "dist_evals_per_query": round(evals, 1),
            "brute_evals_per_query": n}), flush=True)
    spark.catalog.clearCache()


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--ef-sweep":
        spark = get_spark("scale-hnsw")
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(1000).repartition(8).mapInPandas(
            lambda it: it, schema="id long").count()
        ef_sweep(spark, sys.argv[2], [int(x) for x in sys.argv[3:]]
                 or [24, 48, 96, 192])
        return
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark("scale-hnsw")
    spark.sparkContext.setLogLevel("ERROR")
    # warm python workers so build_s isn't measuring interpreter spin-up
    spark.range(1000).repartition(8).mapInPandas(
        lambda it: it, schema="id long").count()
    results = []
    for d in dirs:
        results.append(measure(spark, d))
        print(json.dumps(results[-1]), flush=True)
    if len(results) == 2:
        lo, hi = results
        print(json.dumps({"per_decade": {
            "hnsw_search": round(hi["hnsw_search_s"] / lo["hnsw_search_s"], 2),
            "gemm_search": round(hi["gemm_search_s"] / lo["gemm_search_s"], 2),
            "build": round(hi["build_s"] / lo["build_s"], 2),
            "hnsw_work_per_query": round(hi["hnsw_dist_evals_per_query"]
                                         / lo["hnsw_dist_evals_per_query"], 2),
            "brute_work_per_query": round(hi["brute_dist_evals_per_query"]
                                          / lo["brute_dist_evals_per_query"], 2),
        }}), flush=True)


if __name__ == "__main__":
    main()
