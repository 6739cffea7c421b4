#!/usr/bin/env python
"""Incremental HNSW maintenance at serving scale — absorb vs rebuild
(the SCALE_IVF_DELTA_r7 twin for the graph family).

Setup: a 200k x 32-d blobs corpus (fixtures.random_float — the sf
embeddings tables top out at 2k rows, far under a maintenance-relevant
size) splits 90/10 (the ivf_delta convention).  Measured:

  - base index build wall (the sunk cost both strategies share)
  - ABSORB: hnsw_delta_shards over the 10% arrivals — builds only
    delta-sized graph shards, touches zero base bytes
  - REBUILD: full build over base ∪ delta (what absorb avoids)
  - serving parity: search wall + recall vs exact kNN for the
    absorbed (base ∪ delta shards) and rebuilt indexes at ef="auto" —
    the trade absorb makes is MORE shards per search, so both sides of
    it are recorded, not just the build win

Usage: python scripts/scale_hnsw_delta.py [N_ROWS] [OUT_JSON]
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
from bigvectorbench_spark.operators.hnsw import (
    build_hnsw_shards, hnsw_delta_shards, hnsw_search)
from bigvectorbench_spark.operators.knn import knn
from bigvectorbench_spark.sources.tables import table_rows

import __spark_entry__ as e

RUNS = 3


def best_of(fn, runs=RUNS):
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(round(time.perf_counter() - t0, 3))
    return min(times), times


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else "SCALE_HNSW_DELTA_r10.json"

    spark = get_spark("scale-hnsw-delta")
    spark.sparkContext.setLogLevel("ERROR")
    from bigvectorbench_spark import fixtures as fx

    train, test = fx.random_float(spark, n, 32, centers=100, seed=7)
    t = train.cache()
    base = t.filter("id % 10 != 0").cache()
    delta = t.filter("id % 10 = 0").cache()
    queries = test.limit(100).cache()
    out = {"corpus_rows": t.count(), "base_rows": base.count(),
           "delta_rows": delta.count(), "n_queries": queries.count()}

    num_shards = 8  # the serving-mode configuration (q_hnsw_scale_search)

    t0 = time.perf_counter()
    base_shards = build_hnsw_shards(
        base, m=8, ef_construction=64, num_shards=num_shards, seed=3).cache()
    base_shards.count()
    out["base_build_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    delta_shards = hnsw_delta_shards(
        delta, base_shards, m=8, ef_construction=64, seed=3,
        n_delta=out["delta_rows"]).cache()
    out["delta_shards"] = delta_shards.count()
    out["absorb_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    rebuilt = build_hnsw_shards(
        t, m=8, ef_construction=64, num_shards=num_shards, seed=3).cache()
    rebuilt.count()
    out["rebuild_s"] = round(time.perf_counter() - t0, 3)
    out["rebuild_over_absorb"] = round(
        out["rebuild_s"] / max(out["absorb_s"], 1e-9), 2)

    absorbed = base_shards.unionByName(delta_shards)
    exact = knn(t, queries, k=10, method="gemm").groupBy("qid").agg(
        F.collect_list("id").alias("neighbors")).cache()
    exact.count()
    for label, shards in (("absorbed", absorbed), ("rebuilt", rebuilt)):
        s, runs = best_of(lambda: hnsw_search(
            shards, queries, k=10, ef="auto").write.format("noop")
            .mode("overwrite").save())
        out[f"{label}_search_s"], out[f"{label}_search_runs"] = s, runs
        got = hnsw_search(shards, queries, k=10, ef="auto").groupBy(
            "qid").agg(F.collect_list("id").alias("neighbors"))
        r = mx.recall_per_query(got, exact).agg(
            F.avg("recall").alias("mean"),
            F.min("recall").alias("min")).collect()[0]
        out[f"{label}_recall_mean"] = round(r["mean"], 4)
        out[f"{label}_recall_min"] = round(r["min"], 4)

    print(json.dumps(out))
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
