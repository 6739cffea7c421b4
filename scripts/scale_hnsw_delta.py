#!/usr/bin/env python
"""Incremental HNSW maintenance at serving scale — the N-ABSORB LADDER
(VERDICT r10 ask #2; extends the r10 single-absorb absorb-vs-rebuild
measurement with the curve that names the compaction trigger).

Setup: a 200k x 32-d blobs corpus (fixtures.random_float — the sf
embeddings tables top out at 2k rows, far under a maintenance-relevant
size) splits 75% base + five 5% arrival batches (id % 20 buckets).
Measured:

  - base index build wall (the sunk cost both strategies share)
  - per absorb step i = 1..5: absorb wall (hnsw_delta_shards over the
    arrival batch, sized against the CURRENT layout — the real N-absorb
    usage), the hnsw_delta_report row (shards_total, work_growth — the
    declared meter), serving search wall (best-of-3, ef="auto") and
    recall vs exact kNN over the resident corpus
  - REBUILD at the end state: full build over base ∪ all deltas, its
    search wall + recall — the alternative the work_growth ratio prices

The curve is the rebuild-on-evidence policy's evidence: compact when
work_growth (or the measured search-wall ratio vs rebuilt) crosses the
threshold SCALING.md records from this artifact.

Two ladder shapes matter: coarse (5 x 5% — shard-sized batches) shows
the base regime; fine (20 x 1.25% — each absorb lands a small shard)
drives shard count far past the rebuilt layout's, which is where
per-shard fixed costs (graph residency, entry descent, task overhead)
must eventually dominate — the regime that justifies compaction.

Usage: python scripts/scale_hnsw_delta.py [N_ROWS] [N_BATCHES] [OUT_JSON]
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
    build_hnsw_shards, hnsw_delta_report, hnsw_delta_shards, hnsw_search)
from bigvectorbench_spark.operators.knn import knn

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
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    out_json = sys.argv[3] if len(sys.argv) > 3 else "SCALE_HNSW_DELTA_r11.json"

    spark = get_spark("scale-hnsw-delta")
    spark.sparkContext.setLogLevel("ERROR")
    from bigvectorbench_spark import fixtures as fx

    train, test = fx.random_float(spark, n, 32, centers=100, seed=7)
    t = train.cache()
    mod = 4 * n_batches                       # base = 75%, batches 25%/N each
    base = t.filter(f"id % {mod} >= {n_batches}").cache()
    batches = [t.filter(f"id % {mod} = {i}").cache()
               for i in range(n_batches)]
    queries = test.limit(100).cache()
    out = {"corpus_rows": t.count(), "base_rows": base.count(),
           "batch_rows": [b.count() for b in batches],
           "n_queries": queries.count(),
           "protocol": (f"base 75% / {n_batches} x {25 / n_batches:g}% "
                        "absorbs; per-step search best-of-3 noop-write at "
                        "ef=auto; recall vs exact GEMM kNN over the "
                        "resident corpus; rebuild comparison at the end "
                        "state")}

    num_shards = 8  # the serving-mode configuration (q_hnsw_scale_search)

    t0 = time.perf_counter()
    layout = build_hnsw_shards(
        base, m=8, ef_construction=64, num_shards=num_shards, seed=3).cache()
    base_shards = layout
    layout.count()
    out["base_build_s"] = round(time.perf_counter() - t0, 3)

    def measure(label, shards, resident, exact):
        s, runs = best_of(lambda: hnsw_search(
            shards, queries, k=10, ef="auto").write.format("noop")
            .mode("overwrite").save())
        got = hnsw_search(shards, queries, k=10, ef="auto").groupBy(
            "qid").agg(F.collect_list("id").alias("neighbors"))
        r = mx.recall_per_query(got, exact).agg(
            F.avg("recall").alias("mean"),
            F.min("recall").alias("min")).collect()[0]
        return {"search_s": s, "search_runs": runs,
                "recall_mean": round(r["mean"], 4),
                "recall_min": round(r["min"], 4)}

    # Step 0: the base alone (the pre-absorb anchor of the curve).
    resident = base
    exact = knn(resident, queries, k=10, method="gemm").groupBy("qid").agg(
        F.collect_list("id").alias("neighbors")).cache()
    exact.count()
    # Step-0 accounting comes from the meter itself with an EMPTY delta
    # (its fixed point), not hardcoded arithmetic: work_growth=1.0 only
    # falls out of shards_total == shards_rebuilt when rows_base divides
    # evenly into the shard layout — ceil(rows/(rows//num_shards)) can
    # read num_shards+1 for arbitrary N (ADVICE r11), and the meter's own
    # arithmetic is the ground truth the ladder should report.
    rep0 = hnsw_delta_report(
        base_shards, base_shards.limit(0)).collect()[0].asDict()
    step0 = {"step": 0, **rep0}
    step0.update(measure("base", layout, resident, exact))
    out["ladder"] = [step0]
    exact.unpersist()

    deltas = None
    for i, batch in enumerate(batches, start=1):
        nb = out["batch_rows"][i - 1]
        t0 = time.perf_counter()
        s_i = hnsw_delta_shards(batch, layout, m=8, ef_construction=64,
                                seed=3, n_delta=nb).cache()
        s_i.count()
        absorb_s = round(time.perf_counter() - t0, 3)
        deltas = s_i if deltas is None else deltas.unionByName(s_i)
        layout = base_shards.unionByName(deltas)
        resident = resident.unionByName(batch)

        rep = hnsw_delta_report(base_shards, deltas).collect()[0].asDict()
        exact = knn(resident, queries, k=10, method="gemm").groupBy(
            "qid").agg(F.collect_list("id").alias("neighbors")).cache()
        exact.count()
        step = {"step": i, "absorb_s": absorb_s, **rep}
        step.update(measure(f"absorb{i}", layout, resident, exact))
        out["ladder"].append(step)
        exact.unpersist()
        print(json.dumps(step), file=sys.stderr)

    # The alternative the meter prices: a full rebuild at the end state.
    t0 = time.perf_counter()
    rebuilt = build_hnsw_shards(
        t, m=8, ef_construction=64, num_shards=num_shards, seed=3).cache()
    rebuilt.count()
    out["rebuild_s"] = round(time.perf_counter() - t0, 3)
    out["cumulative_absorb_s"] = round(
        sum(s["absorb_s"] for s in out["ladder"][1:]), 3)
    exact = knn(t, queries, k=10, method="gemm").groupBy("qid").agg(
        F.collect_list("id").alias("neighbors")).cache()
    exact.count()
    out["rebuilt"] = measure("rebuilt", rebuilt, t, exact)
    last = out["ladder"][-1]
    out["end_state"] = {
        "shards_total": last["shards_total"],
        "work_growth": last["work_growth"],
        "search_over_rebuilt": round(
            last["search_s"] / max(out["rebuilt"]["search_s"], 1e-9), 3),
        "rebuild_over_cumulative_absorb": round(
            out["rebuild_s"] / max(out["cumulative_absorb_s"], 1e-9), 2)}

    print(json.dumps(out))
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
