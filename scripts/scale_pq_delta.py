#!/usr/bin/env python
"""Incremental PQ maintenance at serving scale — absorb vs rebuild plus
the distortion meter's sensitivity (round 11; the SCALE_IVF_DELTA /
SCALE_HNSW_DELTA twin for the PQ family).

Setup: 200k x 32-d blobs corpus, 90/10 split (the ivf_delta convention).
Measured:

  - base: codebook fit + encode wall (the sunk M2 cost)
  - ABSORB: encode the 10% arrivals with the FROZEN base codebooks —
    map-only, zero stored-code bytes rewritten
  - REBUILD: refit codebooks on base ∪ delta + re-encode everything
    (what absorb avoids)
  - pq_delta_report wall + values for TWO arrival shapes:
    in-distribution (the held-out delta) and SHIFTED (+4 on every dim)
    — the meter must read ≈1 for the former and >>1 for the latter,
    at one aggregate pass over the union
  - serving parity: ADC+refine search recall vs exact kNN for the
    absorbed (base books over base∪delta codes) and rebuilt indexes —
    the quality trade absorb makes under in-distribution arrivals

Usage: python scripts/scale_pq_delta.py [N_ROWS] [OUT_JSON]
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
from bigvectorbench_spark.operators.knn import knn
from bigvectorbench_spark.operators.pq import PQIndex, pq_delta_report

M, KSUB = 8, 256


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else "SCALE_PQ_DELTA_r11.json"

    spark = get_spark("scale-pq-delta")
    spark.sparkContext.setLogLevel("ERROR")
    from bigvectorbench_spark import fixtures as fx

    train, test = fx.random_float(spark, n, 32, centers=100, seed=7)
    t = train.cache()
    base = t.filter("id % 10 != 0").cache()
    delta = t.filter("id % 10 = 0").cache()
    queries = test.limit(100).cache()
    out = {"corpus_rows": t.count(), "base_rows": base.count(),
           "delta_rows": delta.count(), "n_queries": queries.count(),
           "m": M, "ksub": KSUB}

    t0 = time.perf_counter()
    idx = PQIndex.fit(base, m=M, ksub=KSUB, seed=1, sort_col="id")
    base_codes = idx.encode(base).cache()
    base_codes.count()
    out["base_fit_encode_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    delta_codes = idx.encode(delta).cache()
    delta_codes.count()
    out["absorb_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    idx_r = PQIndex.fit(t, m=M, ksub=KSUB, seed=1, sort_col="id")
    rebuilt_codes = idx_r.encode(t).cache()
    rebuilt_codes.count()
    out["rebuild_s"] = round(time.perf_counter() - t0, 3)
    out["rebuild_over_absorb"] = round(
        out["rebuild_s"] / max(out["absorb_s"], 1e-9), 2)

    # ---- the meter: in-distribution vs shifted arrivals ----
    t0 = time.perf_counter()
    rep = pq_delta_report(idx, base_codes, delta_codes).collect()[0]
    out["report_s"] = round(time.perf_counter() - t0, 3)
    out["report_indist"] = {k: rep[k] for k in rep.asDict()}

    shifted = delta.withColumn(
        "vec", F.transform("vec", lambda x: x + F.lit(4.0)))
    rep_s = pq_delta_report(idx, base_codes, idx.encode(shifted)).collect()[0]
    out["report_shifted"] = {k: rep_s[k] for k in rep_s.asDict()}

    # ---- serving parity under in-distribution arrivals ----
    exact = knn(t, queries, k=10, method="gemm").groupBy("qid").agg(
        F.collect_list("id").alias("neighbors")).cache()
    exact.count()
    for label, (index, codes) in (
            ("absorbed", (idx, base_codes.unionByName(delta_codes))),
            ("rebuilt", (idx_r, rebuilt_codes))):
        walls = []
        for _ in range(2):           # best-of-2: first pass carries warmup
            t0 = time.perf_counter()
            got = index.search(codes.select("id", "codes"), queries, k=10,
                               refine_train=t, overfetch=4).groupBy(
                "qid").agg(F.collect_list("id").alias("neighbors"))
            r = mx.recall_per_query(got, exact).agg(
                F.avg("recall").alias("mean"),
                F.min("recall").alias("min")).collect()[0]
            walls.append(round(time.perf_counter() - t0, 3))
        out[f"{label}_search_s"] = min(walls)
        out[f"{label}_search_runs"] = walls
        out[f"{label}_recall_mean"] = round(r["mean"], 4)
        out[f"{label}_recall_min"] = round(r["min"], 4)

    print(json.dumps(out))
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
