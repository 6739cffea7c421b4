#!/usr/bin/env python
"""Scale evidence for incremental IVF maintenance (ivf_delta_*).

Question measured: when 10% new data arrives, what does ABSORBING it cost
(assign-only against the existing centroids) versus REBUILDING (refit on
the full corpus + reassign everything), and what does the shortcut cost in
recall?  Per corpus size:

  - fit_base_s      fit on the 90% base (the sunk cost, paid once)
  - assign_delta_s  assign the 10% delta to existing centroids (the
                    incremental path — map-only)
  - refit_all_s     fit on 100% + assign 100% (the rebuild)
  - recall of nprobe search over the incremental layout vs the rebuilt
    layout, both against exact kNN (same fixed ~100-query block)

Usage: python scripts/scale_ivf_delta.py [N_SMALL N_BIG] [OUT_JSON]
Reuses the scale_bq blob corpora (testdata_gen/bq_blob<n>_d64).
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
from bigvectorbench_spark.operators import metrics as mx
from bigvectorbench_spark.operators.knn import knn
from bigvectorbench_spark.operators.similarity import IVFIndex, ivf_delta_report
from scripts.scale_bq import gen_corpus


def _recall(spark, approx, exact):
    a = approx.groupBy("qid").agg(F.collect_list("id").alias("neighbors"))
    e = exact.groupBy("qid").agg(F.collect_list("id").alias("neighbors"))
    r = mx.recall_per_query(a, e).agg(F.avg("recall")).collect()[0]
    return round(float(r[0]), 4)


def measure(spark, n: int, root: str) -> dict:
    path = gen_corpus("blob", n, os.path.join(root, f"bq_blob{n}_d64"), 64)
    t = spark.read.parquet(path).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")).cache()
    t.count()
    base, delta = t.filter("id % 10 != 0"), t.filter("id % 10 = 0")
    nlist = max(8, int(math.sqrt(n) / 4))
    nprobe = max(2, nlist // 8)
    out = {"corpus_rows": n, "nlist": nlist, "nprobe": nprobe}

    t0 = time.perf_counter()
    idx = IVFIndex.fit(base, nlist=nlist, seed=1, max_iter=8, sort_col="id")
    base_assigned = idx.assign(base).cache()
    base_assigned.count()
    out["fit_base_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    delta_assigned = idx.assign(delta).cache()
    delta_assigned.count()
    out["assign_delta_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    idx_full = IVFIndex.fit(t, nlist=nlist, seed=1, max_iter=8, sort_col="id")
    full_assigned = idx_full.assign(t).cache()
    full_assigned.count()
    out["refit_all_s"] = round(time.perf_counter() - t0, 3)
    out["absorb_vs_rebuild"] = round(
        out["refit_all_s"] / max(out["assign_delta_s"], 1e-9), 1)

    step = max(1, n // 100)
    q = t.filter(F.col("id") % step == 1).select(
        F.col("id").alias("qid"), "vec").limit(100)
    exact = knn(t, q, k=10, method="gemm").cache()
    exact.count()
    incr = base_assigned.unionByName(delta_assigned)
    out["recall_incremental"] = _recall(
        spark, idx.search(incr, q, k=10, nprobe=nprobe), exact)
    out["recall_rebuilt"] = _recall(
        spark, idx_full.search(full_assigned, q, k=10, nprobe=nprobe), exact)

    rep = ivf_delta_report(idx, base_assigned, delta_assigned).collect()
    occ = [r["n_base"] + r["n_delta"] for r in rep]
    out["cell_occupancy_max_over_mean"] = round(max(occ) / (sum(occ) / len(occ)), 2)
    spark.catalog.clearCache()
    return out


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    out_path = sys.argv[3] if len(sys.argv) > 3 else "SCALE_IVF_DELTA_r7.json"
    root = os.environ.get("SPARK_GRAFT_GEN_DIR", "testdata_gen")
    spark = get_spark("scale-ivf-delta")
    spark.sparkContext.setLogLevel("ERROR")
    with open(out_path, "w") as f:
        for n in (n_small, n_big):
            row = measure(spark, n, root)
            print(json.dumps(row), flush=True)
            f.write(json.dumps(row) + "\n")
            f.flush()


if __name__ == "__main__":
    main()
