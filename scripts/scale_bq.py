#!/usr/bin/env python
"""Scale evidence for the BQ (binary quantization) family.

For each corpus (two distributions × two sizes, a decade apart):

  - BQ search wall (fit + encode cached once; hamming pre-rank + exact
    refine, best-of-N) at overfetch 4 and 32
  - brute GEMM kNN wall on the identical ~100-query block (the baseline)
  - recall vs exact kNN at each overfetch
  - the width argument: candidate stage reads n·(d/64) longs vs n·d floats

Distributions: "iid" is the sf-table distribution (N(0, 0.13²) — the
worst case for 1-bit codes: signs of iid Gaussians carry little
neighborhood information, mirroring the PQ/HNSW iid decay SCALING.md
documents) and "blob" is an anisotropic mixture (256 centers), the shape
real embedding spaces have and the case BQ is deployed for.

Usage: python scripts/scale_bq.py [N_SMALL N_BIG]   (default 20000 200000)
Writes one JSON line per (distribution, size); check the decade ratios in.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigvectorbench_spark import get_spark
from bigvectorbench_spark.operators import metrics as mx
from bigvectorbench_spark.operators.bq import BQIndex
from bigvectorbench_spark.operators.knn import knn

RUNS = 3


def best_of(fn, runs=RUNS):
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(round(time.perf_counter() - t0, 3))
    return min(times), times


def gen_corpus(kind: str, n: int, out_dir: str, d: int = 64) -> str:
    out = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(42)
    centers = rng.randn(256, d).astype(np.float32) * 0.13  # blob mode only
    shards = min(32, max(1, n // 6250))
    per = n // shards
    for s in range(shards):
        lo = s * per
        hi = n if s == shards - 1 else lo + per
        if kind == "iid":
            emb = (rng.randn(hi - lo, d) * 0.13).astype(np.float32)
        else:
            idx = rng.randint(0, len(centers), hi - lo)
            emb = (centers[idx] + rng.randn(hi - lo, d).astype(np.float32)
                   * np.float32(0.13 * 0.25))
        pq.write_table(pa.table({
            "vec_id": np.arange(lo, hi, dtype=np.int64),
            "embedding": pa.array(list(emb), pa.list_(pa.float32())),
            "label": pa.array(rng.randint(0, 10, hi - lo), pa.int32()),
        }), f"{out}/part-{s:05d}.parquet")
    open(f"{out}/_SUCCESS", "w").close()
    return out


def measure(spark, kind: str, n: int, root: str, d: int = 64) -> dict:
    path = gen_corpus(kind, n, os.path.join(root, f"bq_{kind}{n}_d{d}"), d)
    t = spark.read.parquet(path).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    step = max(1, n // 100)
    q = t.filter(F.col("id") % step == 0).select(
        F.col("id").alias("qid"), "vec").limit(100)
    out = {"distribution": kind, "corpus_rows": n, "dim": d,
           "n_queries": q.count(),
           "candidate_scan_longs_per_row": d // 64,
           "exact_scan_floats_per_row": d}

    t0 = time.perf_counter()
    # fit on a bounded sample (the documented pattern) — at d=1024 a full
    # 200k-row collect would move ~1.6 GB to the driver for a mean
    idx = BQIndex.fit(t, sort_col="id", max_sample_rows=20_000)
    codes = idx.encode(t, keep=["id"]).cache()
    codes.count()
    out["build_s"] = round(time.perf_counter() - t0, 3)

    exact = knn(t, q, k=10, method="gemm").groupBy("qid").agg(
        F.collect_list("id").alias("neighbors"))
    exact.cache().count()

    def _gemm():
        knn(t, q, k=10, method="gemm").write.format(
            "noop").mode("overwrite").save()

    out["gemm_search_s"], out["gemm_runs"] = best_of(_gemm)

    for over in (4, 32):
        def _bq():
            idx.search(codes, q, k=10, refine_train=t, overfetch=over).write.\
                format("noop").mode("overwrite").save()

        wall, runs = best_of(_bq)
        approx = idx.search(codes, q, k=10, refine_train=t,
                            overfetch=over).groupBy("qid").agg(
            F.collect_list("id").alias("neighbors"))
        r = mx.recall_per_query(approx, exact).agg(
            F.avg("recall"), F.min("recall")).collect()[0]
        out[f"bq_search_s_over{over}"] = wall
        out[f"bq_runs_over{over}"] = runs
        out[f"recall_mean_over{over}"] = round(float(r[0]), 4)
        out[f"recall_min_over{over}"] = round(float(r[1]), 4)
    spark.catalog.clearCache()
    return out


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    out_path = sys.argv[3] if len(sys.argv) > 3 else "SCALE_BQ_r7.json"
    root = os.environ.get("SPARK_GRAFT_GEN_DIR", "testdata_gen")
    spark = get_spark("scale-bq")
    spark.sparkContext.setLogLevel("ERROR")
    jobs = ([("blob", n, 64) for n in (n_small, n_big)]
            + [("iid", n, 64) for n in (n_small, n_big)]
            # the width argument in its element: wide vectors, one decade
            + [("blob", n, 1024) for n in (n_small, n_big)])
    with open(out_path, "w") as f:
        for kind, n, d in jobs:
            row = measure(spark, kind, n, root, d=d)
            print(json.dumps(row), flush=True)
            f.write(json.dumps(row) + "\n")
            f.flush()


if __name__ == "__main__":
    main()
