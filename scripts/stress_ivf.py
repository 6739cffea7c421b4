#!/usr/bin/env python
"""IVF-at-scale stress: build the KMeans/partition-pruned index on a
synthesized clustered corpus and sweep nprobe, reporting the recall/QPS
trade-off against the exact GEMM baseline — the approximate path's evidence
that cell pruning buys throughput at controlled recall.

Usage: python scripts/stress_ivf.py [n_rows] [dim] [n_queries] [nlist]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from bigvectorbench_spark import get_spark
from bigvectorbench_spark.operators.knn import knn
from bigvectorbench_spark.operators.similarity import IVFIndex, candidate_counts


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    q = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    nlist = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    centers = 256

    spark = get_spark("stress-ivf")
    spark.sparkContext.setLogLevel("ERROR")
    parts = spark.sparkContext.defaultParallelism

    # clustered corpus (gaussian blobs) — IVF's intended data shape
    def gen(batches):
        import pandas as pd
        C = np.random.RandomState(0).randn(centers, d) * 3.0
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = []
            for i in ids:
                rng = np.random.RandomState(int(i) % (2**31))
                c = C[int(i) % centers]
                out.append((c + rng.randn(d)).astype(np.float32).tolist())
            yield pd.DataFrame({"id": ids, "vec": out})

    train = (spark.range(n).repartition(parts)
             .mapInPandas(gen, schema="id bigint, vec array<float>").cache())
    train.count()
    queries = (spark.range(q)
               .mapInPandas(gen, schema="id bigint, vec array<float>")
               .withColumnRenamed("id", "qid").cache())
    queries.count()

    t0 = time.perf_counter()
    exact = knn(train, queries, k=10, method="gemm")
    exact_pairs = {(r["qid"], r["id"]) for r in exact.collect()}
    t_exact = time.perf_counter() - t0
    print(f"exact gemm: {t_exact:.2f}s ({q / t_exact:.1f} QPS)", flush=True)

    t0 = time.perf_counter()
    idx = IVFIndex.fit(train, nlist=nlist, seed=1, sample_fraction=min(1.0, 50_000 / n))
    indexed = idx.assign(train).cache()
    indexed.count()
    print(f"index build (fit+assign): {time.perf_counter() - t0:.2f}s", flush=True)

    for nprobe in (1, 2, 4, 8, 16):
        t0 = time.perf_counter()
        got = idx.search(indexed, queries, k=10, nprobe=nprobe)
        pairs = {(r["qid"], r["id"]) for r in got.collect()}
        dt = time.perf_counter() - t0
        recall = len(pairs & exact_pairs) / len(exact_pairs)
        cand = candidate_counts(idx, indexed, queries, nprobe=nprobe)
        avg_cand = cand.agg(F.avg("n_candidates")).first()[0]
        print(f"nprobe={nprobe:3d}: recall={recall:.4f}  {dt:6.2f}s "
              f"({q / dt:6.1f} QPS)  avg candidates={avg_cand:,.0f}/{n}", flush=True)


if __name__ == "__main__":
    main()
