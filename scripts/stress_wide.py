#!/usr/bin/env python
"""Wide-vector stress: the BASELINE workloads go up to 3072-d × 1M rows
(dbpedia, README.md:234-242); the testdata tops out at 64-d × 2000.  This
script synthesizes a deterministic wide corpus at a configurable scale and
compares the expression path against the GEMM path, reporting rows/s — the
evidence that the scale path holds as dimensions and row counts grow.

Usage: python scripts/stress_wide.py [n_rows] [dim] [n_queries]
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


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    q = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    spark = get_spark("stress-wide")
    spark.sparkContext.setLogLevel("ERROR")
    parts = spark.sparkContext.defaultParallelism

    # distributed deterministic generation: per-row seeded numpy inside
    # mapInPandas, so the driver never materializes the corpus
    def gen(batches):
        import pandas as pd
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = []
            for i in ids:
                rng = np.random.RandomState(int(i) % (2**31))
                out.append(rng.rand(d).astype(np.float32).tolist())
            yield pd.DataFrame({"id": ids, "vec": out})

    train = (
        spark.range(n).repartition(parts)
        .mapInPandas(gen, schema="id bigint, vec array<float>")
        .cache()
    )
    train.count()  # materialize
    queries = (
        spark.range(q).withColumn("qid", F.col("id"))
        .mapInPandas(gen, schema="id bigint, vec array<float>")
        .withColumnRenamed("id", "qid")
    ).cache()
    queries.count()

    for method in ("gemm", "expr"):
        t0 = time.perf_counter()
        knn(train, queries, k=10, method=method).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        pairs = n * q
        print(f"{method:5s}  n={n} d={d} q={q}  {dt:7.2f}s  "
              f"{pairs/dt/1e6:8.1f}M pairs/s  {n*q*d/dt/1e9:6.2f} GFLOP-ish/s",
              flush=True)


if __name__ == "__main__":
    main()
