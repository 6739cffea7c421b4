#!/usr/bin/env python
"""PQ-at-scale stress: encode a synthesized clustered corpus to m smallint
codes per vector, then compare exact GEMM, pure ADC, ADC+refine, and IVF+PQ
on time and recall — the evidence that the coded scan trades bounded recall
loss for a ~(4·dsub)× bandwidth cut, and that refine restores quality for a
few thousand extra float-row reads.

Usage: python scripts/stress_pq.py [n_rows] [dim] [n_queries] [m] [ksub]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bigvectorbench_spark import get_spark
from bigvectorbench_spark.operators.knn import knn
from bigvectorbench_spark.operators.pq import PQIndex, ivfpq_search
from bigvectorbench_spark.operators.similarity import IVFIndex


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    q = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    m = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    ksub = int(sys.argv[5]) if len(sys.argv) > 5 else 256
    centers = 256

    spark = get_spark("stress-pq")
    spark.sparkContext.setLogLevel("ERROR")
    parts = spark.sparkContext.defaultParallelism

    # Realistic embedding-like spectrum: per-dim noise decays geometrically,
    # so a few leading dims carry most of the distance signal (isotropic
    # white noise would make within-cluster ranking information-free for ANY
    # compressed representation — not a useful stress).
    scales = (3.0 * (0.97 ** np.arange(d))).astype(np.float32)

    def gen(batches):
        import pandas as pd
        C = np.random.RandomState(0).randn(centers, d) * 3.0
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = []
            for i in ids:
                rng = np.random.RandomState(int(i) % (2**31))
                c = C[int(i) % centers]
                out.append((c + rng.randn(d) * scales).astype(np.float32).tolist())
            yield pd.DataFrame({"id": ids, "vec": out})

    train = (spark.range(n).repartition(parts)
             .mapInPandas(gen, schema="id bigint, vec array<float>").cache())
    train.count()
    queries = (spark.range(q)
               .mapInPandas(gen, schema="id bigint, vec array<float>")
               .withColumnRenamed("id", "qid").cache())
    queries.count()

    t0 = time.perf_counter()
    exact_pairs = {(r["qid"], r["id"]) for r in knn(train, queries, k=10, method="gemm").collect()}
    t_exact = time.perf_counter() - t0
    print(f"exact gemm: {t_exact:.2f}s ({q / t_exact:.1f} QPS)", flush=True)

    t0 = time.perf_counter()
    pq = PQIndex.fit(train, m=m, ksub=ksub, seed=1, max_sample_rows=50_000)
    encoded_full = pq.encode(train)  # float col still present for ivf.assign
    encoded = encoded_full.drop("vec").cache()
    encoded.count()
    print(f"pq build (fit+encode, m={m} ksub={ksub}): "
          f"{time.perf_counter() - t0:.2f}s  "
          f"(codes {2 * m}B/vec vs {4 * d}B/vec float)", flush=True)

    def run(tag, df):
        t0 = time.perf_counter()
        pairs = {(r["qid"], r["id"]) for r in df.collect()}
        dt = time.perf_counter() - t0
        rec = len(pairs & exact_pairs) / len(exact_pairs)
        print(f"{tag}: recall={rec:.4f}  {dt:6.2f}s ({q / dt:6.1f} QPS)", flush=True)

    run("adc        ", pq.search(encoded, queries, k=10))
    for of in (4, 16, 64):
        run(f"adc+ref o{of:2d}", pq.search(encoded, queries, k=10,
                                           refine_train=train, overfetch=of))

    t0 = time.perf_counter()
    ivf = IVFIndex.fit(train, nlist=64, seed=1, sample_fraction=min(1.0, 50_000 / n))
    table = ivf.assign(encoded_full).drop("vec").cache()
    table.count()
    print(f"ivf layer (fit+assign): {time.perf_counter() - t0:.2f}s", flush=True)
    # overfetch=16 so the refine ceiling (~ADC ranking quality) sits above
    # the nprobe effect being measured; at overfetch=4 every nprobe reads
    # the same 0.39 ceiling and the sweep is uninformative
    for nprobe in (4, 8, 16):
        run(f"ivfpq np={nprobe:2d}", ivfpq_search(ivf, pq, table, queries, k=10,
                                                  nprobe=nprobe,
                                                  refine_train=train, overfetch=16))


if __name__ == "__main__":
    main()
