#!/usr/bin/env python
"""SemDeDup scale measurement: semantic_dup_pairs across embedding-corpus
decades with the published knob — cluster count PROPORTIONAL to corpus
size, so per-cluster pair work stays constant and total candidate work
grows linearly instead of the brute path's quadratic.

Each input dir (scripts/gen_vec.py output) is unioned with deterministic
perturbed twins (the srp_recall corpus construction: +0.02 on every 7th
coordinate, cosine ≈0.998) so every row has exactly one true near-dup and
the verify stage does real work.  Reported per dir:

- wall: best-of-N noop-sink time of the full pipeline (fit + assign +
  within-cluster pairs ≥ 0.95);
- cand_pairs: Σ |cluster|·(|cluster|−1)/2 — the measured candidate volume
  the cluster partition admits (the quantity that must grow ~linearly);
- twin_recall: fraction of planted twin pairs recovered (k-means boundary
  misses are the published trade-off; twins are near-colinear so this
  should stay ≈1.0).

Usage: python scripts/scale_semdedup.py VEC_DIR [VEC_DIR ...]
  e.g. python scripts/gen_vec.py 20000  /tmp/vec20k
       python scripts/gen_vec.py 200000 /tmp/vec200k
       python scripts/scale_semdedup.py /tmp/vec20k /tmp/vec200k
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigvectorbench_spark import get_spark
from bigvectorbench_spark.operators import dedup as dd
from bigvectorbench_spark.operators.similarity import IVFIndex

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
ROWS_PER_CLUSTER = int(os.environ.get("SPARK_GRAFT_SEMDEDUP_CLUSTER", "2500"))
TWIN_OFFSET = 10_000_000


def perturbed(emb):
    """base ∪ twins at id+TWIN_OFFSET (q_embedding_cosine_dups_srp corpus)."""
    pert = emb.select(
        (F.col("vec_id") + TWIN_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x + F.when(i % 7 == 0, F.lit(0.02)).otherwise(F.lit(0.0)),
        ).cast("array<float>").alias("embedding"),
    )
    return emb.select("vec_id", "embedding").unionByName(pert)


def main() -> None:
    spark = get_spark("scale-semdedup")
    spark.sparkContext.setLogLevel("ERROR")
    for d in sys.argv[1:]:
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        n = emb.count()
        corpus = perturbed(emb).cache()
        corpus.count()
        nlist = max(8, (2 * n) // ROWS_PER_CLUSTER)
        pipe = dd.semantic_dup_pairs(corpus, threshold=0.95, nlist=nlist)
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            pipe.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        # candidate volume admitted by the partition (one assignment pass)
        idx = IVFIndex.fit(
            corpus.select(F.col("vec_id").alias("id"),
                          F.col("embedding").alias("vec")),
            vec_col="vec", nlist=nlist, sort_col="id")
        sizes = (idx.assign(corpus.select(F.col("embedding").alias("vec")),
                            vec_col="vec")
                 .groupBy("cluster_id").count().collect())
        cand = sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)
        found = (dd.semantic_dup_pairs(corpus, threshold=0.95, nlist=nlist)
                 .filter(F.col("id_b") - F.col("id_a") == TWIN_OFFSET).count())
        corpus.unpersist()
        print(json.dumps({
            "dir": d, "n_base": n, "n_corpus": 2 * n, "nlist": nlist,
            "wall_runs": times, "wall": min(times),
            "cand_pairs": cand, "twin_recall": round(found / n, 4),
        }, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
