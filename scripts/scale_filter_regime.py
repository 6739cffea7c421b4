#!/usr/bin/env python
"""Filtered-ANN branch-flip evidence at the reference's amazon-5filter
regime (VERDICT r7 ask #5; reference README.md:178-186 — 15.9M rows,
0.01-1% filter ratios): a 2M-row blob corpus with uniform labels, 100
range queries per selectivity regime (0.1%, 1%, 25%), and three
executions per regime:

  - exact pre-filter (filtered_knn: predicate first, exact scoring of the
    survivors — the reference's pre-filter branch, always exact)
  - filtered-IVF pre branch (predicate inside the probed cells)
  - filtered-IVF post branch (label-blind ANN over-fetch k*1.5/sel, then
    the predicate on the candidates)

The G5 claim under test: at 0.1% selectivity filter-first wins (2k
survivors per query are cheaper than any over-fetch), at 20%+ the
ANN-first post branch wins (over-fetch is k*6 rows per query while
filter-first scores 500k survivors per query).  Recall for the IVF
branches is measured against the exact result — pruning can lose
matches, and the JSON records how many honestly.

Usage: python scripts/scale_filter_regime.py [N] [OUT_JSON]
Writes one JSON line per regime to OUT_JSON (default
SCALE_FILTER_IVF_r8.json).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import Window, functions as F

from bigvectorbench_spark import get_spark
from bigvectorbench_spark.operators import metrics as mx
from bigvectorbench_spark.operators.filter_knn import filtered_ivf_knn, filtered_knn
from bigvectorbench_spark.operators.similarity import IVFIndex

RUNS = 2
D = 32
CENTERS = 100
MAX_LABEL = 10_000
N_QUERIES = 100
K = 10
TEMPLATE = "label_0 >= {lo} and label_0 <= {hi}"
RATIOS = (0.001, 0.01, 0.25)


def ensure_corpus(n: int, root: str) -> str:
    """Sharded blob corpus (id, vec float32 d=32, label_0 uniform int) —
    the gen_vec.py pattern so the scan parallelizes; blobs so IVF cells
    carry real structure (the fixtures.make_blobs distribution)."""
    out = os.path.join(root, f"filter_blob{n}")
    tbl = os.path.join(out, "train.parquet")
    if os.path.exists(os.path.join(tbl, "_SUCCESS")):
        return out
    os.makedirs(tbl, exist_ok=True)
    rng = np.random.RandomState(1)
    C = rng.randn(CENTERS, D) * 5
    shards = 32
    per = n // shards
    for s in range(shards):
        lo = s * per
        hi = n if s == shards - 1 else lo + per
        idx = rng.randint(0, CENTERS, size=hi - lo)
        X = (C[idx] + rng.randn(hi - lo, D)).astype(np.float32)
        pq.write_table(pa.table({
            "id": np.arange(lo, hi, dtype=np.int64),
            "vec": pa.array(list(X), pa.list_(pa.float32())),
            "label_0": pa.array(rng.randint(0, MAX_LABEL, hi - lo), pa.int32()),
        }), f"{tbl}/part-{s:05d}.parquet")
    open(f"{tbl}/_SUCCESS", "w").close()
    # query block: perturbed copies of every (n // N_QUERIES)-th corpus row
    qrng = np.random.RandomState(2)
    qidx = np.arange(0, n, max(1, n // N_QUERIES))[:N_QUERIES]
    sidx = qidx // per
    rows = []
    for qi, q in enumerate(qidx):
        shard = pq.read_table(
            f"{tbl}/part-{min(int(sidx[qi]), shards - 1):05d}.parquet")
        off = int(q - sidx[qi] * per)
        v = np.array(shard.column("vec")[off].as_py(), dtype=np.float32)
        rows.append((int(q), (v + qrng.randn(D).astype(np.float32) * 0.05)))
    qtbl = pa.table({
        "qid": np.array([r[0] for r in rows], dtype=np.int64),
        "vec": pa.array([list(map(float, r[1])) for r in rows],
                        pa.list_(pa.float32())),
    })
    pq.write_table(qtbl, os.path.join(out, "queries.parquet"))
    return out


def best_of(fn, runs=RUNS):
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(round(time.perf_counter() - t0, 3))
    return min(times), times


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _recall(approx, exact):
    a = approx.groupBy("qid").agg(F.collect_list("id").alias("neighbors"))
    b = exact.groupBy("qid").agg(F.collect_list("id").alias("neighbors"))
    r = mx.recall_per_query(a, b).agg(
        F.avg("recall"), F.min("recall")).collect()[0]
    return round(float(r[0]), 4), round(float(r[1]), 4)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALE_FILTER_IVF_r8.json"
    root = os.environ.get("SPARK_GRAFT_GEN_DIR", "testdata_gen")
    path = ensure_corpus(n, root)

    spark = get_spark("scale-filter-regime")
    spark.sparkContext.setLogLevel("ERROR")
    train = spark.read.parquet(os.path.join(path, "train.parquet")).cache()
    train.count()
    qbase = spark.read.parquet(os.path.join(path, "queries.parquet"))

    nlist = max(8, int(math.sqrt(n) / 4))
    t0 = time.perf_counter()
    idx = IVFIndex.fit(train, nlist=nlist, seed=1, max_iter=8,
                       max_sample_rows=200_000, sort_col="id")
    indexed = idx.assign(train).cache()
    indexed.count()
    build_s = round(time.perf_counter() - t0, 3)

    rng = np.random.RandomState(3)
    with open(out_path, "w") as f:
        hdr = {"corpus_rows": n, "nlist": nlist, "nprobe": 8,
               "build_s": build_s, "probed_fraction": round(8 / nlist, 4)}
        print(json.dumps(hdr), flush=True)
        f.write(json.dumps(hdr) + "\n")
        for ratio in RATIOS:
            width = max(1, int(round(MAX_LABEL * ratio)))
            left = rng.randint(0, MAX_LABEL - width, size=N_QUERIES)
            lo_hi = spark.createDataFrame(
                [(int(i), int(l), int(l + width - 1))
                 for i, l in enumerate(left)], "i bigint, lo int, hi int")
            q = (qbase.withColumn(
                "i", F.row_number().over(Window.orderBy("qid")) - 1)
                 .join(F.broadcast(lo_hi), "i").drop("i")).cache()
            q.count()

            row = {"ratio": ratio, "width": width}
            kw = dict(filter_template=TEMPLATE, query_param_cols=["lo", "hi"])
            row["realized_selectivity"] = round(width / MAX_LABEL, 5)
            # time the exact leg BEFORE caching it for the recall compare —
            # a pre-registered cache on the identical logical plan would
            # turn the repeat runs into cache reads (observed 29.2s -> 0.15s)
            row["exact_prefilter_s"], row["exact_runs"] = best_of(
                lambda: _noop(filtered_knn(train, q, k=K, **kw)))
            exact = filtered_knn(train, q, k=K, **kw).cache()
            for strat in ("pre", "post"):
                t_s, t_runs = best_of(lambda: _noop(filtered_ivf_knn(
                    idx, indexed, q, k=K, nprobe=8, strategy=strat,
                    selectivity=ratio, **kw)))
                approx = filtered_ivf_knn(
                    idx, indexed, q, k=K, nprobe=8, strategy=strat,
                    selectivity=ratio, **kw)
                rm, rmin = _recall(approx, exact)
                row[f"ivf_{strat}_s"], row[f"ivf_{strat}_runs"] = t_s, t_runs
                row[f"ivf_{strat}_recall_mean"] = rm
                row[f"ivf_{strat}_recall_min"] = rmin
            legs = {"exact_prefilter": row["exact_prefilter_s"],
                    "ivf_pre": row["ivf_pre_s"], "ivf_post": row["ivf_post_s"]}
            row["fastest"] = min(legs, key=legs.get)
            print(json.dumps(row), flush=True)
            f.write(json.dumps(row) + "\n")
            f.flush()
            exact.unpersist()
            q.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
