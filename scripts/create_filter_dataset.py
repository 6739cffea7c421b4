#!/usr/bin/env python
"""Controlled filter-ratio dataset creation CLI — the reference's
create_artificial_datasets.py entry point (286-520) re-expressed for the
parquet/Spark data plane (VERDICT r6 missing #4).

Writes under --out:
  train.parquet   (id, vec, label_0..)        — staggered-magnitude labels
  test.parquet    (qid, vec, label_l/r_0..)   — ranges targeting --ratio
  groundtruth.parquet (qid, id, dist, rank)   — EXACT filtered kNN top-k
  meta.json       — filter template, param cols, requested vs REALIZED ratio

The realized-ratio report is the point of the tool: the reference's
filter-ANN study depends on queries whose predicate keeps a controlled
fraction (amazon-5filter: 0.01-1%), so the CLI measures the mean/min/max
per-query selectivity it actually produced next to the request.

Usage: python scripts/create_filter_dataset.py --n 20000 --ratio 0.01 \
    --n-filters 2 --out /tmp/filter_ds
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigvectorbench_spark import get_spark
from bigvectorbench_spark import fixtures as fx
from bigvectorbench_spark.operators.filter_knn import (
    compile_filter_template, filtered_knn, QUERY_PREFIX)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--n-filters", type=int, default=1)
    ap.add_argument("--max-labels", type=int, default=10_000)
    ap.add_argument("--ratio", type=float, default=0.01)
    ap.add_argument("--m-test", type=int, default=1_000)
    ap.add_argument("--topk", type=int, default=100)   # reference default k
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    spark = get_spark("create-filter-dataset")
    spark.sparkContext.setLogLevel("ERROR")
    train, test, template, param_cols = fx.random_filter_ratio(
        spark, n=args.n, d=args.d, n_filters=args.n_filters,
        max_labels=args.max_labels, ratio=args.ratio, m_test=args.m_test,
        seed=args.seed)
    train, test = train.cache(), test.cache()

    # realized per-query selectivity (one broadcast join over all queries)
    cond = compile_filter_template(template)
    q_params = test.select(
        F.col("qid"), *[F.col(c).alias(f"{QUERY_PREFIX}{c}") for c in param_cols])
    n_train = train.count()
    sel = (train.crossJoin(F.broadcast(q_params))
           .filter(F.expr(cond))
           .groupBy("qid").agg(F.count("*").alias("m"))
           .agg(F.avg(F.col("m") / n_train).alias("mean"),
                F.min(F.col("m") / n_train).alias("min"),
                F.max(F.col("m") / n_train).alias("max"),
                F.count("*").alias("nonempty_queries")).collect()[0])

    gt = filtered_knn(train, test, k=args.topk, filter_template=template,
                      query_param_cols=param_cols)
    os.makedirs(args.out, exist_ok=True)
    train.write.mode("overwrite").parquet(os.path.join(args.out, "train.parquet"))
    test.write.mode("overwrite").parquet(os.path.join(args.out, "test.parquet"))
    gt.write.mode("overwrite").parquet(
        os.path.join(args.out, "groundtruth.parquet"))

    meta = {
        "n": args.n, "d": args.d, "n_filters": args.n_filters,
        "max_labels": args.max_labels, "m_test": args.m_test,
        "topk": args.topk, "seed": args.seed,
        "filter_template": template, "param_cols": param_cols,
        "ratio_requested": args.ratio,
        "ratio_realized_mean": round(float(sel["mean"]), 6),
        "ratio_realized_min": round(float(sel["min"]), 6),
        "ratio_realized_max": round(float(sel["max"]), 6),
        "nonempty_queries": int(sel["nonempty_queries"]),
    }
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
