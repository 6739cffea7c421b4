#!/usr/bin/env python
"""Benchmark CLI — the reference's `python run.py` analog (SURVEY §3.1).

Expands the algorithm grid for a fixture dataset, skips already-run
definitions (result catalog anti-join), executes load→build→search→score,
and writes the metrics CSV + packed results tree.

Example:
  python scripts/run_benchmark.py --dataset random-xs-32-euclidean \
      --algorithm ivf --count 10 --runs 2 --out /tmp/bvb_results
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigvectorbench_spark import fixtures as fx
from bigvectorbench_spark import harness as hz
from bigvectorbench_spark import get_spark
from bigvectorbench_spark.sources.vectors import write_results, load_all_results

GRIDS = {
    "flat-expr": dict(build_grid=None, query_grid=None),
    "flat-gemm": dict(build_grid=None, query_grid=None),
    "ivf": dict(build_grid={"nlist": [8, 16]}, query_grid={"nprobe": [1, 2, 4, 8]}),
    "hnsw": dict(build_grid={"M": [8], "efConstruction": [64]},
                 query_grid={"ef": [16, 64, 256]}),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="random-xs-32-euclidean",
                    choices=sorted(fx.REGISTRY))
    ap.add_argument("--algorithm", default="all",
                    choices=["all", *sorted(GRIDS)])
    ap.add_argument("--count", type=int, default=10)   # main.py:176-180 default k
    ap.add_argument("--runs", type=int, default=2)     # best-of-N (main.py:206-212)
    ap.add_argument("--max-queries", type=int, default=100)
    ap.add_argument("--out", default="/tmp/bvb_results")
    ap.add_argument("--force", action="store_true", help="re-run existing results")
    args = ap.parse_args()

    spark = get_spark("bvb-run")
    spark.sparkContext.setLogLevel("ERROR")

    loaded = fx.REGISTRY[args.dataset](spark)
    train, test = loaded[0].cache(), loaded[1].limit(args.max_queries).cache()

    algos = sorted(GRIDS) if args.algorithm == "all" else [args.algorithm]
    defs = []
    for algo in algos:
        defs += hz.expand_definitions(algo, args.dataset, args.count, **GRIDS[algo])

    catalog = None
    metrics_path = os.path.join(args.out, "metrics")
    if not args.force and os.path.isdir(metrics_path):
        catalog = spark.read.option("header", True).csv(metrics_path)
    todo = hz.filter_already_run(spark, defs, catalog)
    print(f"{len(defs)} definitions, {len(todo)} to run", file=sys.stderr)

    from bigvectorbench_spark.operators.groundtruth import build_groundtruth
    gt = build_groundtruth(train, test, k=args.count, method="expr").cache()

    results = []
    for d in todo:
        r = hz.run_definition(spark, d, train, test, gt, runs=args.runs)
        print(f"  {d.label}: recall={r.mean_recall:.4f} qps={r.qps:.1f} "
              f"build={r.build_time:.2f}s", file=sys.stderr)
        write_results(r.results, os.path.join(args.out, "results"),
                      dataset=d.dataset, count=d.count, algo=d.label)
        results.append(r)

    if results:
        m = hz.metrics_rows(spark, results)
        if catalog is not None:
            m = catalog.select(*m.columns).unionByName(m)
        hz.export_metrics(m, metrics_path)
        m.orderBy("label").show(100, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
