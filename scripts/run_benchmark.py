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

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigvectorbench_spark import fixtures as fx
from bigvectorbench_spark import harness as hz
from bigvectorbench_spark import get_spark
from bigvectorbench_spark.sources.vectors import write_results, load_all_results

GRIDS = {
    "flat-expr": dict(build_grid=None, query_grid=None),
    "flat-gemm": dict(build_grid=None, query_grid=None),
    # nprobe="auto" = the calibrated recall-holding rule (auto_nprobe,
    # VERDICT r10 ask #5) — a grid cell beside the fixed knobs
    "ivf": dict(build_grid={"nlist": [8, 16]},
                query_grid={"nprobe": [1, 2, 4, 8, "auto"]}),
    "hnsw": dict(build_grid={"M": [8], "efConstruction": [64]},
                 query_grid={"ef": [16, 64, 256, "auto"]}),
    # reference IVF_PQ / IVF_SQ8 grids (milvus/config.yml:40-75 expanded by
    # definitions.py:240-304): m/nbits build-time, nprobe query-time
    "pq": dict(build_grid={"m": [4, 8], "nbits": [6, 8]},
               query_grid={"overfetch": [1, 4]}),
    "ivfpq": dict(build_grid={"nlist": [8, 16], "m": [4], "nbits": [8]},
                  query_grid={"nprobe": [1, 2, 4, 8]}),
    "sq8": dict(build_grid=None, query_grid=None),
    # binary quantization: center build-time, overfetch query-time (the
    # BIN_* family analog over float data, operators/bq.py)
    "bq": dict(build_grid={"center": [True, False]},
               query_grid={"overfetch": [2, 4, 8]}),
    # OPQ: the PQ grid with the learned rotation in front (iters=0 == PQ)
    "opq": dict(build_grid={"m": [4, 8], "nbits": [6, 8], "iters": [3]},
                query_grid={"overfetch": [1, 4]}),
    # hybrid: per-field subqueries + RRF ranker (reference
    # milvus/module.py:422-458); leg picks the per-field engine, k0/w2 the
    # fusion knobs — recall/QPS Pareto points for fusion configs
    "hybrid": dict(build_grid={"leg": ["brute", "bq"]},
                   query_grid={"k0": [20, 60], "w2": [0.5, 1.0]}),
    # sparse IP (SPARSE_FLOAT_VECTOR analog) on a TEXT dataset: per-term
    # posting cap m build-time (0 = exact, "auto" = the Zipf-calibrated
    # 0.04·n rule, "spectrum" = auto_m_spectrum holding the cut fraction
    # on ANY df spectrum — VERDICT r10 ask #3: the published Pareto must
    # carry the point that fixes auto's non-Zipf failure mode);
    # sparse+dense hybrid adds the derived-hashed-embedding dense leg
    # (brute|bq) and the RRF fusion knobs (VERDICT r8 ask #7)
    "sparse": dict(build_grid={"m": [64, 256, 1024, "auto", "spectrum", 0]},
                   query_grid=None),
    "sparse-hybrid": dict(build_grid={"m": ["auto"], "leg": ["brute", "bq"]},
                          query_grid={"k0": [20, 60], "w2": [0.5, 1.0]}),
}

# Text datasets feed the text algorithms; every other algorithm expects a
# dense/binary `vec` column — `--algorithm all` expands to the compatible
# subset so the default invocation stays runnable.
TEXT_ALGOS = {"sparse", "sparse-hybrid"}


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
    ap.add_argument("--plot", action="store_true",
                    help="render the per-dataset recall/QPS Pareto chart "
                         "(reference plot.py analog) into <out>/plots/")
    args = ap.parse_args()

    spark = get_spark("bvb-run")
    spark.sparkContext.setLogLevel("ERROR")

    loaded = fx.REGISTRY[args.dataset](spark)
    train, test = loaded[0].cache(), loaded[1].limit(args.max_queries).cache()

    is_text = "vec" not in train.columns and "text" in train.columns
    if args.algorithm == "all":
        algos = sorted(TEXT_ALGOS if is_text else set(GRIDS) - TEXT_ALGOS)
    else:
        algos = [args.algorithm]
        if is_text != (args.algorithm in TEXT_ALGOS):
            kind = "text" if is_text else "vector"
            raise SystemExit(
                f"--algorithm {args.algorithm} does not run on a {kind} "
                f"dataset ({args.dataset})")
    defs = []
    for algo in algos:
        defs += hz.expand_definitions(algo, args.dataset, args.count, **GRIDS[algo])

    catalog = None
    metrics_path = os.path.join(args.out, "metrics")
    if not args.force and os.path.isdir(metrics_path):
        try:
            catalog = spark.read.option("header", True).csv(metrics_path)
        except Exception:
            # an interrupted previous run can leave the dir empty — treat
            # it as no catalog rather than bricking every later run
            catalog = None
    todo = hz.filter_already_run(spark, defs, catalog)
    print(f"{len(defs)} definitions, {len(todo)} to run", file=sys.stderr)

    if is_text:
        gt = hz.sparse_exact_groundtruth(train, test, k=args.count).cache()
    else:
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
            typed = catalog.select(
                *[F.col(c).cast(t) for c, t in zip(m.columns, [f.dataType for f in m.schema])])
            merged = typed.unionByName(m)
            # Materialize BEFORE the overwrite: the union lazily reads the
            # same CSV files export_metrics is about to delete (overwrite
            # mode removes them first → FAILED_READ_FILE mid-job).  The
            # catalog is a handful of rows per run — driver-side is free.
            m = spark.createDataFrame(merged.collect(), m.schema)
        hz.export_metrics(m, metrics_path)
        m.orderBy("label").show(100, truncate=False)

    if args.plot:
        from bigvectorbench_spark import plotting as pl

        cat = spark.read.option("header", True).csv(metrics_path)
        for ds_row in cat.select("dataset").distinct().collect():
            ds = ds_row["dataset"]
            data = pl.pointset_from_metrics(
                cat.filter(F.col("dataset") == ds).collect())
            svg = pl.render_pareto_svg(
                data, os.path.join(args.out, "plots", f"{ds}.svg"),
                title=f"{ds} — Recall / Queries per second (k={args.count})")
            png = pl.render_pareto_png(
                data, os.path.join(args.out, "plots", f"{ds}.png"),
                title=f"{ds} — Recall / Queries per second (k={args.count})")
            print(f"wrote {svg}" + (f" and {png}" if png else
                                    " (no matplotlib — SVG only)"),
                  file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
