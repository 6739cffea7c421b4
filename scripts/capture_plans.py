#!/usr/bin/env python
"""Capture .explain("formatted") output for declared queries into text
files (the optimization-round evidence convention: plans/rN/<query>_<tag>.txt).

Usage: python scripts/capture_plans.py OUT_DIR TAG [query ...]

With no query list, captures every declared query.  TAG is appended to
the filename (e.g. "before" -> plans/r12/knn_euclid_before.txt).  The
plan is the analyzed+optimized physical plan BEFORE execution (AQE shows
isFinalPlan=false); that is the right artifact for judging plan *shape*
(Exchange count, join strategy, PushedFilters, Python-eval nodes), which
does not depend on runtime re-optimization.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from bigvectorbench_spark import get_spark


def main() -> None:
    out_dir = sys.argv[1]
    tag = sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    if not names:
        names = list(qs)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # a query that cannot even plan is itself news
            plan = f"PLANNING FAILED: {type(e).__name__}: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"  {name}: {len(plan)} chars", file=sys.stderr, flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
