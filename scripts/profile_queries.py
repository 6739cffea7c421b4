#!/usr/bin/env python
"""Per-query cost decomposition (optimization-round guide §1): split each
declared query's wall time into

  build  — queries()[name](spark, sf) returning a DataFrame: includes all
           driver-side work done eagerly (index fits, collect-based
           calibration, persists triggered by count()),
  plan   — explainString("formatted"): Catalyst analysis + optimization +
           physical planning of the final frame,
  exec   — the noop-sink write of the planned frame (bench.py's timed
           action), net of the above.

A query dominated by `build`/`plan` is a driver-bound fixed cost that no
shuffle tuning will move; a query dominated by `exec` is where the
cluster-side plan shape matters.  Prints one JSON line per query and a
total line.

Usage: python scripts/profile_queries.py [query ...]   (default: all)
Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from bigvectorbench_spark import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    if not names:
        names = list(qs)
    # Warmup as bench.py does.
    from bigvectorbench_spark.sources.tables import TABLES, load_table
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    spark.range(1000).repartition(8).mapInPandas(
        lambda it: it, schema="id long").count()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    rows = []
    for name in names:
        try:
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().explainString(mode)
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            rec = {"query": name, "build": round(t1 - t0, 3),
                   "plan": round(t2 - t1, 3), "exec": round(t3 - t2, 3),
                   "total": round(t3 - t0, 3)}
        except Exception as e:
            rec = {"query": name, "error": str(e).splitlines()[0][:160]}
        finally:
            spark.catalog.clearCache()
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    ok = [r for r in rows if "error" not in r]
    print(json.dumps({
        "n": len(ok),
        "build_total": round(sum(r["build"] for r in ok), 2),
        "plan_total": round(sum(r["plan"] for r in ok), 2),
        "exec_total": round(sum(r["exec"] for r in ok), 2),
        "total": round(sum(r["total"] for r in ok), 2)}), flush=True)


if __name__ == "__main__":
    main()
