#!/usr/bin/env python
"""Self-check mirroring the driver's CORRECTNESS gate: run every
``queries()[name]`` on Spark and its ``oracle_sql()[name]`` on DuckDB over
the same parquet tables; compare row count, column names, and sorted values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry
from bigvectorbench_spark import get_spark
from bigvectorbench_spark.sources.tables import TABLES


def normalize(rows, cols):
    """rows: list of dicts; returns sorted tuples in ``cols`` order."""
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            elif hasattr(v, "isoformat"):
                v = v.isoformat()
            elif isinstance(v, list):
                v = tuple(v)
            elif v is not None and type(v).__module__ == "decimal":
                v = round(float(v), 6)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        df = fn(spark, sf)
        cols = sorted(df.columns)
        sp_rows = normalize([r.asDict() for r in df.collect()], cols)
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(sp_rows)} rows ✓(no oracle)")
            continue
        res = con.execute(oracles[name])
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
        if sorted(o_cols) != cols:
            print(f"✗ {name:28s} SCHEMA mismatch: spark={cols} duckdb={sorted(o_cols)}")
            failures += 1
            continue
        du_rows = normalize([dict(zip(o_cols, r)) for r in o_rows], cols)
        if len(sp_rows) != len(du_rows):
            print(f"✗ {name:28s} ROWCOUNT {len(sp_rows)} vs {len(du_rows)}")
            failures += 1
            continue
        bad = [i for i, (a, b) in enumerate(zip(sp_rows, du_rows)) if a != b]
        if bad:
            i = bad[0]
            print(f"✗ {name:28s} {len(bad)}/{len(sp_rows)} rows differ; first: "
                  f"spark={sp_rows[i]} duckdb={du_rows[i]}")
            failures += 1
        else:
            print(f"✓ {name:28s} {len(sp_rows)} rows match")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
