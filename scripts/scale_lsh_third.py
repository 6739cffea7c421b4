#!/usr/bin/env python
"""Third decade for the curation scale family (VERDICT r7 ask #8): time
the DECLARED pairless-LSH dedup and the composed curation pipeline
(q_lsh_dedup / q_corpus_curation_scale, exactly the driver's plans) on
documents-only corpora one decade past the 5M boundary runs — certifying
the claimed linearity (per-stage growth <= ~3x/decade warm) one decade
further.

Usage: python scripts/scale_lsh_third.py DOCS_DIR [DOCS_DIR ...] [--out J]
Large corpora default to a single timed run (RUNS=1 via env) — a 15M-doc
cold+warm pair would double the wall for no extra information; set
SPARK_GRAFT_BENCH_RUNS=2 for the warm best-of protocol on smaller dirs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigvectorbench_spark import get_spark

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "1"))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = "SCALE_LSH_r8.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
        args = [a for a in args if a != out_path]

    import __spark_entry__ as e

    spark = get_spark("scale-lsh-third")
    spark.sparkContext.setLogLevel("ERROR")
    with open(out_path, "w") as f:
        for d in args:
            n = spark.read.parquet(f"{d}/documents.parquet").count()
            row = {"docs_dir": d, "corpus_rows": n, "runs": RUNS}
            for name, fn in (("lsh_dedup", e.q_lsh_dedup),
                             ("corpus_curation_scale",
                              e.q_corpus_curation_scale)):
                times = []
                for _ in range(RUNS):
                    t0 = time.perf_counter()
                    fn(spark, d).write.format("noop").mode(
                        "overwrite").save()
                    times.append(round(time.perf_counter() - t0, 3))
                    spark.catalog.clearCache()
                row[f"{name}_s"] = min(times)
                row[f"{name}_runs"] = times
            print(json.dumps(row), flush=True)
            f.write(json.dumps(row) + "\n")
            f.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
