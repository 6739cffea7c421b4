#!/usr/bin/env python
"""The three decontamination regimes under a LARGE eval inventory.

decontaminate_report has three method shapes: the broadcast LEFT SEMI
join (expr), the sorted-array searchsorted kernel (arrow), and the Bloom
bitmap (curation.bloom_decontaminate_report).  At the declared sf the
eval inventory is tiny and the join wins; this harness measures the
regime the Bloom filter exists for — a 10% eval slice of a 500k-doc Zipf
corpus (~millions of distinct window hashes), where broadcast size is
the axis that matters:

  - expr / arrow carry 8 bytes per distinct window hash (the join build
    side additionally pays the hashmap),
  - the Bloom bitmap carries m/8 bytes total (~3.6 bytes/hash at the
    fp=1e-6 design point), one-sided error (superset of exact, asserted
    here against the expr result).

Round 9 adds the WINNING-regime measurement (VERDICT r8 ask #5): a
cross-corpus decontamination shape (eval_mod=2 over a 1M-doc corpus →
~50M distinct window hashes, a ~0.4 GB exact inventory) and an honest
probe-only timing — bloom_decontaminate_report also runs the exact
semi-join pass for its gate booleans, so its wall time can never beat
expr; the serving path a user deploys is build-bitmap-once + map-only
probe (streaming/ingest.bloom_probe_batch), timed separately here.

Usage: python scripts/scale_bloom.py [N_DOCS] [EVAL_MOD] [OUT_JSON]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bigvectorbench_spark import get_spark
from bigvectorbench_spark.operators import bloom as bl
from bigvectorbench_spark.operators import curation as cur
from scale_retrieval import best_of, ensure_corpus


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    eval_mod = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out_json = sys.argv[3] if len(sys.argv) > 3 else "SCALE_BLOOM_r8.json"
    root = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/bvb_scale")

    spark = get_spark("scale-bloom")
    spark.sparkContext.setLogLevel("ERROR")
    path = ensure_corpus(n, root)
    docs = spark.read.parquet(os.path.join(path, "documents.parquet"))

    out = {"corpus_rows": n, "eval_mod": eval_mod}

    # inventory size → the broadcast-bytes axis
    from bigvectorbench_spark.functions import text as tx
    from bigvectorbench_spark.operators.curation import (
        rolling_window_hashes, token_hashes)
    inv = (docs.filter(F.col("doc_id") % eval_mod == 0)
           .select(tx.tokens(F.col("text")).alias("tk"))
           .select(token_hashes(F.col("tk")).alias("th"))
           .select(F.explode(F.array_distinct(
               rolling_window_hashes(F.col("th"), 8))).alias("wh"))
           .distinct())
    n_hashes = inv.count()
    m_bits, k = bl.bloom_params(n_hashes, 1e-6)
    out["eval_window_hashes"] = n_hashes
    out["bytes_exact_inventory"] = 8 * n_hashes
    out["bytes_bloom_bitmap"] = m_bits // 8
    out["bloom_k"] = k
    out["bytes_ratio"] = round(8 * n_hashes / (m_bits // 8), 2)

    def _time(label, fn):
        best, runs = best_of(fn)
        out[f"{label}_s"], out[f"{label}_runs"] = best, runs

    def _try(label, fn):
        # "degrades or refuses" is a RESULT here: a method that cannot
        # carry the inventory records its failure instead of killing the
        # harness (VERDICT r8 ask #5).
        try:
            _time(label, fn)
        except Exception as e:  # noqa: BLE001
            out[f"{label}_error"] = str(e).splitlines()[0][:300]

    _try("expr", lambda: cur.decontaminate_report(
        docs, eval_mod=eval_mod).write.format("noop").mode("overwrite").save())
    _try("arrow", lambda: cur.decontaminate_report(
        docs, eval_mod=eval_mod, method="arrow").write.format(
        "noop").mode("overwrite").save())
    _try("bloom", lambda: cur.bloom_decontaminate_report(
        docs, eval_mod=eval_mod).write.format("noop").mode("overwrite").save())

    # The SERVING split: bitmap built once (index-build cost), probes are
    # map-only passes over the train side — the deployable Bloom path
    # (streaming_bloom_decontaminate runs exactly this per micro-batch).
    from bigvectorbench_spark.streaming.ingest import bloom_probe_batch

    inv_c = inv.persist()
    inv_c.count()
    try:
        t0 = time.perf_counter()
        bm = bl.bloom_build(inv_c, "wh", m_bits=m_bits, k=k)
        out["bloom_build_s"] = round(time.perf_counter() - t0, 3)
        train = docs.filter(F.col("doc_id") % eval_mod != 0)
        _try("bloom_probe_only", lambda: (
            bloom_probe_batch(train, bm, m_bits=m_bits, k=k)
            .groupBy("source").agg(
                F.count("*").alias("n_train"),
                F.sum(F.col("bloom_hit").cast("int")).alias("n_bloom"))
            .write.format("noop").mode("overwrite").save()))
    except Exception as e:  # noqa: BLE001
        out["bloom_build_error"] = str(e).splitlines()[0][:300]
    inv_c.unpersist()

    # one-sided-error check at this scale (not just the oracle sf)
    rep = cur.bloom_decontaminate_report(docs, eval_mod=eval_mod)
    bad = rep.filter("NOT superset_ok OR NOT fp_extra_ok").count()
    exact = cur.decontaminate_report(docs, eval_mod=eval_mod)
    out["gate_violations"] = bad
    out["n_contaminated_exact"] = exact.agg(
        F.sum("n_contaminated")).collect()[0][0]

    print(json.dumps(out))
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
