#!/usr/bin/env python
"""Stage-level wall-time breakdown of ``ngram_jaccard_pairs`` (VERDICT r5
ask #4): attribute the per-decade residual to individual pipeline stages
instead of arguing from the candidate-count table alone.

Replicates the exact PPJoin pipeline from operators/dedup.py with explicit
stage boundaries; each stage's input is CACHED AND MATERIALIZED before the
stage is timed, so a stage's number is its own cost, not its lineage's.
The one-shot (production-plan) wall is also measured for comparison — the
sum of stages exceeds it slightly because caching pays serialization the
fused plan avoids.

Usage: python scripts/stage_ngram.py SF_DIR [SF_DIR ...]
  e.g. python scripts/stage_ngram.py testdata_gen/sf0.1_zipf testdata_gen/sf1_zipf
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
from bigvectorbench_spark.operators.dedup import _shingle_sets, _widen, _verify_jaccard
from bigvectorbench_spark.sources.tables import load_table

THRESHOLD = 0.5


def timed(df, action="noop"):
    t0 = time.perf_counter()
    if action == "cache":
        df = df.cache()
        n = df.count()
    else:
        n = df.count()
    return df, n, round(time.perf_counter() - t0, 3)


def breakdown(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = {}

    # one-shot production plan (cold includes JVM/python-worker warmup;
    # warm is the best-of-2 number comparable to the BENCH protocol)
    for label in ("oneshot_cold", "oneshot_warm"):
        t0 = time.perf_counter()
        dd.ngram_jaccard_pairs(docs, threshold=THRESHOLD).write.format(
            "noop").mode("overwrite").save()
        out[label] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()

    # -- stage 1: tokenize + shingle + hash (per-doc, narrow)
    sets_df, n_docs, t = timed(_shingle_sets(_widen(docs), "doc_id", "text", 3),
                               "cache")
    out["s1_shingle_sets"] = t

    # -- stage 2: inverted index explode + global shingle frequency
    inv = sets_df.select("id", F.explode("sh").alias("shingle"))
    freq, n_shingles, t = timed(
        inv.groupBy("shingle").agg(F.count("*").alias("freq")), "cache")
    out["s2_shingle_freq"] = t

    # -- stage 3: rarest-first ordering (join freq back + per-doc sort)
    ordered, _, t = timed(
        inv.join(freq, "shingle")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("freq", "shingle"))).alias("os"))
        .select("id", F.transform("os", lambda s: s["shingle"]).alias("ordered_sh")),
        "cache")
    out["s3_rarest_first_order"] = t

    # -- stage 4: prefix extraction (slice + explode)
    sz = F.size("ordered_sh")
    plen = sz - F.ceil(sz * F.lit(float(THRESHOLD))).cast("int") + 1
    prefix, n_prefix, t = timed(
        ordered.select("id", F.explode(F.slice("ordered_sh", 1, plen))
                       .alias("shingle")), "cache")
    out["s4_prefix_extract"] = t

    # -- stage 5: candidate generation (prefix self-join + distinct)
    a, b = prefix.alias("a"), prefix.alias("b")
    cand, n_cand, t = timed(
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct(), "cache")
    out["s5_candidate_join"] = t

    # -- stage 6: exact-Jaccard verification of candidates
    verified, n_pairs, t = timed(
        _verify_jaccard(cand, sets_df).filter(F.col("jaccard") >= THRESHOLD))
    out["s6_verify"] = t

    out["stage_sum"] = round(sum(v for k, v in out.items()
                                 if k.startswith("s")), 3)
    out["n_docs"] = n_docs
    out["n_distinct_shingles"] = n_shingles
    out["n_prefix_entries"] = n_prefix
    out["n_candidates"] = n_cand
    out["n_true_pairs"] = n_pairs
    spark.catalog.clearCache()
    return out


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark("stage-ngram")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for d in dirs:
        results[d] = breakdown(spark, d)
        print(json.dumps({d: results[d]}), flush=True)
    if len(dirs) == 2:  # per-decade stage ratios, the artifact SCALING.md cites
        lo, hi = results[dirs[0]], results[dirs[1]]
        ratios = {k: round(hi[k] / lo[k], 2) for k in lo
                  if isinstance(lo[k], float) and lo[k] > 0}
        print(json.dumps({"stage_ratios": ratios}), flush=True)


if __name__ == "__main__":
    main()
