#!/usr/bin/env python
"""Streaming Bloom decontamination SERVING measurement (VERDICT r9 ask
#5): SCALE_BLOOM_r9 proved the probe-only path wins batch-side at the
49.9M-hash inventory (13.9 s/pass vs expr's 59.7 s best); this harness
drives the STREAMING path (`streaming_bloom_decontaminate`) with that
same inventory and records what the amortized-build story buys at
serving time — per-micro-batch probe latency (p50/p99 over the batch
ladder) and final-state parity with the batch report.

Setup mirrors SCALE_BLOOM_r9: 1M-doc Zipf corpus, eval_mod=2 (the
cross-corpus shape → ~49.9M distinct 8-token window hashes, fp=1e-6 →
a 188 MB bitmap, k=14).  The bitmap is built ONCE (bloom.bloom_build,
the index-build cost the batch artifact already prices at ~163 s) and
cached on disk so re-runs measure serving, not construction.  The train
side (500k docs) streams as N parquet-file micro-batches
(maxFilesPerTrigger=1 — the file-source shape test_streaming_bloom
pins), through the exact probe ladder of the batch report.

Parity: per-source streamed flag counts must EQUAL the batch
bloom_decontaminate_report's n_bloom (same bitmap, same ladder — the
fixture-scale pin, re-asserted at the real inventory).

Usage: python scripts/scale_bloom_stream.py [N_DOCS] [EVAL_MOD]
       [N_MICROBATCHES] [OUT_JSON]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bigvectorbench_spark import get_spark
from bigvectorbench_spark.operators import bloom as bl
from bigvectorbench_spark.operators import curation as cur
from bigvectorbench_spark.streaming.ingest import streaming_bloom_decontaminate
from scale_retrieval import ensure_corpus


def pctl(xs: list[float], p: float) -> float:
    xs = sorted(xs)
    i = min(len(xs) - 1, max(0, int(round(p * (len(xs) - 1)))))
    return xs[i]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    eval_mod = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    out_json = sys.argv[4] if len(sys.argv) > 4 else "SCALE_BLOOM_STREAM_r10.json"
    root = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/bvb_scale")

    spark = get_spark("scale-bloom-stream")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(
        os.path.join(ensure_corpus(n, root), "documents.parquet"))
    out = {"corpus_rows": n, "eval_mod": eval_mod, "n_microbatches": n_batches}

    # ---- bitmap: build once, cache on disk (the amortized index build) ----
    from bigvectorbench_spark.functions import text as tx
    from bigvectorbench_spark.operators.curation import (
        rolling_window_hashes, token_hashes)

    cache = os.path.join(root, f"bloom_zipf{n}_mod{eval_mod}")
    meta_p, bin_p = cache + ".json", cache + ".bin"
    if os.path.exists(meta_p) and os.path.exists(bin_p):
        meta = json.load(open(meta_p))
        bm = open(bin_p, "rb").read()
        m_bits, k, n_hashes = meta["m_bits"], meta["k"], meta["n_hashes"]
        out["bitmap_source"] = "disk cache"
    else:
        inv = (docs.filter(F.col("doc_id") % eval_mod == 0)
               .select(tx.tokens(F.col("text")).alias("tk"))
               .select(token_hashes(F.col("tk")).alias("th"))
               .select(F.explode(F.array_distinct(
                   rolling_window_hashes(F.col("th"), 8))).alias("wh"))
               .distinct().persist())
        n_hashes = inv.count()
        m_bits, k = bl.bloom_params(n_hashes, 1e-6)
        t0 = time.perf_counter()
        bm = bl.bloom_build(inv, "wh", m_bits=m_bits, k=k)
        out["bloom_build_s"] = round(time.perf_counter() - t0, 3)
        inv.unpersist()
        with open(bin_p, "wb") as f:
            f.write(bm)
        json.dump({"m_bits": m_bits, "k": k, "n_hashes": n_hashes},
                  open(meta_p, "w"))
        out["bitmap_source"] = "built this run"
    out.update(eval_window_hashes=n_hashes, m_bits=m_bits, bloom_k=k,
               bytes_bloom_bitmap=m_bits // 8)

    # ---- train side as a file-source micro-batch ladder ----
    src = os.path.join(root, f"stream_src_zipf{n}_mod{eval_mod}_{n_batches}")
    train = docs.filter(F.col("doc_id") % eval_mod != 0)
    if not os.path.exists(src):
        train.repartition(n_batches).write.parquet(src)
    n_train = train.count()
    out["train_rows"] = n_train

    stream = (spark.readStream.schema(train.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    sink = os.path.join(root, "stream_bloom_flags")
    ckpt = os.path.join(root, "stream_bloom_ckpt")
    shutil.rmtree(sink, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    t0 = time.perf_counter()
    q = streaming_bloom_decontaminate(
        stream, bm, sink, ckpt, m_bits=m_bits, k=k)
    out["stream_total_s"] = round(time.perf_counter() - t0, 3)

    def _as_dict(p):
        if isinstance(p, dict):
            return p
        if isinstance(p, str):
            return json.loads(p)
        return json.loads(p.json if isinstance(p.json, str) else p.json())

    prog = [_as_dict(p) for p in q.recentProgress]
    batch_ms = [p["durationMs"]["triggerExecution"] for p in prog
                if p.get("numInputRows", 0) > 0]
    rows_per = [p["numInputRows"] for p in prog
                if p.get("numInputRows", 0) > 0]
    out["batches_observed"] = len(batch_ms)
    out["rows_per_batch_mean"] = int(sum(rows_per) / max(len(rows_per), 1))
    out["batch_ms_p50"] = pctl(batch_ms, 0.50)
    out["batch_ms_p99"] = pctl(batch_ms, 0.99)
    out["batch_ms_max"] = max(batch_ms)
    out["batch_ms_all"] = batch_ms
    # Per-batch phase breakdown (VERDICT r10 ask #4 — the r10 artifact's
    # batch-18 34.4 s spike carried no attribution): durationMs splits
    # triggerExecution into addBatch (the probe compute), getBatch /
    # latestOffset (source planning), queryPlanning, walCommit +
    # commitOffsets (checkpoint I/O).  A spike whose excess sits in
    # addBatch is compute/scheduling; in walCommit/commitOffsets it is
    # checkpoint I/O; spread evenly it is machine-level contention.
    out["batch_duration_breakdown"] = [
        {"batchId": p.get("batchId"), "rows": p.get("numInputRows"),
         **p.get("durationMs", {})}
        for p in prog if p.get("numInputRows", 0) > 0]

    # ---- final-state parity ----
    # (a) flag parity: streamed per-source bloom_hit counts equal ONE
    # batch probe pass with the same bitmap (the exact ladder — the
    # test_streaming_bloom pin, re-asserted at the real inventory).
    from bigvectorbench_spark.streaming.ingest import bloom_probe_batch

    got = (spark.read.parquet(sink).groupBy("source")
           .agg(F.count("*").alias("n_train"),
                F.sum(F.col("bloom_hit").cast("int")).alias("n_bloom")))
    bat = (bloom_probe_batch(train, bm, m_bits=m_bits, k=k)
           .groupBy("source")
           .agg(F.count("*").alias("n_train"),
                F.sum(F.col("bloom_hit").cast("int")).alias("n_bloom")))
    diff = (got.alias("g").join(bat.alias("r"), "source", "full")
            .filter("g.n_train IS DISTINCT FROM r.n_train OR "
                    "g.n_bloom IS DISTINCT FROM r.n_bloom").count())
    out["parity_mismatched_sources"] = diff
    out["streamed_rows"] = spark.read.parquet(sink).count()
    out["streamed_flagged"] = int(
        got.agg(F.sum("n_bloom")).collect()[0][0] or 0)
    # (b) the batch report's one-sided-error gates hold on the SAME
    # corpus/inventory (its internally-built bitmap has identical params —
    # same n_hashes → same m_bits/k → same bits).
    rep = cur.bloom_decontaminate_report(docs, eval_mod=eval_mod)
    out["report_gate_violations"] = rep.filter(
        "NOT superset_ok OR NOT fp_extra_ok").count()
    out["report_n_train"] = int(rep.agg(F.sum("n_train")).collect()[0][0])
    assert diff == 0, "streamed flags diverged from the batch probe"
    assert out["streamed_rows"] == n_train == out["report_n_train"]
    assert out["report_gate_violations"] == 0

    print(json.dumps(out))
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
