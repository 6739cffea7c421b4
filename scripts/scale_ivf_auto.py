#!/usr/bin/env python
"""Calibrate auto_nprobe(nlist) on a decade ladder — the IVF member of
the auto-knob trilogy (VERDICT r10 ask #5; HNSW has auto_ef, sparse has
auto_m/auto_m_spectrum).

The defect class: a 10x corpus growth under the classic nlist ≈ sqrt(n)
build rule shrinks cells, and a FIXED nprobe probes a smaller fraction
of the corpus — recall silently decays with scale (the same defect
auto_ef retired for HNSW in r6).  This script MEASURES, per decade-ish
corpus size n with nlist = round(sqrt(n)):

  - recall at the FIXED declared nprobe=4 (the decay row)
  - the minimal swept nprobe* reaching mean recall >= 0.9 vs exact kNN
  - a least-squares power-law fit nprobe* = coef * nlist^exp over the
    ladder (the auto_nprobe calibration), then a VERIFY pass running
    the fitted formula at every rung (the "recall held" row)

Corpus: fixtures.random_float blobs (32-d, 100 centers, seed 7 — the
scale-script convention), 100 held-out queries, k=10.

Usage: python scripts/scale_ivf_auto.py [OUT_JSON]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigvectorbench_spark import get_spark
from bigvectorbench_spark.operators import metrics as mx
from bigvectorbench_spark.operators.knn import knn
from bigvectorbench_spark.operators.similarity import IVFIndex

LADDER = (20_000, 63_000, 200_000, 632_000)
SWEEP = (1, 2, 4, 8, 16, 32, 64, 128)
TARGET = 0.9
K = 10


def mean_recall(idx, indexed, queries, exact, nprobe):
    got = idx.search(indexed, queries, k=K, nprobe=nprobe).groupBy(
        "qid").agg(F.collect_list("id").alias("neighbors"))
    r = mx.recall_per_query(got, exact).agg(
        F.avg("recall").alias("mean"), F.min("recall").alias("min")
    ).collect()[0]
    return round(r["mean"], 4), round(r["min"], 4)


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SCALE_IVF_AUTO_r11.json"
    spark = get_spark("scale-ivf-auto")
    spark.sparkContext.setLogLevel("ERROR")
    from bigvectorbench_spark import fixtures as fx

    rungs = []
    for n in LADDER:
        train, test = fx.random_float(spark, n, 32, centers=100, seed=7)
        t = train.cache()
        t.count()
        queries = test.limit(100).cache()
        nlist = round(math.sqrt(n))
        t0 = time.perf_counter()
        idx = IVFIndex.fit(t, nlist=nlist, seed=1, max_iter=8,
                           sample_fraction=min(1.0, 50_000 / n))
        fit_s = round(time.perf_counter() - t0, 3)
        indexed = idx.assign(t).cache()
        indexed.count()
        exact = knn(t, queries, k=K, method="gemm").groupBy("qid").agg(
            F.collect_list("id").alias("neighbors")).cache()
        exact.count()

        rung = {"n": n, "nlist": nlist, "fit_s": fit_s, "sweep": []}
        star = None
        for nprobe in SWEEP:
            if nprobe > nlist:
                break
            t0 = time.perf_counter()
            mean, mn = mean_recall(idx, indexed, queries, exact, nprobe)
            wall = round(time.perf_counter() - t0, 3)
            rung["sweep"].append({"nprobe": nprobe, "recall_mean": mean,
                                  "recall_min": mn, "wall_s": wall})
            print(f"n={n} nlist={nlist} nprobe={nprobe}: {mean}",
                  file=sys.stderr)
            if star is None and mean >= TARGET:
                star = nprobe
                # refine: binary-search the bracket for the minimal point
                lo = rung["sweep"][-2]["nprobe"] if len(rung["sweep"]) > 1 \
                    else 1
                hi = nprobe
                while hi - lo > 1:
                    mid = (lo + hi) // 2
                    m_mid, mn_mid = mean_recall(
                        idx, indexed, queries, exact, mid)
                    rung["sweep"].append(
                        {"nprobe": mid, "recall_mean": m_mid,
                         "recall_min": mn_mid})
                    print(f"  refine nprobe={mid}: {m_mid}", file=sys.stderr)
                    if m_mid >= TARGET:
                        hi, star = mid, mid
                    else:
                        lo = mid
                break
        rung["nprobe_star"] = star
        rung["fixed4_recall"] = next(
            (p["recall_mean"] for p in rung["sweep"] if p["nprobe"] == 4),
            None)
        rungs.append(rung)
        indexed.unpersist(); exact.unpersist(); t.unpersist()

    # least-squares power-law fit on (nlist, nprobe*)
    pts = [(r["nlist"], r["nprobe_star"]) for r in rungs
           if r["nprobe_star"] is not None]
    xs = [math.log(p[0]) for p in pts]
    ys = [math.log(p[1]) for p in pts]
    mx_, my = sum(xs) / len(xs), sum(ys) / len(ys)
    exp = (sum((x - mx_) * (y - my) for x, y in zip(xs, ys))
           / sum((x - mx_) ** 2 for x in xs))
    coef = math.exp(my - exp * mx_)
    out = {"target_recall": TARGET, "k": K,
           "build_rule": "nlist = round(sqrt(n))",
           "ladder": rungs,
           "fit": {"coef": round(coef, 4), "exp": round(exp, 4),
                   "formula": "nprobe = ceil(coef * nlist^exp)"}}

    # VERIFY pass: the fitted formula at every rung ("recall held" row)
    verify = []
    for r in rungs:
        n, nlist = r["n"], r["nlist"]
        npb = max(1, min(nlist, math.ceil(coef * nlist ** exp)))
        train, test = fx.random_float(spark, n, 32, centers=100, seed=7)
        t = train.cache(); t.count()
        queries = test.limit(100).cache()
        idx = IVFIndex.fit(t, nlist=nlist, seed=1, max_iter=8,
                           sample_fraction=min(1.0, 50_000 / n))
        indexed = idx.assign(t).cache(); indexed.count()
        exact = knn(t, queries, k=K, method="gemm").groupBy("qid").agg(
            F.collect_list("id").alias("neighbors")).cache()
        exact.count()
        mean, mn = mean_recall(idx, indexed, queries, exact, npb)
        verify.append({"n": n, "nlist": nlist, "auto_nprobe": npb,
                       "recall_mean": mean, "recall_min": mn,
                       "fixed4_recall": r["fixed4_recall"]})
        print(f"verify n={n} auto_nprobe={npb}: {mean}", file=sys.stderr)
        indexed.unpersist(); exact.unpersist(); t.unpersist()
    out["verify"] = verify

    print(json.dumps(out))
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
