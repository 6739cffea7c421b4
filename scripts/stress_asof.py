#!/usr/bin/env python
"""As-of-join-at-scale stress: synthesize two event streams (left =
purchases, right = clicks) over many users and time the union+window-sweep
asof_join against the naive range-join plan (key equi-join with
``r.ts <= l.ts`` + max-per-left-row).

The point being demonstrated: the sweep touches O(|L| + |R|) rows after a
single shuffle on the key, while the range join materializes every
(left, qualifying-right) combination — O(|L| · avg matches) rows — before
aggregating them away, so its cost grows with event density per key, not
stream size. Measured on local[32] (noop-sink materialization, 1.5M rows):
~30 events/user the naive join is still competitive (0.6x), ~300/user the
sweep wins 5x, ~3000/user 29x. At 100 TB densities the range join is not
a plan.

Also runs the hot-key skew stress (one user with 10^6+ events): the plain
sweep serializes that key into one window partition; the time-bucket salt
(salt_interval/salt_threshold) splits it. Measured at 4M hot rows: plain
22.5s vs salted 5.5s (1-day buckets) — 4.1x, growing with hot-key size
since the serial sort is O(n log n) on one core.

Usage: python scripts/stress_asof.py [n_left] [n_right] [n_users]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigvectorbench_spark import get_spark
from bigvectorbench_spark.operators.temporal import asof_join


def synth(spark, n: int, n_users: int, tag: str):
    """Deterministic event stream: user = id mod users, ts spread by a
    multiplicative hash so per-user streams interleave arbitrarily."""
    return spark.range(n).select(
        F.col("id").alias(f"{tag}_id"),
        F.pmod(F.col("id"), F.lit(n_users)).alias("user_id"),
        F.timestamp_micros(
            F.pmod(F.col("id") * F.lit(2654435761), F.lit(30 * 86400)) * F.lit(1_000_000)
        ).alias("ts"),
    )


def naive_asof(left, right):
    """Range join + argmax: the plan asof_join exists to avoid."""
    r = right.select("user_id", F.col("ts").alias("r_ts"), "click_id")
    j = left.join(r, ["user_id"], "left").filter(
        F.col("r_ts").isNull() | (F.col("r_ts") <= F.col("ts"))
    )
    best = (
        j.groupBy("purchase_id", "user_id", "ts")
        .agg(F.max(F.struct("r_ts", "click_id")).alias("m"))
        .select("purchase_id", "user_id", "ts",
                F.col("m.r_ts").alias("asof_ts"), F.col("m.click_id").alias("asof_click_id"))
    )
    return best


def run(df, label):
    # noop sink, not count(): count() lets Catalyst prune the match column
    # and with it the whole window/join being measured.
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    n = df.count()
    print(f"  {label:<28} {dt:8.2f}s   ({n:,} rows)")
    return dt


def main() -> None:
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_right = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    n_users = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000

    spark = get_spark("stress-asof")
    spark.sparkContext.setLogLevel("ERROR")

    left = synth(spark, n_left, n_users, "purchase").localCheckpoint()
    right = synth(spark, n_right, n_users, "click").localCheckpoint()
    print(f"asof stress: |L|={n_left:,} |R|={n_right:,} users={n_users:,} "
          f"(~{(n_left + n_right) // n_users} events/user)")

    swept = asof_join(left, right, on="user_id", left_ts="ts",
                      right_cols=["click_id"], prefix="asof_")
    t_sweep = run(swept, "union+window sweep")

    # Naive range join at the same size — density is what kills it; cap
    # wall-clock damage by running it only when the expected intermediate
    # is sane, else subsample and extrapolate.
    avg_matches = n_right / n_users / 2  # expected right rows ≤ a left ts
    interm = int(n_left * avg_matches)
    if interm <= 200_000_000:
        t_naive = run(naive_asof(left, right), "naive range join + argmax")
        print(f"  intermediate rows ~{interm:,}; speedup {t_naive / t_sweep:.1f}x")
    else:
        frac = 200_000_000 / interm
        small_left = left.sample(frac, seed=1).localCheckpoint()
        t_naive = run(naive_asof(small_left, right),
                      f"naive range join ({frac:.1%} of L)")
        print(f"  full naive intermediate would be ~{interm:,} rows "
              f"(~{t_naive / frac / t_sweep:.0f}x the sweep, extrapolated)")

    # Correctness cross-check on a sample: sweep == naive
    sl = left.sample(0.001, seed=2).localCheckpoint()
    a = asof_join(sl, right, on="user_id", left_ts="ts",
                  right_cols=["click_id"], prefix="asof_")
    b = naive_asof(sl, right)
    mism = (
        a.select("purchase_id", F.col("asof_click_id").alias("x"))
        .join(b.select("purchase_id", F.col("asof_click_id").alias("y")), "purchase_id")
        .filter((F.col("x") != F.col("y")) |
                (F.col("x").isNull() != F.col("y").isNull()))
        .count()
    )
    print(f"  sample cross-check mismatches: {mism}")
    assert mism == 0

    # ---- hot-key skew: ONE user holds 10^6 events (VERDICT r3 ask #4).
    # The plain sweep serializes that user's rows into one window partition
    # on one core; the time-bucket salt splits it into parallel per-bucket
    # windows plus an O(#buckets) carry.  Same results (asserted), bounded
    # task time.
    n_hot = int(os.environ.get("SPARK_GRAFT_SKEW_ROWS", "4000000"))
    print(f"skew stress: 1 hot user with {n_hot:,} left + {n_hot:,} right rows, "
          f"{n_users:,} cold users with ~{n_hot // n_users} rows each")
    # hot ids offset so the parity join below never pairs a hot row with
    # the cold row that happens to share its id
    hot_left = synth(spark, n_hot, 1, "purchase").select(
        (F.col("purchase_id") + 10 * n_hot).alias("purchase_id"),
        F.lit(-1).cast("bigint").alias("user_id"), "ts")
    hot_right = synth(spark, n_hot, 1, "click").select(
        (F.col("click_id") + 10 * n_hot).alias("click_id"),
        F.lit(-1).cast("bigint").alias("user_id"), "ts")
    skew_left = synth(spark, n_hot, n_users, "purchase").unionByName(
        hot_left).localCheckpoint()
    skew_right = synth(spark, n_hot, n_users, "click").unionByName(
        hot_right).localCheckpoint()

    plain = asof_join(skew_left, skew_right, on="user_id", left_ts="ts",
                      right_cols=["click_id"], prefix="asof_")
    t_plain = run(plain, "plain sweep (hot key serial)")
    salted = asof_join(skew_left, skew_right, on="user_id", left_ts="ts",
                       right_cols=["click_id"], prefix="asof_",
                       salt_interval="1 day", salt_threshold=100_000)
    t_salted = run(salted, "salted sweep (hot key split)")
    print(f"  salted/plain: {t_plain / t_salted:.2f}x")

    d = (
        plain.select("purchase_id", F.col("asof_click_id").alias("x"))
        .join(salted.select("purchase_id", F.col("asof_click_id").alias("y")),
              "purchase_id")
        .filter((F.col("x") != F.col("y")) |
                (F.col("x").isNull() != F.col("y").isNull()))
        .count()
    )
    print(f"  salted-vs-plain mismatches: {d}")
    assert d == 0


if __name__ == "__main__":
    main()
