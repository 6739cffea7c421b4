"""Skew and co-location utilities — the shuffle-discipline toolkit for the
100 TB design point (SURVEY §7 / task brief: "skewed keys hurt … salting for
skew, bucketing for co-located joins").

- ``salted_join``: equi-join where one side's key distribution is heavily
  skewed.  The skewed (large) side gets a random salt in [0, salts); the
  small side is exploded ×salts.  Each hot key's rows spread over ``salts``
  reducers instead of one.  AQE's skew-join handles *sort-merge* cases
  adaptively; explicit salting remains the tool when the build side must
  stay a shuffle join (e.g. large-large with one hot key).
- ``write_bucketed`` / co-located joins: persist both sides bucketed+sorted
  by the join key so later joins need NO exchange at all (the plan test
  asserts the absence of Exchange nodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join on column ``on`` (same name both sides).

    Correctness: every (key, salt) pair of the large side meets exactly one
    replicated small-side row with that (key, salt), so the result multiset
    equals the plain join's."""
    if salts < 1:
        raise ValueError("salts must be >= 1")
    l_salted = large.withColumn("__salt", (F.rand(seed=42) * salts).cast("int"))
    s_exploded = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    out = l_salted.join(s_exploded, [on, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    *,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (+sorted) table: two tables bucketed the same
    way join with zero exchanges — pre-paid shuffle, amortized over every
    subsequent join.  Uses the session catalog (saveAsTable is required for
    bucket metadata; plain parquet paths cannot record bucketing)."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table_name)
