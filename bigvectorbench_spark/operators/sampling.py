"""Deterministic distributed sampling primitives for training-data mixing.

Two shapes a 100 TB curation pipeline needs beyond Bernoulli keeps
(curation.domain_mix / temperature_sample draw per-row coin flips, so the
output SIZE is only expected, not exact):

- **Weighted sampling without replacement, exact n** — the
  Efraimidis-Spirakis exponential-key trick (A-ES): key_i = −ln(u_i)/w_i,
  keep the n smallest keys.  One pass, no global sort materialization:
  ``orderBy(key).limit(n)`` plans as TakeOrderedAndProject (per-partition
  top-n heaps + a driver merge of n·partitions rows — plan-asserted).
- **Stratified sampling, exact per-group quotas** — rank rows inside each
  group by a seeded hash and keep ``quota``; WindowGroupLimit applies the
  rank bound before the exchange, so each group ships at most ~quota rows
  per map partition.

Determinism contract (the repo-wide oracle convention): randomness is
``portable_hash60(id ‖ ':' ‖ seed)`` — md5-derived, bit-identical in any
engine — mapped to u ∈ (0, 1] over a 2⁴⁰ grid; keys round to 9 dp before
ranking so both engines order identically (ties break by id).  Same seed
⇒ same sample, on any cluster, any partitioning, any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigvectorbench_spark.functions.text import portable_hash60

# 2^40 — the token-hash modulus (curation.py) reused as the u grid.
U_GRID = 1_099_511_627_776


def _uniform(id_col: Column, seed: int) -> Column:
    """u ∈ (0, 1]: (portable_hash60(id:seed) mod 2⁴⁰ + 1) / 2⁴⁰.  The +1
    excludes 0 (ln(0)) and includes 1 (ln(1) = 0 is a valid key)."""
    h = portable_hash60(F.concat_ws(":", id_col.cast("string"),
                                    F.lit(str(seed))))
    return (F.pmod(h, F.lit(U_GRID)) + 1) / F.lit(float(U_GRID))


def weighted_sample(
    df: DataFrame, *, n: int, weight_col: str, id_col: str = "doc_id",
    seed: int = 1, key_col: str = "skey",
) -> DataFrame:
    """Exact-size weighted sample without replacement (Efraimidis-Spirakis
    2006): P(row in sample) follows its weight; rows with non-positive
    weight are excluded (their key would be infinite).  Appends the
    9-dp-rounded exponential key as ``key_col`` — deterministic, so reruns
    and engines agree row-for-row."""
    w = F.col(weight_col).cast("double")
    key = F.round(-F.log(_uniform(F.col(id_col), seed)) / w, 9)
    return (
        df.filter(w > 0)
        .withColumn(key_col, key)
        .orderBy(key_col, id_col)
        .limit(n)
    )


def stratified_sample(
    df: DataFrame, *, group_col: str, quota: int, id_col: str = "doc_id",
    seed: int = 1, rank_col: str = "srank",
) -> DataFrame:
    """Exactly min(quota, |group|) rows per group, chosen by seeded-hash
    rank (uniform within the group).  Appends the 1-based rank as
    ``rank_col``."""
    u = _uniform(F.col(id_col), seed)
    w = Window.partitionBy(group_col).orderBy(u, F.col(id_col))
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("bigint"))
        .filter(F.col(rank_col) <= quota)
    )
