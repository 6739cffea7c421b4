"""Distance / similarity kernels as Spark Column builders (SURVEY.md §2.3).

Reference semantics: /root/reference/bigvectorbench/distance.py
  - euclidean  sqrt(sum((a-b)^2))                      distance.py:19-24,40-42
  - angular    1 - a.b / (|a||b|)                      distance.py:43-46
  - hamming    mean(a XOR b)                           distance.py:33-36
  - jaccard    1 - |a∩b|/|a∪b|, empty sets -> sim 0;   distance.py:12-16,37-39
               results with d >= 1-1e-5 are invalid and dropped.

Everything here is a *pure Column expression* (zip_with / aggregate /
array_intersect), so it runs JVM-side inside whole-stage codegen — no Python
in the hot path.  All arithmetic is double-precision and folds left-to-right,
which makes results bit-reproducible (and comparable to a DuckDB oracle that
sums in the same order).

Scale note: for wide vectors the expression path is O(d) virtual-function
calls per row pair; the batched GEMM kernel in ``operators/knn.py`` computes
the same algebra with one numpy matmul per Arrow batch.  Both paths share the
formulas below, so correctness is tested once.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

JACCARD_VALID_EPS = 1e-5  # distance.py:38


def _d(col: Column) -> Column:
    """Cast a numeric array to ARRAY<DOUBLE> for stable arithmetic."""
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i, folded left-to-right in double precision."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_sq(a: Column) -> Column:
    """‖a‖² — materialize as a column at load time to enable the
    partial-distance trick (reference bruteforce/module.py:128-150)."""
    return dot(a, a)


def norm_l2(a: Column) -> Column:
    return F.sqrt(norm_sq(a))


def unit_vec(a: Column) -> Column:
    """a/‖a‖ — pre-normalized rows make angular distance a plain dot
    (reference bruteforce/module.py:139-150)."""
    n = norm_l2(a)
    return F.transform(_d(a), lambda x: x / n)


def l2_sq(a: Column, b: Column) -> Column:
    """Squared euclidean — the ranking key (monotone in l2, cheaper)."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_dist(a: Column, b: Column) -> Column:
    return F.sqrt(l2_sq(a, b))


def angular_dist(a: Column, b: Column) -> Column:
    """1 − a·b/(‖a‖‖b‖)  (distance.py:43-46)."""
    return F.lit(1.0) - dot(a, b) / (norm_l2(a) * norm_l2(b))


def hamming_dist(a: Column, b: Column) -> Column:
    """mean(a ≠ b) over boolean/int arrays (distance.py:33-36)."""
    diff = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.when(x.eqNullSafe(y), 0.0).otherwise(1.0)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return diff / F.size(a).cast("double")


def jaccard_sim(a: Column, b: Column) -> Column:
    """|a∩b|/|a∪b|; 0 when the union is empty (distance.py:12-16)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0.0, 0.0).otherwise(inter / union)


def jaccard_dist(a: Column, b: Column) -> Column:
    return F.lit(1.0) - jaccard_sim(a, b)


def jaccard_valid(dist: Column) -> Column:
    """Reference drops non-overlapping results: valid iff d < 1−1e-5
    (distance.py:38, applied at bruteforce/module.py:202-206)."""
    return dist < F.lit(1.0 - JACCARD_VALID_EPS)


def pack_bits(bits: Column) -> Column:
    """Pack ARRAY<BOOLEAN> into ARRAY<BIGINT> words of 64 bits (big-endian
    within each word; the tail word holds the remaining bits in its low
    positions).  SURVEY §7 hard part 2: Parquet boolean lists decode ~64×
    more values than packed words; materialize this at index-build time and
    binary workloads shrink accordingly.

    ``bits`` should be a materialized column (see shingles_from_tokens note
    on HOF re-evaluation)."""
    n_words = F.ceil(F.size(bits) / F.lit(64.0)).cast("int")
    idx = F.when(n_words > 0, F.sequence(F.lit(0), n_words - 1)).otherwise(
        F.lit([]).cast("array<int>")
    )
    return F.transform(
        idx,
        lambda w: F.aggregate(
            F.slice(bits, w * 64 + 1, 64),
            F.lit(0).cast("long"),
            # shift+OR, not acc*2+bit: multiplication overflows under ANSI
            # semantics once bit 63 is populated
            lambda acc, b: F.shiftleft(acc, 1).bitwiseOR(
                F.when(b, 1).otherwise(0).cast("long")
            ),
        ),
    )


def pack_signs(vec: Column, d: int) -> Column:
    """Sign-bit packing fused into one expression: thresholds (x > 0) and
    packs straight from the float column, so no intermediate ARRAY<BOOLEAN>
    HOF column exists to be re-evaluated per word (the hazard pack_bits'
    docstring warns about).  ``d`` is the static vector length, so the word
    loop unrolls at plan-build time — no sequence/transform nesting."""
    n_words = (d + 63) // 64
    return F.array(*[
        F.aggregate(
            F.slice(vec, w * 64 + 1, 64),
            F.lit(0).cast("long"),
            lambda acc, x: F.shiftleft(acc, 1).bitwiseOR(
                F.when(x > 0, 1).otherwise(0).cast("long")
            ),
        )
        for w in range(n_words)
    ])


def hamming_packed_dist(a: Column, b: Column, d: int) -> Column:
    """Hamming distance between packed bit arrays: Σ bit_count(a_w XOR b_w)
    over words, normalized by the true bit length ``d`` — same value as
    ``hamming_dist`` on the unpacked booleans, at one popcount per 64 bits."""
    pops = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return pops.cast("double") / F.lit(float(d))


_METRICS = {
    "euclidean": l2_dist,
    "angular": angular_dist,
    "hamming": hamming_dist,
    "jaccard": jaccard_dist,
}


def metric_dist(metric: str, a: Column, b: Column) -> Column:
    """Dispatch mirroring the reference's ``compute_distance``
    (distance.py:50-71); metric ∈ {euclidean, angular, hamming, jaccard}."""
    try:
        return _METRICS[metric](a, b)
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; expected one of {sorted(_METRICS)}") from None


def metric_valid(metric: str, dist: Column) -> Column:
    """``is_distance_valid`` dispatch (distance.py:74-92): jaccard drops
    non-overlapping results, every other metric accepts all."""
    if metric == "jaccard":
        return jaccard_valid(dist)
    return F.lit(True)
