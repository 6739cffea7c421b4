"""Selectivity-aware filtered-kNN planning — SURVEY.md §2.4 G5 / §4.

Reference policy (create_artificial_datasets.py:151-285, branches at 165/228):
if the filter keeps ≥ 20% of rows, run ANN first with an over-fetch of
``k·1.5/ratio`` and post-check labels; otherwise filter first and run kNN on
the survivors.  That is exactly a cost-based pre- vs post-filter choice, so
we expose it as a tiny planner.

For the *exact* engine pre-filter is always correct and Catalyst pushes the
predicate into the scan, so the adaptive choice only changes performance; it
becomes a correctness/recall trade only on the approximate (IVF/LSH) path.

Selectivity estimation is a sampled count — at 100 TB a full count per query
template would itself be a scan, so we sample a fraction and extrapolate
(same contract as Spark's own CBO statistics).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigvectorbench_spark.operators import filter_knn as fknn

POST_FILTER_THRESHOLD = 0.2  # create_artificial_datasets.py:165
OVERFETCH = 1.5              # create_artificial_datasets.py:167

# The SPARSE family's pre/post flip lives next to its operator
# (operators/sparse.py: FILTER_SPARSE_PRE_MAX_SEL, measured at the
# 500k-doc regime in SCALE_FILTER_SPARSE_r10.json) — same G5 policy
# shape, different cost model: sparse postfilter is exact (the semi-join
# moves to the aggregated score frame), so its threshold is pure cost
# where this module's dense-ANN threshold also trades recall.


@dataclass(frozen=True)
class FilterPlan:
    strategy: str          # "pre" | "post"
    selectivity: float
    fetch_k: int


def estimate_selectivity(
    train: DataFrame, predicate: str, *, sample_fraction: float = 1.0, seed: int = 42
) -> float:
    """Fraction of train rows matching a (static) predicate."""
    df = train if sample_fraction >= 1.0 else train.sample(sample_fraction, seed=seed)
    agg = df.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.expr(predicate), 1)).alias("m"),
    ).first()
    if agg is None or agg["n"] == 0:
        return 1.0
    return agg["m"] / agg["n"]


def choose_plan(selectivity: float, k: int) -> FilterPlan:
    """The reference's branch: ratio ≥ 0.2 → post-filter with over-fetch,
    else pre-filter (create_artificial_datasets.py:165-283)."""
    if selectivity >= POST_FILTER_THRESHOLD:
        return FilterPlan("post", selectivity, max(k, int(k * OVERFETCH / selectivity)))
    return FilterPlan("pre", selectivity, k)


def adaptive_filtered_knn(
    train: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str,
    *,
    filter_template: str,
    query_param_cols: Sequence[str],
    representative_predicate: str,
    sample_fraction: float = 1.0,
    **kw,
) -> tuple[DataFrame, FilterPlan]:
    """Pick pre/post by estimated selectivity of a representative predicate
    instance, then execute.  Returns (result, chosen plan)."""
    sel = estimate_selectivity(train, representative_predicate, sample_fraction=sample_fraction)
    plan = choose_plan(sel, k)
    if plan.strategy == "post":
        df = fknn.postfilter_knn(
            train, queries, k, metric,
            filter_template=filter_template, query_param_cols=query_param_cols,
            selectivity=max(sel, 1e-6), overfetch_factor=OVERFETCH, **kw,
        )
    else:
        df = fknn.filtered_knn(
            train, queries, k, metric,
            filter_template=filter_template, query_param_cols=query_param_cols, **kw,
        )
    return df, plan
