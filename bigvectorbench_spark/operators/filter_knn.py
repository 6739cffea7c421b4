"""Filtered kNN — SURVEY.md §2.2 Q4/Q5 and §2.4 G5/G6.

Reference semantics: kNN restricted to train rows whose label columns satisfy
a per-query predicate.  The predicate comes from a string template
(``filter_expr(*labels)``, runner.py:62-64, 87-88) whose grammar is
``<name> <op> <int>`` with op ∈ {==, !=, >, >=, <, <=} joined by and/or
(CONTRIBUTING.md:45-50, weaviate/utils.py:105-179) — a strict subset of Spark
SQL, so Catalyst's parser *is* the DSL parser.  The reference builds the
string with runtime ``exec`` (an implementation hazard we deliberately don't
copy); here templates are parameterized with ``{placeholder}`` names that bind
to query-row columns.

Scale design: each of the (up to 10k) queries carries its own predicate
parameters.  Compiling 10k separate plans would be catastrophic; instead the
template is rewritten once into a single join condition referencing both
sides (`label_0 <= q.label_0 and …`), so the whole filtered workload is ONE
broadcast join job regardless of query count (SURVEY §7 hard part 3).

Two physical strategies, mirroring the reference's selectivity-adaptive
ground-truth builder (create_artificial_datasets.py:151-285):

- **pre-filter** (filter-first): apply the predicate before scoring.  For the
  exact engine this is always correct and lets Catalyst push static parts of
  the predicate into the Parquet scan.
- **post-filter** (ANN-first): over-fetch ``k·1.5/ratio`` nearest neighbors
  ignoring labels, then drop non-matching rows.  Only meaningful for the
  approximate path (IVF/LSH), where scoring fewer rows is the win; exposed
  here for plan parity and used by ``plans/selectivity.py``.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigvectorbench_spark.functions import distance as dist_fns
from bigvectorbench_spark.operators.knn import pair_dist_below_join, topk_window

_PLACEHOLDER = re.compile(r"\{(\w+)\}")
_EQ_REWRITE = re.compile(r"(?<![=!<>])==")

QUERY_PREFIX = "__q_"


def compile_filter_template(template: str) -> str:
    """Rewrite a reference-style filter template into a Spark SQL join
    condition.  ``{name}`` placeholders become references to the query-side
    column ``__q_name``; ``==`` becomes SQL ``=`` (the same rewrite pgvector
    does, pgvector/module.py:92)."""
    cond = _PLACEHOLDER.sub(lambda m: f"{QUERY_PREFIX}{m.group(1)}", template)
    return _EQ_REWRITE.sub("=", cond)


def filtered_knn(
    train: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "euclidean",
    *,
    filter_template: str,
    query_param_cols: Sequence[str],
    vec_col: str = "vec",
    query_vec_col: Optional[str] = None,
    id_col: str = "id",
    qid_col: str = "qid",
) -> DataFrame:
    """Exact filtered kNN: one broadcast-join job for the whole query set.

    ``filter_template`` references train columns by name and query-row
    parameters as ``{param}`` (params listed in ``query_param_cols``), e.g.
    ``"label_0 <= {label_0} and label_1 <= {label_1}"`` — the
    random-xs-32-euclidean-2filter form (datasets.py:385-394) — or the
    range form ``"label_0 >= {l0} and label_0 <= {r0}"``
    (create_artificial_datasets.py:483-502).
    """
    qvec = query_vec_col or vec_col
    cond = compile_filter_template(filter_template)

    q = queries.select(
        F.col(qid_col).cast("bigint").alias("qid"),
        F.col(qvec).alias("__qvec"),
        *[F.col(c).alias(f"{QUERY_PREFIX}{c}") for c in query_param_cols],
    )
    t, q, dist = pair_dist_below_join(metric, train, q, vec_col, "__qvec")
    scored = (
        t.join(F.broadcast(q), on=F.expr(cond), how="inner")
        .select(
            "qid",
            F.col(id_col).cast("bigint").alias("id"),
            dist.alias("dist"),
        )
        .filter(dist_fns.metric_valid(metric, F.col("dist")))
    )
    return topk_window(scored, k).select("qid", "id", "dist", "rank")


def postfilter_knn(
    train: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str,
    *,
    filter_template: str,
    query_param_cols: Sequence[str],
    selectivity: float,
    overfetch_factor: float = 1.5,
    vec_col: str = "vec",
    query_vec_col: Optional[str] = None,
    id_col: str = "id",
    qid_col: str = "qid",
) -> DataFrame:
    """ANN-first plan: fetch ``ceil(k·overfetch/selectivity)`` unfiltered
    neighbors, then apply the label predicate and re-rank
    (create_artificial_datasets.py:165-226).  With the exact scorer this is
    correct whenever enough matching rows survive the over-fetch; the
    reference accepts the same approximation."""
    if not (0.0 < selectivity <= 1.0):
        raise ValueError(f"selectivity must be in (0,1], got {selectivity}")
    fetch = max(k, int(k * overfetch_factor / selectivity))
    qvec = query_vec_col or vec_col
    cond = compile_filter_template(filter_template)

    q = queries.select(
        F.col(qid_col).cast("bigint").alias("qid"),
        F.col(qvec).alias("__qvec"),
        *[F.col(c).alias(f"{QUERY_PREFIX}{c}") for c in query_param_cols],
    )
    # over-fetched candidates, labels carried through for the post-check
    label_cols = [c for c in train.columns if c not in (vec_col,)]
    t, q, dist = pair_dist_below_join(metric, train, q, vec_col, "__qvec")
    scored = t.crossJoin(F.broadcast(q)).select(
        "qid",
        F.col(id_col).cast("bigint").alias("id"),
        dist.alias("dist"),
        *[c for c in label_cols if c != id_col],
        *[f"{QUERY_PREFIX}{c}" for c in query_param_cols],
    )
    fetched = topk_window(scored, fetch).drop("rank")
    return topk_window(fetched.filter(F.expr(cond)), k).select("qid", "id", "dist", "rank")
