"""Ground-truth computation — SURVEY.md §2.4 G1-G4.

Reference semantics (datasets.py:118-168): brute-force k=100 nearest
neighbors per test row with the exact metric, sorted ascending by distance,
written as parallel ``neighbors``/``distances`` arrays.  When fewer than k
rows qualify (filtered workloads / jaccard validity), pad neighbors with −1
and distances with +inf (results.py:85-86 convention) — bit-for-bit parity
matters because recall strips the −1 sentinel (plotting/metrics.py:11-16).

Scale: the heavy part is the kNN itself (delegated to operators/knn.py, which
keeps shuffle at O(q·k·batches)); the array assembly here touches only q·k
rows.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigvectorbench_spark.operators import filter_knn as fknn
from bigvectorbench_spark.operators.knn import knn

GT_DEPTH = 100  # datasets.py:151-152

PAD_ID = -1
PAD_DIST = float("inf")


def pack_results(
    topk: DataFrame,
    queries: DataFrame,
    k: int,
    qid_col: str = "qid",
) -> DataFrame:
    """(qid,id,dist,rank) rows → (qid, neighbors, distances) padded arrays.

    Left-joins against the full query set so queries with zero qualifying
    rows still emit a fully-padded row (runner.py:92-98 returns [] and
    store_results pads, results.py:76-86).
    """
    packed = (
        topk.groupBy("qid")
        .agg(F.sort_array(F.collect_list(F.struct("rank", "id", "dist"))).alias("_s"))
        .select(
            "qid",
            F.transform("_s", lambda s: s["id"]).alias("_n"),
            F.transform("_s", lambda s: s["dist"].cast("float")).alias("_d"),
        )
    )
    q = queries.select(F.col(qid_col).cast("bigint").alias("qid")).distinct()
    out = q.join(packed, "qid", "left").select(
        "qid",
        F.coalesce("_n", F.lit([]).cast("array<bigint>")).alias("_n"),
        F.coalesce("_d", F.lit([]).cast("array<float>")).alias("_d"),
    )
    pad_n = F.concat(
        F.col("_n"), F.array_repeat(F.lit(PAD_ID).cast("bigint"), k - F.size("_n"))
    )
    pad_d = F.concat(
        F.col("_d"), F.array_repeat(F.lit(PAD_DIST).cast("float"), k - F.size("_d"))
    )
    return out.select(
        "qid",
        F.slice(pad_n, 1, k).alias("neighbors"),
        F.slice(pad_d, 1, k).alias("distances"),
    )


def build_groundtruth(
    train: DataFrame,
    queries: DataFrame,
    k: int = GT_DEPTH,
    metric: str = "euclidean",
    *,
    vec_col: str = "vec",
    query_vec_col: Optional[str] = None,
    id_col: str = "id",
    qid_col: str = "qid",
    filter_template: Optional[str] = None,
    query_param_cols: Sequence[str] = (),
    method: str = "auto",
) -> DataFrame:
    """G1 (dense), G2 (filtered), G3 (sparse/jaccard) ground truth."""
    if filter_template is not None:
        topk = fknn.filtered_knn(
            train,
            queries,
            k,
            metric,
            filter_template=filter_template,
            query_param_cols=query_param_cols,
            vec_col=vec_col,
            query_vec_col=query_vec_col,
            id_col=id_col,
            qid_col=qid_col,
        )
    else:
        topk = knn(
            train,
            queries,
            k,
            metric,
            vec_col=vec_col,
            query_vec_col=query_vec_col,
            id_col=id_col,
            qid_col=qid_col,
            method=method,
        )
    return pack_results(topk, queries, k, qid_col=qid_col)


def verify_distances(
    result: DataFrame,
    train: DataFrame,
    queries: DataFrame,
    metric: str = "euclidean",
    *,
    tol: float = 1e-4,
    vec_col: str = "vec",
    query_vec_col: Optional[str] = None,
    id_col: str = "id",
    qid_col: str = "qid",
) -> DataFrame:
    """Q10 distance recomputation (runner.py:105-108, test/distance_test.py:46-55):
    re-derive the true metric distance for every (qid, id) pair in a packed
    result table and flag rows whose stored distance deviates beyond ``tol``.
    Returns the mismatching rows (empty DataFrame == verified)."""
    from bigvectorbench_spark.functions import distance as dist_fns

    qvec = query_vec_col or vec_col
    pairs = result.select(
        "qid",
        F.posexplode(F.arrays_zip("neighbors", "distances")).alias("pos", "pair"),
    ).select(
        "qid",
        F.col("pair.neighbors").alias("id"),
        F.col("pair.distances").cast("double").alias("stored"),
    ).filter(F.col("id") != PAD_ID)
    t = train.select(F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("_tv"))
    q = queries.select(F.col(qid_col).cast("bigint").alias("qid"), F.col(qvec).alias("_qv"))
    joined = pairs.join(t, "id").join(F.broadcast(q), "qid")
    recomputed = joined.withColumn(
        "recomputed", dist_fns.metric_dist(metric, F.col("_tv"), F.col("_qv"))
    )
    return recomputed.filter(
        ~F.isnan("recomputed") & (F.abs(F.col("recomputed") - F.col("stored")) > tol)
    ).select("qid", "id", "stored", "recomputed")
