"""Binary quantization (BQ) ANN family: 1-bit/dimension codes + exact refine.

The reference benchmarks binary-vector workloads as a first-class point type
(``point_type="bit"`` — reference datasets.py:348-352, data.py:20-25) and its
server backends ship binary index families for them (the Milvus wrapper's
BIN_FLAT/BIN_IVF surface, reference milvus/module.py:125-144 type lattice).
This module is the Spark-first recasting of the *other* direction every
production vector store added on top: binary quantization of FLOAT vectors —
each dimension collapses to one sign bit around a learned per-dimension
threshold, the packed 64-bit words are scanned with XOR+popcount (a 64×
narrower read than the float column, whole-stage-codegen arithmetic only),
and the hamming pre-rank's ``k·overfetch`` survivors are re-ranked with exact
float distances.

100 TB design: the candidate stage reads ONLY ``ARRAY<BIGINT>`` words (d/64
longs per row instead of d floats), scores with JVM bit_count — no Python, no
shuffle until the per-query top-n window — and the refine stage touches float
vectors for just the ~q·k·overfetch candidate rows via a broadcast pair join
(same discipline as PQIndex._refine).  The fit is a driver-side per-dimension
mean over a bounded sorted sample (the IVF/PQ ``fit on a sample, apply
distributed`` pattern, similarity.py:90-103).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from bigvectorbench_spark.functions import distance as dx
from bigvectorbench_spark.operators.knn import topk_window

_OUT_SCHEMA = "qid bigint, id bigint, dist double, rank int"

#: fit() collects one float64 row-mean sample to the driver; keep it bounded
#: the same way IVFIndex.fit bounds its kmeans sample.
MAX_FIT_SAMPLE_ROWS = 1_000_000

#: encode() unrolls d literal comparisons into the packing expression; guard
#: against plans that would blow past codegen limits.
MAX_DIM = 4096


def pack_thresholds(vec: Column, thresholds: list[float]) -> Column:
    """Pack ``(vec[i] > thresholds[i])`` sign bits into ARRAY<BIGINT> words
    (64 bits/word, first dimension at the word's highest bit — the
    ``pack_signs`` layout, distance.py:133).  The per-dimension literal
    thresholds are folded into one unrolled shift/OR expression per word, so
    no intermediate ARRAY<BOOLEAN> column exists to be re-evaluated per word
    (the HOF hazard pack_bits' docstring warns about)."""
    d = len(thresholds)
    if d > MAX_DIM:
        raise ValueError(f"d={d} > MAX_DIM={MAX_DIM}")
    words = []
    for w in range(0, d, 64):
        chunk = thresholds[w:w + 64]
        bits = [
            F.shiftleft(
                F.when(vec[w + j] > F.lit(float(t)), F.lit(1))
                .otherwise(F.lit(0)).cast("long"),
                len(chunk) - 1 - j,
            )
            for j, t in enumerate(chunk)
        ]
        words.append(reduce(lambda a, b: a.bitwiseOR(b), bits))
    return F.array(*words)


def hamming_packed_int(a: Column, b: Column) -> Column:
    """Integer hamming distance between packed word arrays: Σ bit_count(xor).
    Unlike ``hamming_packed_dist`` (which normalizes to the reference's
    [0,1] metric), candidate ranking wants the raw integer — exact on both
    engines, so (hamming, id) candidate order is engine-stable."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


@dataclass
class BQIndex:
    """Per-dimension binary thresholds (the 'codebook' of the 1-bit family)."""

    thresholds: list[float]

    @property
    def d(self) -> int:
        return len(self.thresholds)

    @classmethod
    def fit(
        cls,
        train: DataFrame,
        *,
        vec_col: str = "vec",
        center: bool = True,
        max_sample_rows: int = MAX_FIT_SAMPLE_ROWS,
        sort_col: str | None = None,
    ) -> "BQIndex":
        """``center=True``: threshold each dimension at its sample mean
        (float64 numpy mean over rows collected in ``sort_col`` order —
        pinned so an external recomputation of the build sees the same
        bits, the IVFIndex.fit sort_col contract).  ``center=False``:
        threshold at 0.0 (data-independent; the sign-bit code of the
        packed-hamming workload)."""
        df = train
        if sort_col is not None:
            df = df.orderBy(sort_col)
        rows = df.select(vec_col).limit(max_sample_rows if center else 1).collect()
        if not rows:
            raise ValueError("cannot fit BQIndex on an empty table")
        if not center:
            return cls(thresholds=[0.0] * len(rows[0][0]))
        X = np.array([r[0] for r in rows], dtype=np.float64)
        return cls(thresholds=[float(x) for x in X.mean(axis=0)])

    def encode(
        self,
        df: DataFrame,
        *,
        vec_col: str = "vec",
        out_col: str = "words",
        keep: list[str] | None = None,
    ) -> DataFrame:
        """Materialize the packed code column (the M2 'index build' artifact
        a BQ deployment stores next to — or instead of — the float column).
        ``keep``: columns carried alongside; default everything."""
        cols = keep if keep is not None else df.columns
        return df.select(
            *cols, pack_thresholds(F.col(vec_col), self.thresholds).alias(out_col))

    def search(
        self,
        codes: DataFrame,
        queries: DataFrame,
        k: int = 10,
        *,
        words_col: str = "words",
        id_col: str = "id",
        qid_col: str = "qid",
        query_vec_col: str = "vec",
        refine_train: DataFrame | None = None,
        refine_vec_col: str = "vec",
        metric: str = "euclidean",
        overfetch: int = 4,
        pre_filter=None,
    ) -> DataFrame:
        """Hamming pre-rank over the packed words (top ``k·overfetch`` per
        query by (popcount, id)), then exact re-rank against
        ``refine_train`` floats.  Without ``refine_train`` the hamming
        ranking itself is the result (dist = integer hamming), which is the
        BIN_FLAT behavior for genuinely binary data.

        ``pre_filter`` composes filtered-ANN semantics: applied to the
        codes table before scoring so Catalyst pushes it into the scan."""
        if pre_filter is not None:
            codes = codes.filter(
                F.expr(pre_filter) if isinstance(pre_filter, str) else pre_filter)
        q = queries.select(
            F.col(qid_col).cast("bigint").alias("qid"),
            F.col(query_vec_col).alias("_qvec"),
            pack_thresholds(F.col(query_vec_col), self.thresholds).alias("_qwords"),
        )
        t = codes.select(
            F.col(id_col).cast("bigint").alias("id"), F.col(words_col).alias("_twords"))
        n_cand = k * overfetch if refine_train is not None else k
        scored = (
            t.join(F.broadcast(q.select("qid", "_qwords")))
            .select("qid", "id",
                    hamming_packed_int(F.col("_twords"), F.col("_qwords")).alias("_ham"))
        )
        cand = topk_window(scored, n_cand, dist="_ham")
        if refine_train is None:
            return cand.select(
                "qid", "id", F.col("_ham").cast("double").alias("dist"), "rank")
        vecs = refine_train.select(
            F.col(id_col).cast("bigint").alias("id"),
            F.col(refine_vec_col).alias("_tvec"))
        refined = (
            F.broadcast(cand.select("qid", "id"))
            .join(vecs, "id")
            .join(F.broadcast(q.select("qid", "_qvec")), "qid")
            .select("qid", "id",
                    dx.metric_dist(metric, F.col("_tvec"), F.col("_qvec")).alias("dist"))
        )
        return topk_window(refined, k).select("qid", "id", "dist", "rank")
