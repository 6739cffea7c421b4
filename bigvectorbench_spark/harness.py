"""Benchmark harness — SURVEY §2.6 A10-A14 / §3.1 and reference
definitions.py / main.py / data_export.py parity.

- ``expand_definitions``: the cartesian run-grid expansion
  (definitions.py:79-107, 240-304) with ``@metric/@dimension/@count``
  variable substitution (definitions.py:110-130).
- ``filter_already_run``: skip definitions whose results exist — the
  reference's result-file existence check (main.py:264-306) expressed as a
  left-anti join against the result catalog (A12).
- ``run_definition``: one benchmark run (runner.py:492-625 analog): timed
  build (index materialization), timed batch search, best-of-N repetitions
  (runner.py:61, 222-226), recall + QPS + percentile metrics.
- ``export_metrics``: union of per-run metric rows → CSV (data_export.py,
  S8/A14).

Algorithms registered: ``flat-expr`` (exact, Catalyst window plan),
``flat-gemm`` (exact, Arrow GEMM kernel), ``ivf`` (KMeans cluster pruning,
build knob nlist, query knob nprobe) — the Spark-idiomatic subset of the
reference's FLAT/IVF families (SURVEY §2.7)."""

from __future__ import annotations

import itertools
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Mapping, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigvectorbench_spark.operators import metrics as mx
from bigvectorbench_spark.operators.groundtruth import build_groundtruth, pack_results
from bigvectorbench_spark.operators.knn import knn
from bigvectorbench_spark.operators.similarity import IVFIndex


@dataclass(frozen=True)
class Definition:
    """One expanded run (reference Definition, definitions.py:15-23)."""

    algorithm: str
    dataset: str
    count: int
    build_args: tuple[tuple[str, Any], ...] = ()
    query_args: tuple[tuple[str, Any], ...] = ()

    @property
    def label(self) -> str:
        ba = ",".join(f"{k}={v}" for k, v in self.build_args)
        qa = ",".join(f"{k}={v}" for k, v in self.query_args)
        return f"{self.algorithm}({ba})[{qa}]"


def _substitute(v: Any, variables: Mapping[str, Any]) -> Any:
    if isinstance(v, str) and v.startswith("@"):
        return variables[v[1:]]
    return v


def _grid(d: Mapping[str, Sequence[Any]], variables: Mapping[str, Any]):
    if not d:
        return [()]
    keys = sorted(d)
    out = []
    for combo in itertools.product(*[d[k] for k in keys]):
        out.append(tuple((k, _substitute(v, variables)) for k, v in zip(keys, combo)))
    return out


def expand_definitions(
    algorithm: str,
    dataset: str,
    count: int,
    *,
    build_grid: Mapping[str, Sequence[Any]] | None = None,
    query_grid: Mapping[str, Sequence[Any]] | None = None,
    variables: Mapping[str, Any] | None = None,
) -> list[Definition]:
    """Cartesian expansion of build-time × query-time argument grids."""
    variables = dict(variables or {})
    variables.setdefault("count", count)
    return [
        Definition(algorithm, dataset, count, b, q)
        for b in _grid(build_grid or {}, variables)
        for q in _grid(query_grid or {}, variables)
    ]


def definitions_df(spark: SparkSession, defs: Sequence[Definition]) -> DataFrame:
    return spark.createDataFrame(
        [(d.algorithm, d.dataset, d.count, d.label) for d in defs],
        "algorithm string, dataset string, count int, label string",
    )


def filter_already_run(
    spark: SparkSession, defs: Sequence[Definition], catalog: Optional[DataFrame]
) -> list[Definition]:
    """A12: anti-join the definition list against the result catalog
    (columns dataset/count/label)."""
    if catalog is None:
        return list(defs)
    remaining = (
        definitions_df(spark, defs)
        .join(catalog.select("dataset", "count", "label"),
              ["dataset", "count", "label"], "left_anti")
        .collect()
    )
    keep = {(r["dataset"], r["count"], r["label"]) for r in remaining}
    return [d for d in defs if (d.dataset, d.count, d.label) in keep]


# ------------------------------------------------------------------ algorithms

def _run_flat(method: str):
    def _build(train, _args):
        return train  # exact scan: no index artifact

    def _search(train_art, queries, count, _qargs):
        return knn(train_art, queries, k=count, method=method)

    return _build, _search


def _run_hnsw():
    """HNSW through the grid harness: build-time args M/efConstruction/
    num_shards (reference milvus/config.yml HNSW grid: M, efConstruction),
    query-time arg ef (set_query_arguments analog).  The build artifact is
    the shard DataFrame — cache() stands in for the stored parquet (the
    CLI's write step persists results, not indexes)."""
    def _build(train, args):
        from bigvectorbench_spark.operators.hnsw import build_hnsw_shards

        shards = build_hnsw_shards(
            train, m=int(args.get("M", 8)),
            ef_construction=int(args.get("efConstruction", 64)),
            num_shards=int(args.get("num_shards", 8)), seed=3).cache()
        shards.count()  # materialize: build time must be in build_time
        return shards

    def _search(shards, queries, count, qargs):
        from bigvectorbench_spark.operators.hnsw import hnsw_search

        ef = qargs.get("ef", 64)
        return hnsw_search(shards, queries, k=count,
                           ef="auto" if ef == "auto" else int(ef))

    return _build, _search


def _nprobe_arg(qargs):
    """Grid nprobe knob: an int, or the literal "auto" (resolved by
    probe_lists via auto_nprobe — the calibrated recall-holding rule)."""
    v = qargs.get("nprobe", 4)
    return v if v == "auto" else int(v)


def _run_ivf():
    def _build(train, args):
        idx = IVFIndex.fit(train, nlist=int(args.get("nlist", 16)), seed=1)
        return idx, idx.assign(train)

    def _search(art, queries, count, qargs):
        idx, indexed = art
        return idx.search(indexed, queries, k=count, nprobe=_nprobe_arg(qargs))

    return _build, _search


def _run_pq():
    """PQ ADC through the grid harness: build knobs m/nbits (the reference's
    IVF_PQ build grid, milvus/config.yml:60-75 → definitions.py:240-304;
    ksub = 2**nbits), query knob overfetch (>1 enables the exact-refine
    re-rank over the float table — the standard PQ-then-refine pipeline)."""
    def _build(train, args):
        from bigvectorbench_spark.operators.pq import PQIndex

        pq = PQIndex.fit(train, m=int(args.get("m", 8)),
                         ksub=1 << int(args.get("nbits", 8)), seed=1)
        encoded = pq.encode(train).cache()
        encoded.count()  # materialize: encode cost belongs to build_time
        return pq, encoded, train

    def _search(art, queries, count, qargs):
        pq, encoded, train = art
        over = int(qargs.get("overfetch", 1))
        return pq.search(encoded, queries, k=count,
                         refine_train=train if over > 1 else None,
                         overfetch=over)

    return _build, _search


def _run_ivfpq():
    """IVF_PQ composition: build knobs nlist/m/nbits, query knob nprobe
    (the reference's workhorse grid, milvus/config.yml:60-75)."""
    def _build(train, args):
        from bigvectorbench_spark.operators.pq import PQIndex

        idx = IVFIndex.fit(train, nlist=int(args.get("nlist", 16)), seed=1)
        pq = PQIndex.fit(train, m=int(args.get("m", 8)),
                         ksub=1 << int(args.get("nbits", 8)), seed=1)
        indexed = pq.encode(idx.assign(train)).cache()
        indexed.count()
        return idx, pq, indexed

    def _search(art, queries, count, qargs):
        from bigvectorbench_spark.operators.pq import ivfpq_search

        idx, pq, indexed = art
        return ivfpq_search(idx, pq, indexed, queries, k=count,
                            nprobe=_nprobe_arg(qargs))

    return _build, _search


def _run_sq8():
    """IVF_SQ8's quantization half (milvus/config.yml:40-58): int8-coded
    stored vectors, full-precision queries.  No build/query knobs — the
    scalar quantizer is parameter-free; compose with ivf via the grid's
    nlist if cell pruning is wanted too."""
    def _build(train, _args):
        from bigvectorbench_spark.operators.quantize import quantize_table

        coded = quantize_table(train).drop("vec").cache()
        coded.count()
        return coded

    def _search(coded, queries, count, _qargs):
        from bigvectorbench_spark.operators.quantize import knn_quantized

        return knn_quantized(coded, queries, k=count)

    return _build, _search


def _run_opq():
    """OPQ: build knobs m/nbits/iters (rotation alternations; iters=0 is
    plain PQ), query knob overfetch — the PQ grid with the learned
    rotation in front."""
    def _build(train, args):
        from bigvectorbench_spark.operators.opq import OPQIndex

        idx = OPQIndex.fit(train, m=int(args.get("m", 8)),
                           ksub=1 << int(args.get("nbits", 8)),
                           iters=int(args.get("iters", 3)), seed=1)
        encoded = idx.encode(train).select("id", "codes").cache()
        encoded.count()
        return idx, encoded, train

    def _search(art, queries, count, qargs):
        idx, encoded, train = art
        over = int(qargs.get("overfetch", 1))
        return idx.search(encoded, queries, k=count,
                          refine_train=train if over > 1 else None,
                          overfetch=over)

    return _build, _search


def _run_bq():
    """Binary quantization: build knob center (mean thresholds vs raw sign
    bits), query knob overfetch (hamming pre-rank width before the exact
    refine).  1 bit/dim codes — the narrowest scan in the family grid."""
    def _build(train, args):
        from bigvectorbench_spark.operators.bq import BQIndex

        idx = BQIndex.fit(train, center=bool(args.get("center", True)),
                          sort_col="id")
        codes = idx.encode(train, keep=["id"]).cache()
        codes.count()  # materialize: encode cost belongs to build_time
        return idx, codes, train

    def _search(art, queries, count, qargs):
        idx, codes, train = art
        return idx.search(codes, queries, k=count, refine_train=train,
                          overfetch=int(qargs.get("overfetch", 4)))

    return _build, _search


def _run_hybrid():
    """Multi-field hybrid search through the grid harness (the reference's
    hybrid = per-field ANN subqueries merged by a ranker,
    milvus/module.py:422-458): the vector splits into two half-dimension
    fields (the mv_knn convention), each field retrieves its own top-2k
    run — brute exact or BQ-indexed per the build knob ``leg`` — and
    Reciprocal Rank Fusion merges them (query knobs ``k0`` and ``w2``,
    the second field's weight).  Scored against the FULL-vector exact
    ground truth, so the metrics CSV gets honest recall/QPS Pareto points
    for fusion configs (VERDICT r7 ask #6)."""
    from pyspark.sql import functions as _F

    def _split(df, half, d, vec_col="vec"):
        a = df.select("id", _F.slice(vec_col, 1, half).alias("vec"))
        b = df.select("id", _F.slice(vec_col, half + 1, d - half).alias("vec"))
        return a, b

    def _build(train, args):
        d = train.select(F.size("vec")).first()[0]
        half = d // 2
        t1, t2 = _split(train, half, d)
        leg = str(args.get("leg", "bq"))
        if leg == "brute":
            return ("brute", half, d, (t1,), (t2,))
        if leg != "bq":
            raise ValueError(f"unknown hybrid leg {leg!r}; expected brute|bq")
        from bigvectorbench_spark.operators.bq import BQIndex

        arts = []
        for t in (t1, t2):
            idx = BQIndex.fit(t, sort_col="id")
            codes = idx.encode(t, keep=["id"]).cache()
            codes.count()  # materialize: encode cost belongs to build_time
            arts.append((idx, codes, t))
        return ("bq", half, d, arts[0], arts[1])

    def _search(art, queries, count, qargs):
        from bigvectorbench_spark.operators import retrieval as rt

        leg, half, d, a1, a2 = art
        k0 = float(qargs.get("k0", 60))
        w2 = float(qargs.get("w2", 1.0))
        k_leg = count * 2
        q1, q2 = _split(queries.withColumnRenamed("qid", "id"), half, d)
        runs = []
        for (qi, ai) in ((q1, a1), (q2, a2)):
            qi = qi.withColumnRenamed("id", "qid")
            if leg == "brute":
                r = knn(ai[0], qi, k=k_leg, method="expr")
            else:
                idx, codes, t = ai
                r = idx.search(codes, qi, k=k_leg, refine_train=t, overfetch=4)
            runs.append(r.select("qid", F.col("id").alias("doc_id"), "rank"))
        fused = rt.rrf_fuse(runs, k=count, k0=int(k0), weights=[1.0, w2])
        return fused.select(
            "qid", F.col("doc_id").alias("id"),
            (-F.col("score")).alias("dist"), F.col("rank").cast("int"))

    return _build, _search


def _hashed_text_vectors(df: DataFrame, id_col: str) -> DataFrame:
    """Derived dense vectors for text rows — the hashed-embedding fold
    (functions/embed.py): (id, v int array, nsq), zero-norm rows dropped."""
    from bigvectorbench_spark.functions import embed as em
    from bigvectorbench_spark.functions import text as tx

    return (df
            .select(F.col(id_col).alias("id"), tx.tokens(F.col("text")).alias("tk"))
            .select("id", em.token_hashes(F.col("tk")).alias("th"))
            .select("id", em.hashed_embedding(F.col("th")).alias("v"))
            .withColumn("nsq", F.aggregate("v", F.lit(0).cast("bigint"),
                                           lambda a, x: a + x * x))
            .filter(F.col("nsq") > 0))


def sparse_exact_groundtruth(train: DataFrame, queries: DataFrame,
                             k: int) -> DataFrame:
    """Exact sparse-IP ground truth for a text dataset (train(id, text),
    queries(qid, text)): the unpruned inverted-index search with external
    queries weighted under corpus statistics — the truth the sparse grid's
    recall is honest against (dist = −score, the rrf_fuse convention)."""
    from bigvectorbench_spark.operators import sparse as sp

    post = sp.lexical_postings(train, id_col="id", text_col="text")
    wpost = sp.sparse_postings(train, post=post)
    qw = sp.text_query_weights(queries, post, qid_col="qid", text_col="text")
    topk = sp.sparse_topk(train, queries, k=k, wpost=wpost, qweights=qw)
    topk = topk.select("qid", F.col("doc_id").alias("id"),
                       (-F.col("score")).alias("dist"), "rank")
    return pack_results(topk, queries, k)


def _run_sparse():
    """Sparse inner-product family through the grid harness (the Milvus
    SPARSE_FLOAT_VECTOR analog, operators/sparse.py — VERDICT r8 ask #7):
    documents become SMART-ltn TF-IDF vectors over unigram+bigram
    features; build knob ``m`` is the impact-ordered per-term posting cap
    (0 = exact/unpruned, "auto" = the calibrated auto_m rule); queries are
    EXTERNAL text weighted under corpus statistics (text_query_weights).
    dist = −score so smaller is better (the rrf_fuse convention), scored
    against sparse_exact_groundtruth."""
    from bigvectorbench_spark.operators import sparse as sp

    def _build(train, args):
        post = sp.lexical_postings(train, id_col="id", text_col="text").cache()
        wpost = sp.sparse_postings(train, post=post)
        m = args.get("m", "auto")
        idx = wpost if m in (0, "0", None, "exact") else sp.prune_postings(
            wpost, m=m)
        idx = idx.cache()
        idx.count()  # materialize: index build cost belongs to build_time
        return post, idx

    def _search(art, queries, count, qargs):
        post, idx = art
        qw = sp.text_query_weights(queries, post, qid_col="qid",
                                   text_col="text")
        r = sp.sparse_topk(None, queries, k=count, wpost=idx, qweights=qw)
        return r.select("qid", F.col("doc_id").alias("id"),
                        (-F.col("score")).alias("dist"),
                        F.col("rank").cast("int"))

    return _build, _search


def _run_sparse_hybrid():
    """Sparse+dense multi-field hybrid through the grid harness (the
    Milvus 2.4 SPARSE_FLOAT_VECTOR + dense field form the declared
    hybrid_sparse_rrf pins at oracle scale): the sparse leg retrieves
    top-2k through the (optionally impact-pruned) inverted index, the
    dense leg through cosine over derived hashed embeddings — brute or
    BQ-indexed per the ``leg`` knob — and RRF merges them (query knobs
    ``k0`` and ``w2``).  Scored against the exact SPARSE ground truth, so
    the metrics CSV shows what the dense field adds/costs against the
    lexical truth."""
    from bigvectorbench_spark.operators import retrieval as rt
    from bigvectorbench_spark.operators import sparse as sp

    def _build(train, args):
        post = sp.lexical_postings(train, id_col="id", text_col="text").cache()
        wpost = sp.sparse_postings(train, post=post)
        m = args.get("m", "auto")
        idx = wpost if m in (0, "0", None, "exact") else sp.prune_postings(
            wpost, m=m)
        idx = idx.cache()
        idx.count()
        vecs = _hashed_text_vectors(train, "id").cache()
        leg = str(args.get("leg", "brute"))
        if leg == "brute":
            # The brute dense leg is an O(docs × queries) crossJoin — same
            # ALL_PAIRS envelope as the entry-level brute legs (ADVICE r9
            # #3): refuse fast past the cap instead of silently launching
            # the quadratic job from the CLI grid.
            from bigvectorbench_spark.operators import dedup as dd

            n_rows = vecs.count()
            if n_rows > dd.ALL_PAIRS_MAX_ROWS:
                raise ValueError(
                    f"sparse-hybrid brute dense leg is O(docs × queries) "
                    f"({n_rows} rows > {dd.ALL_PAIRS_MAX_ROWS}) — run "
                    "--algorithm sparse-hybrid with leg=bq (BQ candidate "
                    "scan + exact refine) at this size")
            return post, idx, ("brute", vecs)
        if leg != "bq":
            raise ValueError(f"unknown dense leg {leg!r}; expected brute|bq")
        from bigvectorbench_spark.operators.bq import BQIndex

        fvec = vecs.select("id", F.col("v").cast("array<double>").alias("vec"))
        bq = BQIndex.fit(fvec, sort_col="id")
        codes = bq.encode(fvec, keep=["id"]).cache()
        codes.count()
        return post, idx, ("bq", vecs, bq, codes)

    def _search(art, queries, count, qargs):
        post, idx, dense = art
        k0 = int(qargs.get("k0", 60))
        w2 = float(qargs.get("w2", 1.0))
        k_leg = count * 2
        qw = sp.text_query_weights(queries, post, qid_col="qid",
                                   text_col="text")
        lex = sp.sparse_topk(None, queries, k=k_leg, wpost=idx,
                             qweights=qw).select("qid", "doc_id", "rank")
        qv = _hashed_text_vectors(queries, "qid").select(
            F.col("id").alias("qid"), F.col("v").alias("qv"),
            F.col("nsq").alias("qn"))
        dot = F.aggregate(F.zip_with("qv", "tv", lambda a, b: a * b),
                          F.lit(0).cast("bigint"), lambda a, x: a + x)
        dist = (F.lit(1.0) - dot.cast("double")
                / (F.sqrt(F.col("qn").cast("double"))
                   * F.sqrt(F.col("tn").cast("double"))))
        if dense[0] == "brute":
            tv = dense[1].select(F.col("id").alias("doc_id"),
                                 F.col("v").alias("tv"),
                                 F.col("nsq").alias("tn"))
            joined = tv.crossJoin(F.broadcast(qv)).select(
                "qid", "doc_id", dist.alias("d"))
        else:
            _, vecs, bq, codes = dense
            qvec = qv.select("qid", F.col("qv").cast("array<double>")
                             .alias("vec"))
            cand = bq.search(codes, qvec, k=k_leg * 4).select("qid", "id")
            tv = vecs.select(F.col("id"), F.col("v").alias("tv"),
                             F.col("nsq").alias("tn"))
            joined = (F.broadcast(cand).join(tv, "id")
                      .join(F.broadcast(qv), "qid")
                      .select("qid", F.col("id").alias("doc_id"),
                              dist.alias("d")))
        from pyspark.sql import Window
        w = Window.partitionBy("qid").orderBy(F.col("d"), F.col("doc_id"))
        vec = (joined.withColumn("rank", F.row_number().over(w))
               .filter(F.col("rank") <= k_leg)
               .select("qid", "doc_id", "rank"))
        fused = rt.rrf_fuse([lex, vec], k=count, k0=k0, weights=[1.0, w2])
        return fused.select("qid", F.col("doc_id").alias("id"),
                            (-F.col("score")).alias("dist"),
                            F.col("rank").cast("int"))

    return _build, _search


ALGORITHMS: dict[str, Callable] = {
    "flat-expr": lambda: _run_flat("expr"),
    "flat-gemm": lambda: _run_flat("gemm"),
    "ivf": _run_ivf,
    "hnsw": _run_hnsw,
    "pq": _run_pq,
    "ivfpq": _run_ivfpq,
    "sq8": _run_sq8,
    "bq": _run_bq,
    "opq": _run_opq,
    "hybrid": _run_hybrid,
    "sparse": _run_sparse,
    "sparse-hybrid": _run_sparse_hybrid,
}


@dataclass
class RunResult:
    definition: Definition
    build_time: float
    best_search_time: float
    qps: float
    mean_recall: float
    results: DataFrame = field(repr=False)
    percentiles_ms: dict[str, float] = field(default_factory=dict)


def run_definition(
    spark: SparkSession,
    defn: Definition,
    train: DataFrame,
    queries: DataFrame,
    groundtruth: Optional[DataFrame] = None,
    *,
    runs: int = 1,
    individual_timing: bool = False,
) -> RunResult:
    """One load→build→search→score run (runner.py:492-625 shape).

    best_search_time = min over ``runs`` repetitions of the batch wall-clock
    divided by query count (runner.py:222-226's batch analog); QPS = its
    inverse (plotting/metrics.py:51-58).  With ``individual_timing`` each
    query is additionally executed as its own job (the reference's
    per-query protocol) to produce p50/p90/p95/p99 latencies — use for
    modest query counts only."""
    if defn.algorithm not in ALGORITHMS:
        raise ValueError(f"unknown algorithm {defn.algorithm!r}; have {sorted(ALGORITHMS)}")
    build, search = ALGORITHMS[defn.algorithm]()
    bargs, qargs = dict(defn.build_args), dict(defn.query_args)

    t0 = time.perf_counter()
    artifact = build(train, bargs)
    build_time = time.perf_counter() - t0

    n_queries = queries.count()
    best = float("inf")
    topk = None
    for _ in range(max(1, runs)):
        t0 = time.perf_counter()
        topk = search(artifact, queries, defn.count, qargs)
        topk.write.format("noop").mode("overwrite").save()
        best = min(best, (time.perf_counter() - t0) / max(n_queries, 1))

    pct: dict[str, float] = {}
    if individual_timing:
        from bigvectorbench_spark.operators.timing import time_individual_queries

        times = time_individual_queries(
            spark, train, queries, defn.count,
            search_fn=lambda t, q, kk: search(artifact, q, kk, qargs), runs=runs)
        row = mx.latency_percentiles(times, percentiles=(0.5, 0.9, 0.95, 0.99)).collect()[0]
        pct = {c: row[c] for c in row.asDict()}

    packed = pack_results(topk, queries, defn.count)
    if groundtruth is None:
        groundtruth = build_groundtruth(train, queries, k=defn.count, method="expr")
    recall = mx.recall_summary(packed, groundtruth).collect()[0]["mean_recall"]
    return RunResult(
        percentiles_ms=pct,
        definition=defn,
        build_time=build_time,
        best_search_time=best,
        qps=1.0 / best if best > 0 else float("inf"),
        mean_recall=recall,
        results=packed,
    )


def metrics_rows(spark: SparkSession, results: Sequence[RunResult]) -> DataFrame:
    """A14/S8: union of per-run metric rows, ready for CSV export or the
    Pareto frontier (A9) over (recall, qps)."""
    return spark.createDataFrame(
        [
            (r.definition.dataset, r.definition.count, r.definition.algorithm,
             r.definition.label, r.build_time, r.best_search_time, r.qps, r.mean_recall)
            for r in results
        ],
        "dataset string, count int, algorithm string, label string, "
        "build_time double, best_search_time double, qps double, mean_recall double",
    )


def export_metrics(df: DataFrame, path: str) -> None:
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
