"""Text retrieval over the document corpus: inverted-index BM25 top-k and
vocabulary heavy hitters.

Part of the BASELINE.json training-data-pipeline extension surface (no
reference analog — the reference's retrieval is vector kNN; a corpus
pipeline additionally needs lexical search for quality audits, dedup
triage, and eval-set mining).

Scale design:

- **The inverted index is the plan.** Postings ``(term, doc_id, tf)`` are
  one explode + one map-side-combinable groupBy away from the raw corpus.
  Queries touch only their own terms: postings are semi-joined against the
  (broadcast, tiny) query-term set *before* anything else, so the scored
  row count is O(matching postings), never O(docs × queries).
- **Document frequency comes free after the semi-join**: every document
  containing a query term survives it, so counting distinct docs per term
  on the filtered postings equals the corpus-wide df.
- **Corpus stats (N, avgdl) are one tiny aggregate** broadcast back into
  the scoring expression — no driver-side collect in the plan.
- **Engine-stable scoring**: per-term BM25 contributions are rounded then
  accumulated in DECIMAL (order-independent), so ranks are reproducible
  across engines and partitionings; ties break by ascending doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigvectorbench_spark.functions import text as tx


def _widen(df: DataFrame) -> DataFrame:
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        return df.repartition(parallelism)
    return df


def postings(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted-index postings ``(term, doc_id, dl, tf)`` — term frequency
    per document plus the document length needed by BM25 normalization."""
    tk = _widen(docs).select(
        F.col(id_col).alias("doc_id"), tx.tokens(F.col(text_col)).alias("tk")
    )
    tk = tk.select("doc_id", "tk", F.size("tk").alias("dl"))
    return (
        tk.select("doc_id", "dl", F.explode("tk").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").alias("tf"))
    )


def corpus_stats(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """One-row frame (n_docs, avgdl); joined (broadcast) into scoring."""
    dl = docs.select(F.size(tx.tokens(F.col(text_col))).alias("dl"))
    return dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "qid",
    terms_col: str = "terms",
) -> DataFrame:
    """BM25 top-k: for each query (a bag of terms), the ``k`` highest-scoring
    documents. Returns (qid, doc_id, score, rank).

    score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))  — the Robertson/Sparck-Jones
    form with the +1 smoothing Lucene uses.

    Per-term contributions are rounded to 9 dp and summed as DECIMAL so the
    total is independent of addition order (and of which engine computes
    it); the final score is rounded to 6 dp *before* ranking so ordering is
    also engine-stable. Duplicate query terms count once (set semantics).
    """
    post = postings(docs, id_col=id_col, text_col=text_col)
    qterms = queries.select(
        F.col(qid_col).alias("qid"), F.explode(terms_col).alias("term")
    ).distinct()
    uniq_terms = qterms.select("term").distinct()

    # Only postings for query terms ever leave the scan stage.
    hits = post.join(F.broadcast(uniq_terms), "term")
    docfreq = hits.groupBy("term").agg(F.count("*").alias("df"))
    stats = corpus_stats(docs, text_col=text_col)

    scored = (
        hits.join(F.broadcast(qterms), "term")
        .join(F.broadcast(docfreq), "term")
        .crossJoin(F.broadcast(stats))
    )
    n, df_, tf, dl = (F.col(c).cast("double") for c in ("n_docs", "df", "tf", "dl"))
    idf = F.log(F.lit(1.0) + (n - df_ + 0.5) / (df_ + 0.5))
    tfn = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / F.col("avgdl")))
    term_score = F.round(idf * tfn, 9).cast("decimal(28,10)")

    per_doc = (
        scored.groupBy("qid", "doc_id")
        .agg(F.round(F.sum(term_score), 6).cast("double").alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def top_terms(
    docs: DataFrame,
    *,
    group_col: str = "source",
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary heavy hitters: the ``n`` most frequent terms per group
    (corpus slice), with occurrence counts. (group, term, n_occurrences,
    rank). Exact — explode + map-side-combined groupBy + per-group top-n
    window; the shuffle carries (group, term) partial counts only."""
    exploded = _widen(docs).select(
        F.col(group_col).alias("grp"), F.explode(tx.tokens(F.col(text_col))).alias("term")
    )
    counts = exploded.groupBy("grp", "term").agg(F.count("*").alias("n_occurrences"))
    w = Window.partitionBy("grp").orderBy(F.col("n_occurrences").desc(), F.col("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= n)
        .select(F.col("grp").alias(group_col), "term", "n_occurrences", "rank")
    )
