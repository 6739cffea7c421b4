"""Vector dataset ingesters — SURVEY.md §2.1 S1-S4.

The reference ingests GloVe zip text, fvecs/ivecs packed structs, MNIST
idx-gz, bag-of-words, transactions, and HuggingFace datasets
(datasets.py:454-807) into HDF5.  This engine standardizes on Parquet with
``ARRAY<FLOAT>`` vectors (S1); the ingesters below read the two most
load-bearing external formats plus delimited text, Spark-first:

- fvecs/ivecs: ``spark.read.format("binaryFile")`` + an Arrow-batched
  decoder (``mapInPandas``) that numpy-unpacks the packed little-endian
  records per file.  Row ids are positional per the reference convention
  (id = row index — milvus/module.py:188 etc.), assigned per-file offset so
  a multi-file directory still gets stable global ids.
- text vectors (GloVe-style ``word v1 v2 …``): plain ``spark.read.text`` +
  column expressions, fully JVM-side.

At 100 TB both scale trivially: binaryFile splits per file, text splits per
block, ids derive from data (not zipWithIndex), and the decode is Arrow-
batched."""

from __future__ import annotations

import io
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _decode_xvecs(content: bytes, elem: str) -> np.ndarray:
    """Decode an fvecs/ivecs buffer: each record is int32 d + d values
    (the classic TEXMEX layout the reference parses at datasets.py:470-495)."""
    if len(content) == 0:
        return np.zeros((0, 0), dtype=np.float32)
    d = struct.unpack("<i", content[:4])[0]
    itemsize = 4
    rec = 1 + d
    a = np.frombuffer(content, dtype="<i4").reshape(-1, rec)
    if not (a[:, 0] == d).all():
        raise ValueError("inconsistent dimensions in xvecs file")
    body = a[:, 1:]
    if elem == "f":
        return body.view("<f4")
    return body


def read_fvecs(spark: SparkSession, path: str, *, elem: str = "f") -> DataFrame:
    """fvecs (elem='f') / ivecs (elem='i') directory or file → (id, vec).

    Ids are positional within each file plus a per-file base offset computed
    from file order (path-sorted), matching the reference's id=row-index
    convention for single-file datasets."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    # per-file row counts -> base offsets (driver-side; file list is small)
    counts = [
        (r["path"], len(_decode_xvecs(r["content"], elem)))
        for r in files.select("path", "content").collect()
    ]
    counts.sort()
    offsets, acc = {}, 0
    for p, n in counts:
        offsets[p] = acc
        acc += n
    bc = spark.sparkContext.broadcast(offsets)
    out_type = "array<float>" if elem == "f" else "array<int>"

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                mat = _decode_xvecs(row["content"], elem)
                base = bc.value[row["path"]]
                yield pd.DataFrame(
                    {
                        "id": np.arange(base, base + len(mat), dtype=np.int64),
                        "vec": [r.tolist() for r in mat],
                    }
                )

    return files.mapInPandas(_decode, schema=f"id bigint, vec {out_type}")


def read_text_vectors(spark: SparkSession, path: str, *, has_token: bool = True) -> DataFrame:
    """GloVe-style text vectors (datasets.py:454-467): one row per line,
    optional leading token, whitespace-separated floats.  JVM-side split +
    cast; id = hash-free positional via the token (if present) or line order
    within each file is NOT guaranteed, so we id by monotonically increasing
    only when a token column is absent."""
    lines = spark.read.text(path).select(F.split(F.trim("value"), r"\s+").alias("parts"))
    if has_token:
        return lines.select(
            F.element_at("parts", 1).alias("token"),
            F.slice("parts", 2, 1_000_000).cast("array<float>").alias("vec"),
        )
    return lines.select(
        F.monotonically_increasing_id().alias("id"),
        F.col("parts").cast("array<float>").alias("vec"),
    )


def read_idx_images(spark: SparkSession, path: str) -> DataFrame:
    """MNIST idx format (reference datasets.py:509-548): big-endian magic
    0x00000803, dims header, uint8 pixels.  One file → (id, vec) rows with
    pixels as floats; gzip handled transparently by extension."""
    import gzip

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                raw = bytes(row["content"])
                if row["path"].endswith(".gz"):
                    raw = gzip.decompress(raw)
                magic, n = struct.unpack(">ii", raw[:8])
                if magic != 0x00000803:
                    raise ValueError(f"bad idx magic {magic:#x} in {row['path']}")
                rows_, cols = struct.unpack(">ii", raw[8:16])
                mat = np.frombuffer(raw, dtype=np.uint8, offset=16).reshape(
                    n, rows_ * cols)
                yield pd.DataFrame({
                    "id": np.arange(n, dtype=np.int64),
                    "vec": [r.astype(np.float32).tolist() for r in mat],
                })

    return files.mapInPandas(_decode, schema="id bigint, vec array<float>")


def read_transactions(spark: SparkSession, path: str) -> DataFrame:
    """Kosarak-style transactions (datasets.py:642-662): one line per
    transaction, space-separated item ids → (id, items ARRAY<INT>), id =
    line order (positional, reference convention).  zipWithIndex gives the
    stable per-file order a text scan alone cannot."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    rows = rdd.map(lambda t: (t[1], [int(x) for x in t[0].split()] if t[0].strip() else []))
    return spark.createDataFrame(rows, "id bigint, items array<int>")


def read_bag_of_words(spark: SparkSession, path: str) -> DataFrame:
    """UCI docword format (datasets.py:590-609): 3 header lines (D, W, NNZ)
    then ``docID wordID count`` triples → (id, items ARRAY<INT>) distinct
    word sets per doc.  The triple table is a real distributed scan; only
    the grouping shuffles."""
    lines = spark.read.text(path)
    triples = (
        lines.select(F.split(F.trim("value"), r"\s+").alias("p"))
        .filter(F.size("p") == 3)
        .select(
            F.element_at("p", 1).cast("long").alias("id"),
            F.element_at("p", 2).cast("int").alias("word"),
        )
        .filter(F.col("id").isNotNull() & F.col("word").isNotNull())
    )
    return triples.groupBy("id").agg(F.sort_array(F.collect_set("word")).alias("items"))


def read_ratings_sets(
    spark: SparkSession, path: str, *, sep: str = "::", min_rating: float = 4.0
) -> DataFrame:
    """MovieLens-style ratings (datasets.py:705-758): ``user::item::rating``
    rows → per-user sets of well-rated items (the jaccard workload's input).
    """
    lines = spark.read.text(path)
    parts = lines.select(F.split("value", sep).alias("p")).filter(F.size("p") >= 3)
    rated = parts.select(
        F.element_at("p", 1).cast("long").alias("user"),
        F.element_at("p", 2).cast("int").alias("item"),
        F.element_at("p", 3).cast("double").alias("rating"),
    ).filter(F.col("rating") >= min_rating)
    return rated.groupBy(F.col("user").alias("id")).agg(
        F.sort_array(F.collect_set("item")).alias("items"))


def hf_batches_to_df(
    spark: SparkSession,
    batches,
    *,
    vec_col: str = "emb",
    text_col: str | None = None,
    id_offset: int = 0,
) -> DataFrame:
    """Convert an iterable of pandas batches (the shape HuggingFace's
    ``Dataset.to_pandas(batched=True)`` yields) into the engine's standard
    (id, vec ARRAY<FLOAT>[, text]) table.  Ids are positional across batches
    (reference convention, datasets.py:788-795).  Split out from
    ``read_huggingface`` so the conversion is testable without the
    ``datasets`` package."""
    import pandas as pd

    frames = []
    base = id_offset
    for pdf in batches:
        out = pd.DataFrame({
            "id": np.arange(base, base + len(pdf), dtype=np.int64),
            "vec": [
                [float(x) for x in v] if v is not None else None
                for v in pdf[vec_col]
            ],
        })
        if text_col is not None:
            out["text"] = pdf[text_col].astype(str)
        frames.append(out)
        base += len(pdf)
    schema = "id bigint, vec array<float>" + (", text string" if text_col else "")
    if not frames:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(pd.concat(frames, ignore_index=True), schema=schema)


def read_huggingface(
    spark: SparkSession,
    name: str,
    *,
    split: str = "train",
    vec_col: str = "emb",
    text_col: str | None = None,
    batch_size: int = 10_000,
) -> DataFrame:
    """HuggingFace ``load_dataset`` ingest (S4, datasets.py:761-807).  The
    ``datasets`` package is not part of this engine's pinned environment, so
    the download step is import-gated; the batch→DataFrame conversion is
    ``hf_batches_to_df`` (real and tested).  At scale, prefer exporting the
    HF dataset to parquet once and using ``spark.read.parquet`` — this path
    streams through the driver, which is exactly what the reference does."""
    try:
        import datasets  # type: ignore
    except ImportError as e:  # pragma: no cover - env without `datasets`
        raise NotImplementedError(
            "read_huggingface requires the `datasets` package; export the "
            "dataset to parquet and use spark.read.parquet instead"
        ) from e
    ds = datasets.load_dataset(name, split=split)  # pragma: no cover
    return hf_batches_to_df(  # pragma: no cover
        spark, ds.to_pandas(batch_size=batch_size, batched=True),
        vec_col=vec_col, text_col=text_col,
    )


def write_results(df: DataFrame, path: str, *, dataset: str, count: int, algo: str) -> None:
    """Result sink (S5/S7, results.py:47-86, 161-187): parquet partitioned
    ``dataset=/count=/algo=`` so the metrics layer scans the result tree with
    partition pruning instead of a directory walk."""
    (
        df.withColumn("dataset", F.lit(dataset))
        .withColumn("count", F.lit(count))
        .withColumn("algo", F.lit(algo))
        .write.mode("append")
        .partitionBy("dataset", "count", "algo")
        .parquet(path)
    )


def load_all_results(spark: SparkSession, path: str, **filters) -> DataFrame:
    """Result-tree scan (results.py:161-187): partition filters push down."""
    df = spark.read.parquet(path)
    for k, v in filters.items():
        df = df.filter(F.col(k) == v)
    return df
