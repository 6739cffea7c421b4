"""Multimodal (image/audio/video) column operators — BASELINE.json extension
surface ("treat image/audio/video as opaque binary columns with typed
metadata").

The reference's multimodal workloads (mm-ann, SURVEY §2.2 Q8; README.md
197-217) ship *pre-embedded* vectors; the pipeline that produces them
(decode → feature-extract) is what a training-data platform needs at 100 TB.
This module provides that pipeline shape, Spark-first:

- canonical schema: ``(media_id BIGINT, kind STRING, content BINARY,
  meta STRUCT<mime STRING, width INT, height INT, sample_rate INT,
  n_frames INT, duration_s FLOAT>)`` — content stays opaque bytes; metadata
  is queryable/prunable without touching payloads.
- every payload-touching operator is an Arrow-batched ``mapInPandas`` so
  bytes move once per batch, not once per row;
- **the codec itself is STUBBED**: this container has no image/audio
  libraries, so decode falls back to a deterministic byte-derived fake
  (clearly marked, seeded by content hash — stable across runs/executors).
  The Spark-side contract — schemas, batch iteration, partitioning,
  metadata propagation — is real and tested; swapping the fake for
  PIL/ffmpeg is a pure function replacement inside the UDF.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, "
    "meta struct<mime:string, width:int, height:int, sample_rate:int, "
    "n_frames:int, duration_s:float>"
)

try:  # real decoder, if ever available in the environment
    import PIL.Image  # noqa: F401

    HAS_PIL = True
except Exception:  # pragma: no cover - container has no PIL
    HAS_PIL = False


def _fake_decode(content: bytes, out_elems: int) -> np.ndarray:
    """STUB codec: deterministic float32 values derived from the payload
    bytes (crc32-seeded), standing in for decoded pixels/samples.  Stable
    across processes — the whole pipeline is reproducible even though no
    real codec runs."""
    seed = zlib.crc32(content) & 0xFFFFFFFF
    rng = np.random.RandomState(seed)
    return rng.rand(out_elems).astype(np.float32)


def decode_image(df: DataFrame, *, max_pixels: int = 64 * 64) -> DataFrame:
    """Decode image payloads → (media_id, height, width, pixels ARRAY<FLOAT>).

    Output size is bounded by meta (never by payload size), so executor
    memory per batch is predictable: height*width capped at ``max_pixels``.
    Real decode would use PIL here (``HAS_PIL``); the stub keeps the exact
    same batch shape."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out_ids, out_h, out_w, out_px = [], [], [], []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                h = min(int(meta["height"] or 8), 256)
                w = min(int(meta["width"] or 8), 256)
                while h * w > max_pixels:
                    h, w = max(h // 2, 1), max(w // 2, 1)
                px = _fake_decode(bytes(row["content"]), h * w)
                out_ids.append(row["media_id"]); out_h.append(h); out_w.append(w)
                out_px.append(px.tolist())
            yield pd.DataFrame({"media_id": out_ids, "height": out_h,
                                "width": out_w, "pixels": out_px})

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "content", "meta")
        .mapInPandas(_decode, schema="media_id bigint, height int, width int, pixels array<float>")
    )


def extract_features(df: DataFrame, *, dim: int = 64) -> DataFrame:
    """Feature extraction → (media_id, embedding ARRAY<FLOAT>): the batch
    embedding-generation stage (BASELINE.json: 'MLlib for batch embedding
    generation').  The model forward pass is the stub; at scale this UDF is
    where an ONNX/torch batch-infer call goes, one model per executor,
    Arrow batches in."""

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            embs = [_fake_decode(bytes(c), dim).tolist() for c in pdf["content"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": embs})

    return df.select("media_id", "content").mapInPandas(
        _embed, schema="media_id bigint, embedding array<float>"
    )


def resize_meta(df: DataFrame, *, max_side: int = 256) -> DataFrame:
    """Resize planning: pure-metadata operator computing target dimensions
    (aspect-preserving, longest side ≤ max_side) WITHOUT touching payloads —
    runs as a narrow column expression over the whole corpus; the actual
    pixel resample belongs in decode_image's UDF."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(1.0), F.lit(max_side) / F.greatest(w, h).cast("double"))
    return df.withColumn("target_width", F.ceil(w * scale).cast("int")).withColumn(
        "target_height", F.ceil(h * scale).cast("int")
    )


def sample_frames(df: DataFrame, *, every_n: int = 10) -> DataFrame:
    """Video frame sampling plan: explode frame indices 0, n, 2n, … from
    meta.n_frames — pure Spark (no payload IO) producing the work-list the
    frame decoder consumes.  Output: (media_id, frame_idx)."""
    idx = F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                     F.lit(every_n))
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(idx).alias("frame_idx"))
    )


def synthetic_media(spark: SparkSession, n: int = 100, *, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for tests/fixtures: payload bytes are
    sha256-derived from (seed, media_id); metadata cycles through the three
    kinds."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        content = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
        meta = {
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            "width": 64 + (i % 4) * 32 if kind != "audio" else None,
            "height": 48 + (i % 3) * 16 if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 30 * (1 + i % 5) if kind == "video" else None,
            "duration_s": float(i % 10) if kind != "image" else None,
        }
        rows.append((i, kind, bytearray(content), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
