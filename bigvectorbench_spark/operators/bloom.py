"""Bloom-filter membership for contamination checks at eval-inventory
sizes where neither the broadcast semi-join table (8+ bytes/hash plus join
hashmap) nor the sorted-array kernel (8 bytes/hash) fits comfortably.

A Bloom filter at 1% false-positive rate costs ~1.2 bytes per item
(m = -n·ln p/ln²2 bits, k = m/n·ln 2 hashes) — a 1B-window eval inventory
becomes a ~1.4 GB broadcast instead of a >8 GB one, and the probe side
stays a map-only scan.  The price is one-sided error: **no false
negatives ever** (every true overlap is flagged — the property the
declared gate asserts), a bounded rate of false positives (extra rows
flagged; harmless for decontamination, which over-removes by design).

Engineering shape:

- **Positions are computed JVM-side** (xxhash64 double hashing inside
  whole-stage codegen) on BOTH build and probe, so Python never needs to
  reproduce the hash function.
- **Build** is a per-partition Arrow kernel: each partition folds its
  position stream into a local m-bit bitmap; the driver ORs the ≤
  #partitions bitmaps (bounded: partitions × m/8 bytes, independent of n).
- **Probe** broadcasts the bitmap once and tests bits in a vectorized
  Arrow kernel over position arrays — no shuffle, no join, one boolean
  per row out.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(n_items: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) for ``n_items`` at ``fp_rate``.  m rounds UP to a power
    of two: double hashing cycles through gcd(h2, m) positions, so a
    composite m with an unlucky h2 collapses k probes onto a handful of
    bits (measured: a m=88 filter false-positived at ~3e-3 instead of
    1e-6).  Power-of-two m plus an odd h2 (bloom_positions) guarantees the
    full period.  k follows the ACTUAL m, capped at 16."""
    if not 0 < fp_rate < 1:
        raise ValueError(f"fp_rate must be in (0,1), got {fp_rate}")
    n = max(1, n_items)
    m = -n * math.log(fp_rate) / (math.log(2) ** 2)
    m_bits = 1 << max(6, math.ceil(math.log2(m)))
    k = max(1, round(m_bits / n * math.log(2)))
    return m_bits, min(k, 16)


def bloom_positions(col: Column, m_bits: int, k: int) -> Column:
    """The k bit positions of a value: double hashing
    pos_i = (h1 + i·h2) mod m with h1 = xxhash64(v), h2 = xxhash64(v, 1) —
    all in codegen; Kirsch-Mitzenmacher shows double hashing preserves the
    Bloom fp bound.  h2 is forced ODD: with the power-of-two m from
    bloom_params, gcd(h2, m) = 1 then guarantees the k probes hit k
    distinct positions (an even h2 on composite m collapses the period —
    see bloom_params).  Arithmetic stays in pre-reduced residues so
    ANSI-mode int64 overflow is impossible (i·(h2 mod m) ≤ 16·m ≪ 2⁶³)."""
    h1 = F.pmod(F.xxhash64(col), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(col, F.lit(1)), F.lit(m_bits)).bitwiseOR(F.lit(1))
    return F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)])


def bloom_build(df: DataFrame, col: str, *, m_bits: int, k: int) -> bytes:
    """Fold ``df[col]`` (any hashable type) into an m-bit Bloom bitmap.

    One narrow job: positions explode JVM-side, each partition's Arrow
    kernel ORs them into a local bitmap, the driver ORs the per-partition
    bitmaps.  Driver memory = partitions × m/8 bytes — the fixed-size
    index-build collect envelope (IVF/PQ convention), NOT O(rows)."""
    import pyarrow as pa

    if m_bits % 8:
        raise ValueError(f"m_bits must be a byte multiple, got {m_bits}")
    n_bytes = m_bits // 8
    pos = df.select(
        F.explode(bloom_positions(F.col(col), m_bits, k)).alias("pos"))

    def fold(batches):
        bm = np.zeros(n_bytes, dtype=np.uint8)
        for batch in batches:
            p = batch.column(0).to_numpy(zero_copy_only=False)
            # bitwise_or.at handles duplicate byte indices in one pass
            np.bitwise_or.at(bm, p >> 3, (1 << (p & 7)).astype(np.uint8))
        yield pa.RecordBatch.from_arrays([pa.array([bm.tobytes()])], ["bm"])

    parts = pos.mapInArrow(fold, schema="bm binary").collect()
    out = np.zeros(n_bytes, dtype=np.uint8)
    for r in parts:
        out |= np.frombuffer(r["bm"], dtype=np.uint8)
    return out.tobytes()


def bloom_probe(df: DataFrame, col: str, bloom: bytes, *, k: int,
                out_col: str = "maybe_member") -> DataFrame:
    """Append a boolean column: True iff every one of the value's k bits is
    set (definitely-not-present ⇒ False; no false negatives)."""
    import pandas as pd
    import pyarrow as pa

    m_bits = len(bloom) * 8
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bloom)
    k_ = k

    with_pos = df.withColumn("__pos", bloom_positions(F.col(col), m_bits, k_))
    in_cols = with_pos.columns

    def probe(batches):
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        for batch in batches:
            pdf = batch.to_pandas()
            pos = np.array([p for row in pdf["__pos"] for p in row],
                           dtype=np.int64).reshape(-1, k_) if len(pdf) else \
                np.zeros((0, k_), dtype=np.int64)
            hit = ((bm[pos >> 3] >> (pos & 7)) & 1).all(axis=1)
            pdf = pdf.drop(columns=["__pos"])
            pdf[out_col] = pd.Series(hit, index=pdf.index, dtype=bool)
            yield pa.RecordBatch.from_pandas(pdf, preserve_index=False)

    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}"
         for f in with_pos.schema if f.name != "__pos"] + [f"{out_col} boolean"])
    return with_pos.mapInArrow(probe, schema=out_schema)


def bloom_probe_any(df: DataFrame, arr_col: str, bloom: bytes, *, k: int,
                    out_col: str = "any_member") -> DataFrame:
    """Append a boolean column: True iff ANY element of the array column
    probes positive — the per-document contamination shape, with NO explode
    and NO shuffle (positions flatten JVM-side; the kernel segments the
    flat hit stream back into rows).  An empty array probes False."""
    import pandas as pd
    import pyarrow as pa

    m_bits = len(bloom) * 8
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bloom)
    k_ = k

    with_pos = df.withColumn(
        "__pos",
        F.flatten(F.transform(
            F.col(arr_col), lambda v: bloom_positions(v, m_bits, k_))))
    in_cols = [f for f in with_pos.schema if f.name != "__pos"]

    def probe(batches):
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        for batch in batches:
            pdf = batch.to_pandas()
            lens = np.array([len(p) for p in pdf["__pos"]], dtype=np.int64) // k_
            flat = (np.fromiter(
                (x for row in pdf["__pos"] for x in row), dtype=np.int64)
                if lens.sum() else np.zeros(0, dtype=np.int64))
            hit_w = ((bm[flat >> 3] >> (flat & 7)) & 1).reshape(-1, k_).all(axis=1)
            any_row = np.zeros(len(pdf), dtype=bool)
            nz = lens > 0
            if nz.any():
                ends = np.cumsum(lens)
                starts = ends - lens
                any_row[nz] = np.maximum.reduceat(
                    hit_w.astype(np.int8), starts[nz]).astype(bool)
            pdf = pdf.drop(columns=["__pos"])
            pdf[out_col] = pd.Series(any_row, index=pdf.index, dtype=bool)
            yield pa.RecordBatch.from_pandas(pdf, preserve_index=False)

    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in in_cols]
        + [f"{out_col} boolean"])
    return with_pos.mapInArrow(probe, schema=out_schema)
