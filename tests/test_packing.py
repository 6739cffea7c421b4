"""Sequence packing (operators/packing.py): distributed two-pass prefix sum
vs a single-pass Python oracle, bucket-count invariance, block accounting."""

import pytest
from pyspark.sql import functions as F

from bigvectorbench_spark.operators import packing as pk


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _oracle(texts, block_size):
    """Global-order packing computed sequentially."""
    out, off = [], 0
    for i, t in enumerate(texts):
        n = len([w for w in t.split() if w])
        start, end = off, off + n
        first = start // block_size
        nb = (end - 1) // block_size - first + 1 if n > 0 else 0
        out.append((i, n, start, end, first, nb))
        off = end
    return out


TEXTS = [
    "alpha beta gamma delta",           # 4 tokens
    "",                                  # empty doc: n=0, zero blocks
    "one two three four five six seven", # 7
    "x " * 9,                            # 9 — crosses the 8-token boundary
    "tail",                              # 1
    "a b c d e f g h i j k l",           # 12 — spans two full boundaries
]


def test_pack_blocks_matches_sequential_oracle(spark):
    got = sorted(
        tuple(r) for r in pk.pack_blocks(
            _docs(spark, TEXTS), block_size=8, n_buckets=3).collect())
    assert got == sorted(_oracle(TEXTS, 8))


@pytest.mark.parametrize("n_buckets", [1, 2, 7, 1024])
def test_bucketing_never_changes_output(spark, n_buckets):
    """The two-pass prefix sum must equal the global window for ANY bucket
    count — bucketing is a parallelism choice, not a semantic one."""
    got = sorted(
        tuple(r) for r in pk.pack_blocks(
            _docs(spark, TEXTS), block_size=8, n_buckets=n_buckets).collect())
    assert got == sorted(_oracle(TEXTS, 8))


def test_max_id_hint_skips_scan_and_agrees(spark):
    df = _docs(spark, TEXTS)
    base = sorted(tuple(r) for r in pk.pack_blocks(df, block_size=8).collect())
    # Any upper bound on max id is valid (metadata need not be tight).
    hinted = sorted(tuple(r) for r in pk.pack_blocks(
        df, block_size=8, max_id=10_000).collect())
    assert hinted == base


def test_block_manifest_accounts_every_token(spark):
    packed = pk.pack_blocks(_docs(spark, TEXTS), block_size=8)
    man = {r["block_id"]: (r["n_docs"], r["n_tokens"])
           for r in pk.block_manifest(packed, block_size=8).collect()}
    total = sum(len(t.split()) for t in TEXTS)
    # Every non-final block is exactly full; the final block holds the rest.
    n_blocks = (total + 7) // 8
    assert set(man) == set(range(n_blocks))
    assert sum(v[1] for v in man.values()) == total
    for b in range(n_blocks - 1):
        assert man[b][1] == 8
    assert man[n_blocks - 1][1] == total - 8 * (n_blocks - 1)
    # Oracle doc membership of block 0: docs 0,2,3 cover offsets [0,8).
    assert man[0][0] == 2  # doc0 [0,4), doc2 [4,11) — doc1 is empty


def test_empty_and_single_doc(spark):
    assert pk.pack_blocks(_docs(spark, []), block_size=8).count() == 0
    got = pk.pack_blocks(_docs(spark, ["a b"]), block_size=8).collect()
    assert [tuple(r) for r in got] == [(0, 2, 0, 2, 0, 1)]


def test_invalid_block_size(spark):
    with pytest.raises(ValueError):
        pk.pack_blocks(_docs(spark, ["a"]), block_size=0)
