"""Property-based tests (hypothesis) for the distance kernels and the
reference's dataset-invariant check (test/distance_test.py:46-55 analog):
stored ground-truth distances must equal recomputed ones."""

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from bigvectorbench_spark.functions import distance as dx
from bigvectorbench_spark import fixtures as fx
from bigvectorbench_spark.operators.groundtruth import build_groundtruth, verify_distances

from pyspark.sql import functions as F

finite_floats = st.floats(min_value=-100, max_value=100, allow_nan=False, width=32)
vec_pairs = st.integers(min_value=1, max_value=8).flatmap(
    lambda d: st.tuples(
        st.lists(finite_floats, min_size=d, max_size=d),
        st.lists(finite_floats, min_size=d, max_size=d),
    )
)

_SETTINGS = dict(max_examples=12, deadline=None)


def _pair_eval(spark, col, a, b):
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    return df.select(col(F.col("a"), F.col("b")).alias("v")).collect()[0]["v"]


@given(vec_pairs)
@settings(**_SETTINGS)
def test_euclid_symmetric_nonneg_identity(spark, pair):
    a, b = pair
    d_ab = _pair_eval(spark, dx.l2_dist, a, b)
    d_ba = _pair_eval(spark, dx.l2_dist, b, a)
    assert d_ab == pytest.approx(d_ba, abs=1e-9)
    assert d_ab >= 0
    assert _pair_eval(spark, dx.l2_dist, a, a) == 0.0
    # against numpy
    ref = math.sqrt(sum((float(np.float32(x)) - float(np.float32(y))) ** 2
                        for x, y in zip(a, b)))
    assert d_ab == pytest.approx(ref, rel=1e-9, abs=1e-9)


@given(vec_pairs)
@settings(**_SETTINGS)
def test_angular_range(spark, pair):
    a, b = pair
    if all(x == 0 for x in a) or all(x == 0 for x in b):
        return  # zero vectors: angular undefined (reference never emits them)
    d = _pair_eval(spark, dx.angular_dist, a, b)
    assert -1e-9 <= d <= 2 + 1e-9


@given(st.lists(st.booleans(), min_size=1, max_size=130),
       st.data())
@settings(**_SETTINGS)
def test_hamming_packed_equals_plain(spark, bits_a, data):
    bits_b = data.draw(st.lists(st.booleans(), min_size=len(bits_a), max_size=len(bits_a)))
    df = spark.createDataFrame([(bits_a, bits_b)], "a array<boolean>, b array<boolean>")
    row = df.select(
        dx.hamming_dist(F.col("a"), F.col("b")).alias("plain"),
        dx.hamming_packed_dist(
            dx.pack_bits(F.col("a")), dx.pack_bits(F.col("b")), len(bits_a)
        ).alias("packed"),
    ).collect()[0]
    assert row["plain"] == pytest.approx(row["packed"], abs=1e-12)


@given(st.lists(st.integers(0, 30), max_size=12), st.lists(st.integers(0, 30), max_size=12))
@settings(**_SETTINGS)
def test_jaccard_bounds_and_symmetry(spark, a, b):
    df = spark.createDataFrame([(a, b)], "a array<int>, b array<int>")
    row = df.select(
        dx.jaccard_dist(F.col("a"), F.col("b")).alias("ab"),
        dx.jaccard_dist(F.col("b"), F.col("a")).alias("ba"),
    ).collect()[0]
    assert 0 <= row["ab"] <= 1 and row["ab"] == pytest.approx(row["ba"])
    if not a and not b:
        assert row["ab"] == 1.0  # empty-set convention (distance.py:12-16)


def test_fixture_groundtruth_self_consistency(spark):
    """The reference's golden-output invariant: for a fixture dataset,
    recomputing dist(test_i, train_j) for every stored (neighbor, distance)
    pair matches to 1e-4 (test/distance_test.py:46-55)."""
    train, test = fx.random_float(spark, n=800, d=16)
    gt = build_groundtruth(train, test.limit(40), k=20, method="gemm")
    mismatches = verify_distances(gt, train, test.limit(40), tol=1e-4)
    assert mismatches.count() == 0


# ----------------------------------------------------- media codec roundtrips
# Pure-Python property checks (no Spark session): any payload the encoders
# can produce, the decoders must recover exactly — arbitrary dims including
# the odd-width/stride/padding corners.

from bigvectorbench_spark.operators import multimodal as mm


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
@settings(**_SETTINGS)
def test_png_roundtrip_property(h, w, seed):
    gray = np.random.RandomState(seed).randint(0, 256, (h, w)).astype(np.uint8)
    out = mm.png_decode(mm.png_encode(gray))
    np.testing.assert_array_equal((out * 255.0).round().astype(np.uint8), gray)


@given(st.integers(1, 5000), st.sampled_from([8000, 16000, 44100]),
       st.integers(0, 2**32 - 1))
@settings(**_SETTINGS)
def test_wav_roundtrip_property(n, sr, seed):
    s = np.random.RandomState(seed).randint(-32768, 32768, n).astype(np.int16)
    out, sr2 = mm.wav_decode(mm.wav_encode(s, sr))
    assert sr2 == sr
    np.testing.assert_array_equal((out * 32768.0).astype(np.int16), s)


@given(st.integers(1, 6), st.integers(1, 20), st.integers(1, 20),
       st.integers(0, 2**32 - 1))
@settings(**_SETTINGS)
def test_avi_roundtrip_property(n, h, w, seed):
    fr = np.random.RandomState(seed).randint(0, 256, (n, h, w)).astype(np.uint8)
    bgr, fps = mm.avi_decode(mm.avi_encode(fr, fps=10))
    assert fps == 10.0 and bgr.shape == (n, h, w, 3)
    for c in range(3):
        np.testing.assert_array_equal(bgr[..., c], fr)


@given(st.binary(max_size=6000))
@settings(max_examples=60, deadline=None)
def test_lzf_roundtrip_property(payload):
    """Pure-Python liblzf codec: decompress(compress(x)) == x for arbitrary
    byte strings (covers literal-only, match-heavy, and overlap cases the
    generators happen to produce)."""
    from bigvectorbench_spark.sources.lzf import lzf_compress, lzf_decompress

    assert lzf_decompress(lzf_compress(payload)) == payload


@given(st.integers(min_value=1, max_value=64),
       st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=8, deadline=None)
def test_shard_assign_partition_property(spark, n_shards, seed):
    """For ANY shard count and seed: every doc gets exactly one shard in
    [0, n_shards), and the assignment is a function of (seed, id) only —
    independent of row order and partitioning."""
    from bigvectorbench_spark.operators.packing import shard_assign

    ids = list(range(40))
    fwd = spark.createDataFrame([(i, "t") for i in ids],
                                "doc_id long, text string")
    rev = spark.createDataFrame([(i, "t") for i in reversed(ids)],
                                "doc_id long, text string").repartition(7)
    a = {r["doc_id"]: r["shard"]
         for r in shard_assign(fwd, n_shards=n_shards, seed=seed).collect()}
    b = {r["doc_id"]: r["shard"]
         for r in shard_assign(rev, n_shards=n_shards, seed=seed).collect()}
    assert a == b
    assert set(a) == set(ids)
    assert all(0 <= s < n_shards for s in a.values())


@given(st.integers(min_value=0, max_value=3_500_000),
       st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=8, deadline=None)
def test_epoch_oversample_copy_count_property(spark, ppm, _seed):
    """For ANY epochs factor (including < 1 epoch): every document emits
    exactly floor(e) or ceil(e) copies, the emitted total equals the
    per-doc integer arithmetic, and copy_ids are dense from 0."""
    from pyspark.sql import functions as F
    from bigvectorbench_spark.operators.curation import epoch_oversample

    df = spark.createDataFrame([(i, "s") for i in range(30)],
                               "doc_id long, source string")
    got = {}
    for r in epoch_oversample(df, epochs_ppm=F.lit(ppm)).collect():
        got.setdefault(r["doc_id"], []).append(r["copy_id"])
    full, frac = ppm // 1_000_000, ppm % 1_000_000
    for i in range(30):
        h = ((i * 2654435761) % 4294967296) % 1_000_000
        want = full + (1 if h < frac else 0)
        assert sorted(got.get(i, [])) == list(range(want))
