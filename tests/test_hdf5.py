"""HDF5 on-ramp: writer → reader round trip on the ann-benchmarks layout
(reference datasets.py:64-168), plus byte-level pins on the writer so the
reader and writer cannot drift into a private dialect of the format."""

import numpy as np
import pytest

from bigvectorbench_spark.sources.hdf5 import (
    UNDEF,
    hdf5_meta,
    read_ann_benchmarks,
    read_hdf5,
    write_hdf5,
)


@pytest.fixture(scope="module")
def ann_file(tmp_path_factory):
    """A miniature ann-benchmarks dataset: train/test float32, neighbors
    int32, distances float32, root attrs like the reference's files."""
    rng = np.random.RandomState(7)
    train = rng.randn(50, 8).astype(np.float32)
    test = rng.randn(10, 8).astype(np.float32)
    neighbors = rng.randint(0, 50, size=(10, 5)).astype(np.int32)
    distances = np.sort(rng.rand(10, 5).astype(np.float32), axis=1)
    path = str(tmp_path_factory.mktemp("hdf5") / "mini.hdf5")
    write_hdf5(
        path,
        {"train": train, "test": test,
         "neighbors": neighbors, "distances": distances},
        attrs={"distance": "angular", "dimension": 8, "point_type": "float"},
    )
    return path, train, test, neighbors, distances


def test_signature_and_superblock_bytes(ann_file):
    """Byte-level pins straight from the published spec: if the writer
    drifted, a real h5py would reject the file even if our reader didn't."""
    path = ann_file[0]
    buf = open(path, "rb").read()
    assert buf[:8] == b"\x89HDF\r\n\x1a\n"
    assert buf[8] == 0            # superblock version 0
    assert buf[13] == 8 and buf[14] == 8   # offset/length sizes
    eof = int.from_bytes(buf[40:48], "little")
    assert eof == len(buf)        # EOF address == file size
    assert int.from_bytes(buf[48:56], "little") == UNDEF  # driver info
    # the file contains exactly one HEAP / TREE / SNOD and four datasets
    assert buf.count(b"TREE") == 1 and buf.count(b"SNOD") == 1
    assert buf.count(b"HEAP") == 1


def test_metadata_parse(ann_file):
    path, train, test, neighbors, distances = ann_file
    meta = hdf5_meta(path)
    assert sorted(meta.datasets) == ["distances", "neighbors", "test", "train"]
    t = meta.datasets["train"]
    assert t.shape == (50, 8) and t.dtype == np.dtype("<f4")
    assert t.layout == "contiguous"
    n = meta.datasets["neighbors"]
    assert n.shape == (10, 5) and n.dtype == np.dtype("<i4")
    assert meta.attrs == {"distance": "angular", "dimension": 8,
                          "point_type": "float"}


def test_raw_bytes_round_trip(ann_file):
    """The data address in the parsed layout message points at the exact
    row-major bytes — the contract the distributed byte-range reader
    relies on."""
    path, train, *_ = ann_file
    meta = hdf5_meta(path)
    t = meta.datasets["train"]
    buf = open(path, "rb").read()
    raw = buf[t.data_addr:t.data_addr + t.data_size]
    assert raw == train.tobytes()


def test_read_hdf5_dataframe(spark, ann_file):
    path, train, test, neighbors, distances = ann_file
    df = read_hdf5(spark, path, "train")
    assert df.columns == ["id", "vec"]
    assert dict(df.dtypes)["vec"] == "array<float>"
    rows = {r["id"]: r["vec"] for r in df.collect()}
    assert len(rows) == 50
    np.testing.assert_allclose(rows[0], train[0], rtol=1e-6)
    np.testing.assert_allclose(rows[49], train[49], rtol=1e-6)

    nb = read_hdf5(spark, path, "neighbors", id_col="qid", vec_col="nn")
    got = {r["qid"]: r["nn"] for r in nb.collect()}
    assert got[3] == neighbors[3].tolist()


def test_read_hdf5_split_boundaries(spark, ann_file):
    """Every split count yields the same frame (byte-range math has no
    off-by-one at row boundaries)."""
    path, train, *_ = ann_file
    want = train.tolist()
    for n_splits in (1, 3, 7, 50):
        df = read_hdf5(spark, path, "train", n_splits=n_splits)
        rows = [r["vec"] for r in df.orderBy("id").collect()]
        np.testing.assert_allclose(rows, want, rtol=1e-6)


def test_read_ann_benchmarks_bundle(spark, ann_file):
    path, train, test, neighbors, distances = ann_file
    bundle = read_ann_benchmarks(spark, path)
    assert bundle["attrs"]["distance"] == "angular"
    assert bundle["train"].count() == 50
    assert bundle["test"].count() == 10
    gt = bundle["groundtruth"].collect()
    assert [r["qid"] for r in gt] == list(range(10))
    assert gt[2]["neighbors"] == neighbors[2].tolist()
    np.testing.assert_allclose(gt[2]["distances"], distances[2], rtol=1e-6)


def test_one_dimensional_and_int64(spark, tmp_path):
    path = str(tmp_path / "one.hdf5")
    times = np.arange(20, dtype=np.int64) * 3
    write_hdf5(path, {"times": times})
    df = read_hdf5(spark, path, "times", vec_col="t")
    assert dict(df.dtypes)["t"] == "bigint"
    assert [r["t"] for r in df.orderBy("id").collect()] == times.tolist()


def test_float64_and_empty(spark, tmp_path):
    path = str(tmp_path / "f8.hdf5")
    x = np.linspace(0, 1, 12).reshape(4, 3)
    write_hdf5(path, {"x": x})
    df = read_hdf5(spark, path, "x")
    assert dict(df.dtypes)["vec"] == "array<double>"
    rows = [r["vec"] for r in df.orderBy("id").collect()]
    np.testing.assert_allclose(rows, x)


def test_missing_dataset_raises(spark, ann_file):
    with pytest.raises(KeyError):
        read_hdf5(spark, ann_file[0], "nope")


def test_bad_signature_raises(tmp_path):
    p = tmp_path / "bad.hdf5"
    p.write_bytes(b"not an hdf5 file at all")
    with pytest.raises(ValueError, match="signature"):
        hdf5_meta(str(p))


def test_format_parity(spark, ann_file):
    """The contiguous and chunked readers must agree byte-for-byte on the
    same logical data — two independent decode paths over two independent
    on-disk encodings.  When h5py is importable the same file is also
    cross-checked against the canonical implementation (extra assertions,
    not a skip)."""
    path, train, *_ = ann_file
    import tempfile, os as _os

    cpath = _os.path.join(tempfile.mkdtemp(), "parity.hdf5")
    write_hdf5(cpath, {"train": train}, {"distance": "angular"},
               chunks={"train": (16, 8)}, compression="gzip")
    a = np.array([r["vec"] for r in
                  read_hdf5(spark, path, "train").orderBy("id").collect()],
                 dtype=np.float32)
    b = np.array([r["vec"] for r in
                  read_hdf5(spark, cpath, "train").orderBy("id").collect()],
                 dtype=np.float32)
    np.testing.assert_array_equal(a, train)
    np.testing.assert_array_equal(b, train)
    try:
        import h5py  # canonical cross-check when the env has it
    except ImportError:
        return
    for p in (path, cpath):  # pragma: no cover - env without h5py
        with h5py.File(p, "r") as f:
            np.testing.assert_array_equal(np.asarray(f["train"]), train)
            assert f.attrs["distance"] == "angular"


# ------------------------------------------------------- chunked/compressed


def test_chunked_gzip_roundtrip(spark, tmp_path):
    """Chunked + deflate, full-row-width chunks (the h5py tall-matrix
    default): pure-Python B-tree walk + per-chunk inflate, no h5py."""
    rng = np.random.RandomState(3)
    x = rng.randn(57, 6).astype(np.float32)  # 57/16 → ragged edge chunk
    path = str(tmp_path / "cg.hdf5")
    write_hdf5(path, {"x": x}, chunks={"x": (16, 6)}, compression="gzip")
    meta = hdf5_meta(path)
    ds = meta.datasets["x"]
    assert ds.layout == "chunked" and ds.chunk_dims == (16, 6)
    assert ds.filters == [(1, (6,))]
    got = np.array([r["vec"] for r in
                    read_hdf5(spark, path, "x").orderBy("id").collect()],
                   dtype=np.float32)
    np.testing.assert_array_equal(got, x)


def test_chunked_shuffle_rowsplit_multilevel(spark, tmp_path):
    """The hard corners at once: shuffle+deflate pipeline, chunks that
    SPLIT rows column-wise (row assembly via one keyed shuffle), and >16
    chunks so the B-tree goes multi-level (internal-node walk)."""
    rng = np.random.RandomState(4)
    x = rng.randn(200, 20)  # float64; (13, 6) grid → 16×4 = 64 chunks
    path = str(tmp_path / "cs.hdf5")
    write_hdf5(path, {"x": x}, chunks={"x": (13, 6)},
               compression="gzip+shuffle")
    ds = hdf5_meta(path).datasets["x"]
    assert ds.filters == [(2, (8,)), (1, (6,))]  # shuffle then deflate
    df = read_hdf5(spark, path, "x")
    assert dict(df.dtypes)["vec"] == "array<double>"
    got = np.array([r["vec"] for r in df.orderBy("id").collect()])
    np.testing.assert_array_equal(got, x)


def test_chunked_1d(spark, tmp_path):
    times = (np.arange(43, dtype=np.int64) * 7) % 100
    path = str(tmp_path / "c1.hdf5")
    write_hdf5(path, {"t": times}, chunks={"t": (8,)}, compression="gzip")
    df = read_hdf5(spark, path, "t", vec_col="t")
    assert dict(df.dtypes)["t"] == "bigint"
    assert [r["t"] for r in df.orderBy("id").collect()] == times.tolist()


def test_chunked_uncompressed(spark, tmp_path):
    """Chunked layout with no filter pipeline at all."""
    x = np.arange(24, dtype=np.int32).reshape(6, 4)
    path = str(tmp_path / "cu.hdf5")
    write_hdf5(path, {"x": x}, chunks={"x": (4, 4)})
    ds = hdf5_meta(path).datasets["x"]
    assert ds.layout == "chunked" and ds.filters == []
    got = np.array([r["vec"] for r in
                    read_hdf5(spark, path, "x").orderBy("id").collect()])
    np.testing.assert_array_equal(got, x)


def test_defilter_fletcher32():
    """fletcher32 stores data + 4-byte checksum; the inverse strips it."""
    from bigvectorbench_spark.sources.hdf5 import _defilter
    import zlib as z

    payload = np.arange(32, dtype=np.int16).tobytes()
    stored = z.compress(payload + b"\x01\x02\x03\x04")
    # write order: fletcher32 then deflate → inverse inflates then strips
    assert _defilter(stored, [(3, ()), (1, (6,))]) == payload


def test_lzf_codec_roundtrip_and_handcrafted():
    """Pure-Python liblzf codec (sources/lzf.py): roundtrip on repetitive,
    random, empty, and tiny inputs, plus a hand-assembled stream pinning
    the control-byte format (literal run + overlapping back-reference)."""
    from bigvectorbench_spark.sources.lzf import lzf_compress, lzf_decompress

    rng = np.random.RandomState(7)
    cases = [
        b"",
        b"a",
        b"ab",
        b"abc" * 200,                      # highly compressible
        bytes(rng.randint(0, 256, 4096, dtype=np.uint8)),  # incompressible
        np.arange(1000, dtype=np.int32).tobytes(),
        b"\x00" * 10000,                   # long RLE (overlapping copies)
    ]
    for payload in cases:
        assert lzf_decompress(lzf_compress(payload)) == payload
    # compressible input actually compresses
    assert len(lzf_compress(b"abc" * 200)) < 100
    # hand-assembled: literal "AB", then backref len 4 off 1 (overlap on 'B')
    # ctrl=0x01 run of 2; ctrl=(2<<5)|0x00 len=4, off byte 0 -> ref=-1 back 1
    stream = bytes([0x01, ord("A"), ord("B"), (2 << 5) | 0x00, 0x00])
    assert lzf_decompress(stream) == b"ABBBBB"
    with pytest.raises(ValueError):
        lzf_decompress(bytes([0x05, ord("x")]))  # truncated literal run


def test_chunked_lzf_roundtrip(spark, tmp_path):
    """Chunked + lzf (filter id 32000, the h5py builtin third-party
    filter) read pure-Python end to end — including the named-filter
    pipeline message (ids >= 256 carry their name) and lzf+shuffle."""
    rng = np.random.RandomState(11)
    x = rng.randn(57, 6).astype(np.float32)
    path = str(tmp_path / "clzf.hdf5")
    write_hdf5(path, {"x": x}, chunks={"x": (16, 6)}, compression="lzf")
    ds = hdf5_meta(path).datasets["x"]
    assert ds.layout == "chunked" and ds.filters == [(32000, ())]
    got = np.array([r["vec"] for r in
                    read_hdf5(spark, path, "x").orderBy("id").collect()],
                   dtype=np.float32)
    np.testing.assert_array_equal(got, x)

    y = rng.randn(40, 8)
    path2 = str(tmp_path / "clzfs.hdf5")
    write_hdf5(path2, {"y": y}, chunks={"y": (13, 8)},
               compression="lzf+shuffle")
    ds2 = hdf5_meta(path2).datasets["y"]
    assert ds2.filters == [(2, (8,)), (32000, ())]
    got2 = np.array([r["vec"] for r in
                     read_hdf5(spark, path2, "y").orderBy("id").collect()])
    np.testing.assert_array_equal(got2, y)
