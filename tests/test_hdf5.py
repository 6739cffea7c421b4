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


def test_h5py_parity_if_available(spark, ann_file):
    """When h5py exists (not in this container), the mini reader must agree
    with it on the same file — the real-format compatibility check."""
    h5py = pytest.importorskip("h5py")
    path, train, *_ = ann_file
    with h5py.File(path, "r") as f:
        np.testing.assert_array_equal(np.asarray(f["train"]), train)
        assert f.attrs["distance"] == "angular"
