"""HDF5 dataset on-ramp (S4; reference datasets.py:64-168).

Every published dataset the reference benchmarks against ships as one
``.hdf5`` file in the ann-benchmarks layout: 2-D datasets ``train``
(n × d float32), ``test`` (q × d float32), ``neighbors`` (q × k int32),
``distances`` (q × k float32) in the root group, plus root attributes
(``distance``, ``dimension``, ``point_type``, ...).

Spark-first design — metadata on the driver, data plane distributed:

- The HDF5 *metadata* (superblock, object headers, dataspace/datatype/
  layout messages) is a few KB; a pure-Python parser below reads it on the
  driver.  The subset handled is exactly what h5py's default (libver
  "earliest") writer produces for ``f.create_dataset(name, data=arr)``:
  version-0 superblock, old-style symbol-table groups, version-1 object
  headers, CONTIGUOUS layout, little-endian fixed-point/float datatypes,
  fixed-size and vlen string attributes.  No h5py needed for this path.
- The *data* of a contiguous dataset is one row-major byte range at a
  known file offset, so reading it parallelizes perfectly: each Spark
  task opens the file, seeks to its row range, and emits an Arrow batch —
  ``spark.range(n_splits)`` → ``mapInArrow``.  A 100 GB train set loads
  with every core scanning its own slice; nothing funnels through the
  driver.
- CHUNKED/compressed datasets read pure-Python too: the chunk index is a
  v1 B-tree walked on the driver (KBs of metadata), and each Spark task
  reads + inflates its own chunk byte ranges (deflate/shuffle/fletcher32
  inverted with zlib/numpy, lzf with the pure-Python codec in lzf.py —
  the filters every h5py export short of szip uses).  Full-row-width
  chunks (h5py's auto-chunking for tall 2-D arrays) yield complete rows
  with zero shuffle; row-splitting grids assemble with one row-id-keyed
  shuffle.  Only szip (patent-encumbered, rare) falls back to an
  import-gated h5py stream, mirroring ``read_huggingface``'s gating
  (vectors.py:230).

``write_hdf5`` is the matching minimal writer (same spec subset) used to
build test fixtures — this container has no h5py, and a reader with no
on-disk fixture would be dead code.  tests/test_hdf5.py round-trips
arrays + attrs through writer → reader, and pins byte-level expectations
(signature, superblock fields) so writer and reader cannot drift together.
"""

from __future__ import annotations

import os
import struct
import zlib
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession

UNDEF = 0xFFFFFFFFFFFFFFFF
_SIGNATURE = b"\x89HDF\r\n\x1a\n"


# --------------------------------------------------------------------- model


@dataclass
class DatasetMeta:
    name: str
    shape: tuple[int, ...]
    dtype: np.dtype
    data_addr: int
    data_size: int
    layout: str  # "contiguous" | "chunked" | "compact"
    compact_data: bytes | None = None
    attrs: dict = field(default_factory=dict)
    # chunked layout only: element-space chunk dims, v1 B-tree root, and the
    # filter pipeline as (filter_id, client_values) applied write-order
    chunk_dims: tuple[int, ...] | None = None
    btree_addr: int | None = None
    filters: list[tuple[int, tuple[int, ...]]] = field(default_factory=list)


@dataclass
class FileMeta:
    path: str
    datasets: dict[str, DatasetMeta]
    attrs: dict


# ------------------------------------------------------------------- reading


def _u(buf, off, n):
    return int.from_bytes(buf[off:off + n], "little")


class _MiniHDF5Reader:
    """Pure-Python parser for the old-style (v0 superblock) HDF5 subset.

    Spec references are to the public "HDF5 File Format Specification
    Version 3.0" section names; no HDF5 library code is consulted or
    reproduced — this is a from-scratch implementation of the published
    on-disk format.
    """

    def __init__(self, path: str):
        import mmap

        self.path = path
        self._f = open(path, "rb")
        try:  # mmap: metadata parse touches KBs of pages, not the whole file
            self.buf = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        except (ValueError, OSError):  # empty file etc. — fall back to bytes
            self._f.seek(0)
            self.buf = self._f.read()
        if self.buf[:8] != _SIGNATURE:
            raise ValueError(f"{path}: not an HDF5 file (bad signature)")
        ver = self.buf[8]
        if ver not in (0, 1):
            raise NotImplementedError(
                f"{path}: superblock version {ver}; this reader handles the "
                "old-style (v0/v1) layout h5py writes by default — for "
                "libver='latest' files install h5py")
        if self.buf[13] != 8 or self.buf[14] != 8:
            raise NotImplementedError("only 8-byte offsets/lengths supported")
        # v0: root symbol-table entry at fixed offset 24 + 8 + 16 + ... :
        # sig(8) vers(4) sizes(2) reserved(1) group-k(4) flags(4) = 23? —
        # laid out: 8 sig, 1 sb ver, 1 fs ver, 1 root ver, 1 res, 1 shm ver,
        # 1 sizeof off, 1 sizeof len, 1 res, 2 leaf k, 2 internal k,
        # 4 flags = 24; then 4 addresses (base, free, eof, driver) = 56;
        # root entry at 56 (v0) / 56+4 (v1, has indexed-storage k).
        entry = 24 + 32 + (4 if ver == 1 else 0)
        root_oh = _u(self.buf, entry + 8, 8)
        self.root_attrs, links = self._object_header(root_oh)
        self.datasets: dict[str, DatasetMeta] = {}
        for name, oh_addr in links:
            ds = self._dataset(name, oh_addr)
            if ds is not None:
                self.datasets[name] = ds

    # -- object headers ----------------------------------------------------

    def _messages(self, oh_addr):
        """Yield (type, body_bytes) for every v1 object-header message,
        following continuation blocks."""
        buf = self.buf
        if buf[oh_addr] != 1:
            raise NotImplementedError(
                "v2 object headers (libver='latest') need h5py")
        nmsgs = _u(buf, oh_addr + 2, 2)
        hsize = _u(buf, oh_addr + 8, 4)
        blocks = [(oh_addr + 16, hsize)]  # prefix is 12 B + 4 B padding
        got = 0
        while blocks and got < nmsgs:
            pos, remaining = blocks.pop(0)
            while remaining >= 8 and got < nmsgs:
                mtype = _u(buf, pos, 2)
                msize = _u(buf, pos + 2, 2)
                body = buf[pos + 8:pos + 8 + msize]
                pos += 8 + msize
                remaining -= 8 + msize
                got += 1
                if mtype == 0x0010:  # continuation: (addr, length)
                    blocks.append((_u(body, 0, 8), _u(body, 8, 8)))
                else:
                    yield mtype, body

    def _object_header(self, oh_addr):
        """Parse one object header → (attrs, group_links)."""
        attrs: dict = {}
        links: list[tuple[str, int]] = []
        self._last_msgs = msgs = list(self._messages(oh_addr))
        for mtype, body in msgs:
            if mtype == 0x000C:
                name, val = self._attribute(body)
                attrs[name] = val
            elif mtype == 0x0011:  # symbol table: btree + heap
                links.extend(self._symbol_table(_u(body, 0, 8), _u(body, 8, 8)))
        return attrs, links

    def _symbol_table(self, btree_addr, heap_addr):
        heap_data_addr = _u(self.buf, heap_addr + 24, 8)

        def name_at(off):
            end = self.buf.find(b"\0", heap_data_addr + off)
            return self.buf[heap_data_addr + off:end].decode()

        out = []

        def walk_btree(addr):
            assert self.buf[addr:addr + 4] == b"TREE", "bad B-tree signature"
            level = self.buf[addr + 5]
            used = _u(self.buf, addr + 6, 2)
            # keys/children alternate after 8 B header + 2×8 B siblings
            p = addr + 24
            children = []
            for i in range(used):
                children.append(_u(self.buf, p + 8 + i * 16, 8))
            for child in children:
                if level > 0:
                    walk_btree(child)
                else:
                    walk_snod(child)

        def walk_snod(addr):
            assert self.buf[addr:addr + 4] == b"SNOD", "bad SNOD signature"
            n = _u(self.buf, addr + 6, 2)
            for i in range(n):
                e = addr + 8 + i * 40
                out.append((name_at(_u(self.buf, e, 8)), _u(self.buf, e + 8, 8)))

        walk_btree(btree_addr)
        return out

    # -- messages ----------------------------------------------------------

    def _dataspace(self, body):
        version, ndims = body[0], body[1]
        if version == 1:
            off = 8
        elif version == 2:
            off = 4
        else:
            raise NotImplementedError(f"dataspace version {version}")
        return tuple(_u(body, off + 8 * i, 8) for i in range(ndims))

    def _datatype(self, body):
        cls, version = body[0] & 0x0F, body[0] >> 4
        bits0 = body[1]
        size = _u(body, 4, 4)
        if cls == 0:  # fixed-point
            if bits0 & 1:
                raise NotImplementedError("big-endian data")
            signed = bool(bits0 & 0x08)
            return np.dtype(f"<{'i' if signed else 'u'}{size}")
        if cls == 1:  # float
            if bits0 & 1:
                raise NotImplementedError("big-endian data")
            return np.dtype(f"<f{size}")
        if cls == 3:  # string (fixed size)
            return ("str", size)
        if cls == 9:  # variable-length
            base = self._datatype(body[8:])
            is_str = (bits0 & 0x0F) == 1
            return ("vlen_str" if is_str else "vlen", base)
        raise NotImplementedError(f"datatype class {cls}")

    def _attribute(self, body):
        version = body[0]
        if version != 1:
            raise NotImplementedError(f"attribute message version {version}")
        name_size = _u(body, 2, 2)
        dt_size = _u(body, 4, 2)
        ds_size = _u(body, 6, 2)
        pad8 = lambda n: (n + 7) & ~7  # noqa: E731
        p = 8
        name = body[p:p + name_size].split(b"\0")[0].decode()
        p += pad8(name_size)
        dtype = self._datatype(body[p:p + dt_size])
        p += pad8(dt_size)
        shape = self._dataspace(body[p:p + ds_size])
        p += pad8(ds_size)
        data = body[p:]
        n = int(np.prod(shape)) if shape else 1
        if isinstance(dtype, tuple):
            kind = dtype[0]
            if kind == "str":
                return name, data[:dtype[1]].split(b"\0")[0].decode()
            if kind == "vlen_str":
                return name, self._vlen_str(data)
            raise NotImplementedError("vlen non-string attribute")
        vals = np.frombuffer(data, dtype=dtype, count=n)
        return name, (vals[0].item() if not shape else vals.reshape(shape))

    def _vlen_str(self, data):
        """vlen datum = length(4) + global-heap collection addr(8) + index(4)."""
        length = _u(data, 0, 4)
        gcol, idx = _u(data, 4, 8), _u(data, 12, 4)
        assert self.buf[gcol:gcol + 4] == b"GCOL", "bad global heap signature"
        p = gcol + 16
        end = gcol + _u(self.buf, gcol + 8, 8)
        while p < end:
            obj_idx = _u(self.buf, p, 2)
            obj_size = _u(self.buf, p + 8, 8)
            if obj_idx == idx:
                return self.buf[p + 16:p + 16 + length].decode()
            if obj_idx == 0:
                break
            p += 16 + ((obj_size + 7) & ~7)
        raise ValueError("global heap object not found")

    def _filter_pipeline(self, body):
        """Filter-pipeline message (0x000B, v1) → [(filter_id, client_vals)]
        in write order (readers apply the inverse in reverse order)."""
        version, nfilters = body[0], body[1]
        if version != 1:
            raise NotImplementedError(f"filter pipeline version {version}")
        p = 8
        out = []
        for _ in range(nfilters):
            fid = _u(body, p, 2)
            name_len = _u(body, p + 2, 2)
            nclient = _u(body, p + 6, 2)
            p += 8 + ((name_len + 7) & ~7 if name_len else 0)
            vals = tuple(_u(body, p + 4 * i, 4) for i in range(nclient))
            p += 4 * nclient
            if nclient % 2:  # odd client count pads to 8-byte multiple
                p += 4
            out.append((fid, vals))
        return out

    def _dataset(self, name, oh_addr):
        attrs, _ = self._object_header(oh_addr)
        shape = dtype = None
        layout = None
        data_addr = data_size = 0
        compact = None
        chunk_dims = btree_addr = None
        filters: list = []
        for mtype, body in self._last_msgs:
            if mtype == 0x0001:
                shape = self._dataspace(body)
            elif mtype == 0x0003:
                dtype = self._datatype(body)
            elif mtype == 0x000B:
                filters = self._filter_pipeline(body)
            elif mtype == 0x0008:
                version = body[0]
                if version == 3:
                    cls = body[1]
                    if cls == 1:  # contiguous
                        layout = "contiguous"
                        data_addr, data_size = _u(body, 2, 8), _u(body, 10, 8)
                    elif cls == 0:  # compact
                        layout = "compact"
                        sz = _u(body, 2, 2)
                        compact = bytes(body[4:4 + sz])
                    else:  # chunked: ndims+1 (trailing dim = element size)
                        layout = "chunked"
                        nd = body[2]
                        btree_addr = _u(body, 3, 8)
                        chunk_dims = tuple(
                            _u(body, 11 + 4 * i, 4) for i in range(nd - 1))
                elif version in (1, 2):
                    ndims, cls = body[1], body[2]
                    if cls == 1:
                        layout = "contiguous"
                        data_addr = _u(body, 8, 8)
                        data_size = int(np.prod(
                            [_u(body, 16 + 4 * i, 4) for i in range(ndims)]))
                    elif cls == 2:  # chunked: address then ndims sizes
                        layout = "chunked"
                        btree_addr = _u(body, 8, 8)
                        chunk_dims = tuple(
                            _u(body, 16 + 4 * i, 4) for i in range(ndims - 1))
                    else:
                        layout = "compact"
                else:
                    raise NotImplementedError(f"layout version {version}")
        if shape is None or dtype is None or isinstance(dtype, tuple):
            return None  # not an array dataset (e.g. a subgroup or strings)
        return DatasetMeta(name, shape, dtype, data_addr, data_size,
                           layout or "contiguous", compact, attrs,
                           chunk_dims, btree_addr, filters)

    # -- chunk index (v1 B-tree, node type 1) ------------------------------

    def chunk_table(self, ds: "DatasetMeta") -> list[tuple[int, int, tuple[int, ...]]]:
        """Walk the raw-data chunk B-tree → [(file_addr, stored_nbytes,
        element_offsets)] — driver-side metadata, KB-scale."""
        if ds.btree_addr is None or ds.btree_addr == UNDEF:
            return []
        ndims = len(ds.shape)
        key_size = 8 + 8 * (ndims + 1)  # size(4) + mask(4) + offsets
        out: list[tuple[int, int, tuple[int, ...]]] = []

        def walk(addr):
            buf = self.buf
            assert buf[addr:addr + 4] == b"TREE", "bad chunk B-tree signature"
            node_type, level = buf[addr + 4], buf[addr + 5]
            assert node_type == 1, f"expected raw-data B-tree, got type {node_type}"
            used = _u(buf, addr + 6, 2)
            p = addr + 24  # header + left/right sibling addresses
            for _ in range(used):
                nbytes = _u(buf, p, 4)
                offs = tuple(_u(buf, p + 8 + 8 * i, 8) for i in range(ndims))
                child = _u(buf, p + key_size, 8)
                p += key_size + 8
                if level > 0:
                    walk(child)
                else:
                    out.append((child, nbytes, offs))

        walk(ds.btree_addr)
        return out


def hdf5_meta(path: str) -> FileMeta:
    """Parse file-level + per-dataset metadata (driver-side, KB of I/O)."""
    r = _MiniHDF5Reader(path)
    return FileMeta(path, r.datasets, r.root_attrs)


# ---------------------------------------------------------- Spark data plane


def _spark_type(dtype: np.dtype) -> str:
    return {"f4": "float", "f8": "double", "i4": "int", "i8": "bigint",
            "i2": "smallint", "i1": "tinyint", "u1": "smallint"}[dtype.str[1:]]


def read_hdf5(
    spark: SparkSession,
    path: str,
    dataset: str,
    *,
    id_col: str = "id",
    vec_col: str = "vec",
    n_splits: int | None = None,
) -> DataFrame:
    """One HDF5 dataset → DataFrame ``(id bigint, vec array<T>)`` (2-D) or
    ``(id bigint, value T)`` (1-D), ids = row index.

    Contiguous data is read by parallel byte-range tasks (see module doc);
    chunked/compressed data falls back to driver-side h5py, import-gated.
    """
    path = os.path.abspath(path)
    reader = _MiniHDF5Reader(path)
    if dataset not in reader.datasets:
        raise KeyError(f"{dataset!r} not in {sorted(reader.datasets)}")
    ds = reader.datasets[dataset]
    if ds.layout == "chunked":
        try:
            chunks = reader.chunk_table(ds)
            return _read_chunked(spark, path, ds, chunks, id_col, vec_col)
        except NotImplementedError:
            # an exotic filter (szip, lzf, ...) — only then fall back to h5py
            return _read_chunked_h5py(spark, path, dataset, id_col, vec_col)

    n = ds.shape[0] if ds.shape else 1
    width = int(np.prod(ds.shape[1:])) if len(ds.shape) > 1 else 1
    item = ds.dtype.itemsize
    two_d = len(ds.shape) > 1
    sql_t = _spark_type(ds.dtype)
    schema = (f"{id_col} bigint, {vec_col} array<{sql_t}>" if two_d
              else f"{id_col} bigint, {vec_col} {sql_t}")

    if ds.layout == "compact" or n == 0:
        arr = (np.frombuffer(ds.compact_data or b"", dtype=ds.dtype)
               if ds.layout == "compact"
               else np.empty(0, ds.dtype)).reshape(ds.shape)
        rows = [(i, arr[i].tolist() if two_d else arr[i].item())
                for i in range(n)]
        return spark.createDataFrame(rows, schema)

    if n_splits is None:
        n_splits = min(n, int(os.environ.get("SPARK_GRAFT_CPUS", "32")) * 2)
    base, dtype_str, addr = path, ds.dtype.str, ds.data_addr

    def _read(iterator):
        import pyarrow as pa

        for batch in iterator:
            for sid in batch.column("split").to_pylist():
                r0 = sid * n // n_splits
                r1 = (sid + 1) * n // n_splits
                if r1 <= r0:
                    continue
                with open(base, "rb") as f:
                    f.seek(addr + r0 * width * item)
                    raw = f.read((r1 - r0) * width * item)
                a = np.frombuffer(raw, dtype=np.dtype(dtype_str))
                ids = pa.array(np.arange(r0, r1, dtype=np.int64))
                if two_d:
                    flat = pa.array(a)
                    offs = pa.array(
                        np.arange(0, (r1 - r0 + 1) * width, width, dtype=np.int32))
                    col = pa.ListArray.from_arrays(offs, flat)
                else:
                    col = pa.array(a)
                yield pa.RecordBatch.from_arrays([ids, col], [id_col, vec_col])

    splits = spark.range(n_splits).selectExpr("cast(id as int) as split")
    return splits.repartition(n_splits, "split").mapInArrow(_read, schema)


_SUPPORTED_FILTERS = {1, 2, 3, 32000}  # deflate, shuffle, fletcher32, lzf


def _defilter(raw: bytes, filters) -> bytes:
    """Invert the filter pipeline (write order → applied in reverse)."""
    import zlib as _zlib

    for fid, vals in reversed(filters):
        if fid == 1:  # deflate
            raw = _zlib.decompress(raw)
        elif fid == 32000:  # lzf (h5py builtin filter, pure-Python codec)
            from bigvectorbench_spark.sources.lzf import lzf_decompress
            raw = lzf_decompress(raw)
        elif fid == 2:  # shuffle: all byte-0s, then all byte-1s, ...
            elem = vals[0] if vals else 1
            a = np.frombuffer(raw, np.uint8)
            raw = a.reshape(elem, a.size // elem).T.tobytes()
        elif fid == 3:  # fletcher32: 4-byte checksum trails the data
            raw = raw[:-4]
        else:  # pragma: no cover - guarded driver-side
            raise NotImplementedError(f"HDF5 filter id {fid}")
    return raw


def _read_chunked(spark, path, ds: DatasetMeta, chunks, id_col, vec_col):
    """Chunked (optionally deflate/shuffle-compressed) dataset → DataFrame,
    pure Python, distributed: the chunk table is driver-side metadata (KBs);
    each Spark task reads, inflates, and unfilters its own chunk byte
    ranges.  When chunks span the full row width (every h5py auto-chunking
    of tall 2-D arrays, and all 1-D data) a chunk yields complete rows with
    no shuffle at all; row-splitting chunk grids assemble rows with ONE
    shuffle keyed by row id."""
    for fid, _ in ds.filters:
        if fid not in _SUPPORTED_FILTERS:
            raise NotImplementedError(f"HDF5 filter id {fid} needs h5py")
    shape, cdims = ds.shape, ds.chunk_dims or ds.shape
    n = shape[0] if shape else 1
    two_d = len(shape) > 1
    width = int(np.prod(shape[1:])) if two_d else 1
    sql_t = _spark_type(ds.dtype)
    schema = (f"{id_col} bigint, {vec_col} array<{sql_t}>" if two_d
              else f"{id_col} bigint, {vec_col} {sql_t}")
    if not chunks or n == 0:  # allocated-but-unwritten → fill value (0)
        return spark.range(n).selectExpr(
            f"id as {id_col}",
            (f"array_repeat(cast(0 as {sql_t}), {width}) as {vec_col}"
             if two_d else f"cast(0 as {sql_t}) as {vec_col}"))

    full_width = (not two_d) or tuple(cdims[1:]) == tuple(shape[1:])
    dtype_str, filters = ds.dtype.str, list(ds.filters)
    cdims = tuple(int(c) for c in cdims)
    shape_t = tuple(int(s) for s in shape)
    n_splits = min(len(chunks), int(os.environ.get("SPARK_GRAFT_CPUS", "32")) * 2)

    def _decode(iterator):
        import pyarrow as pa

        with open(path, "rb") as f:
            for batch in iterator:
                tbl = batch.to_pydict()
                for addr, nbytes, offs in zip(tbl["addr"], tbl["nbytes"], tbl["offs"]):
                    f.seek(addr)
                    raw = _defilter(f.read(nbytes), filters)
                    arr = np.frombuffer(raw, np.dtype(dtype_str)).reshape(cdims)
                    valid = tuple(min(c, s - o)
                                  for c, s, o in zip(cdims, shape_t, offs))
                    arr = arr[tuple(slice(0, v) for v in valid)]
                    ids = pa.array(np.arange(offs[0], offs[0] + valid[0],
                                             dtype=np.int64))
                    if not two_d:
                        yield pa.RecordBatch.from_arrays(
                            [ids, pa.array(arr)], [id_col, vec_col])
                        continue
                    rows = arr.reshape(valid[0], -1)
                    flat = pa.array(np.ascontiguousarray(rows).reshape(-1))
                    offsets = pa.array(np.arange(
                        0, (valid[0] + 1) * rows.shape[1], rows.shape[1],
                        dtype=np.int32))
                    cols = [ids, pa.ListArray.from_arrays(offsets, flat)]
                    names = [id_col, vec_col]
                    if not full_width:
                        cols.append(pa.array(
                            np.full(valid[0], offs[1], dtype=np.int32)))
                        names.append("_c0")
                    yield pa.RecordBatch.from_arrays(cols, names)

    chunk_df = spark.createDataFrame(
        [(int(a), int(nb), list(map(int, o))) for a, nb, o in chunks],
        "addr bigint, nbytes bigint, offs array<bigint>",
    ).repartition(n_splits)
    if full_width:
        return chunk_df.mapInArrow(_decode, schema)
    # row-splitting grid: assemble each row's column slices, one shuffle
    from pyspark.sql import functions as F

    pieces = chunk_df.mapInArrow(_decode, schema + ", _c0 int")
    return pieces.groupBy(id_col).agg(
        F.flatten(F.transform(
            F.array_sort(F.collect_list(F.struct("_c0", vec_col))),
            lambda s: s[vec_col])).alias(vec_col))


def _read_chunked_h5py(spark, path, dataset, id_col, vec_col,
                       batch_rows: int = 65536):
    """Chunked/filtered datasets need the filter pipeline — import-gated
    h5py, driver-side streaming (mirrors read_huggingface's gating)."""
    try:
        import h5py  # type: ignore
    except ImportError as e:  # pragma: no cover - env without h5py
        raise NotImplementedError(
            "chunked/compressed HDF5 datasets require the `h5py` package; "
            "re-export the dataset uncompressed (ann-benchmarks default) or "
            "convert to parquet and use spark.read.parquet"
        ) from e
    import pandas as pd  # pragma: no cover

    with h5py.File(path, "r") as f:  # pragma: no cover
        arr = f[dataset]
        two_d = arr.ndim > 1
        sql_t = _spark_type(np.dtype(arr.dtype.str))
        schema = (f"{id_col} bigint, {vec_col} array<{sql_t}>" if two_d
                  else f"{id_col} bigint, {vec_col} {sql_t}")
        frames = []
        for start in range(0, arr.shape[0], batch_rows):
            chunk = np.asarray(arr[start:start + batch_rows])
            frames.append(pd.DataFrame({
                id_col: np.arange(start, start + len(chunk), dtype=np.int64),
                vec_col: [r.tolist() for r in chunk] if two_d else chunk,
            }))
        if not frames:
            return spark.createDataFrame([], schema)
        return spark.createDataFrame(pd.concat(frames, ignore_index=True),
                                     schema=schema)


def read_ann_benchmarks(spark: SparkSession, path: str) -> dict:
    """The reference's dataset contract (datasets.py:64-168) in one call:
    ``train``/``test`` as (id, vec), ``neighbors``/``distances`` zipped into
    one ``groundtruth`` frame (qid, neighbors, distances), plus root attrs
    (``distance`` etc.) under ``"attrs"``.  Missing members are omitted."""
    from pyspark.sql import functions as F

    meta = hdf5_meta(path)
    out: dict = {"attrs": meta.attrs}
    for name in ("train", "test"):
        if name in meta.datasets:
            out[name] = read_hdf5(spark, path, name)
    if "neighbors" in meta.datasets:
        gt = read_hdf5(spark, path, "neighbors", id_col="qid",
                       vec_col="neighbors")
        if "distances" in meta.datasets:
            d = read_hdf5(spark, path, "distances", id_col="qid",
                          vec_col="distances")
            gt = gt.join(d, "qid")
        out["groundtruth"] = gt.orderBy(F.col("qid"))
    return out


# ------------------------------------------------------------------- writing


def _pad8(b: bytes) -> bytes:
    return b + b"\0" * (-len(b) % 8)


def _dt_msg(dtype: np.dtype) -> bytes:
    """Datatype message body for LE fixed-point/float."""
    size = dtype.itemsize
    if dtype.kind in "iu":
        head = struct.pack("<BBBBI", 0x10, 0x08 if dtype.kind == "i" else 0,
                           0, 0, size)
        return head + struct.pack("<HH", 0, size * 8)
    if dtype.kind == "f":
        if size == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
            sign = 31
        else:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
            sign = 63
        head = struct.pack("<BBBBI", 0x11, 0x20, sign, 0, size)
        return head + props
    raise NotImplementedError(f"dtype {dtype}")


def _str_dt_msg(n: int) -> bytes:
    return struct.pack("<BBBBI", 0x13, 0, 0, 0, n)


def _ds_msg(shape: tuple[int, ...]) -> bytes:
    body = struct.pack("<BBBxxxxx", 1, len(shape), 0)
    for dim in shape:
        body += struct.pack("<Q", dim)
    return body


def _attr_msg(name: str, value) -> bytes:
    nm = name.encode() + b"\0"
    if isinstance(value, str):
        data = value.encode()
        dt = _str_dt_msg(len(data))
        ds = _ds_msg(())
    elif isinstance(value, int):
        data = struct.pack("<q", value)
        dt = _dt_msg(np.dtype("<i8"))
        ds = _ds_msg(())
    elif isinstance(value, float):
        data = struct.pack("<d", value)
        dt = _dt_msg(np.dtype("<f8"))
        ds = _ds_msg(())
    else:
        raise NotImplementedError(f"attr type {type(value)}")
    return (struct.pack("<BxHHH", 1, len(nm), len(dt), len(ds))
            + _pad8(nm) + _pad8(dt) + _pad8(ds) + data)


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHBxxx", mtype, len(body), 0) + body


def _object_header(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    return struct.pack("<BxHIIxxxx", 1, len(messages), 1, len(blob)) + blob


_FILTER_NAMES = {32000: b"lzf"}


def _filter_msg_body(filters: list[tuple[int, tuple[int, ...]]]) -> bytes:
    body = struct.pack("<BB6x", 1, len(filters))
    for fid, vals in filters:
        # ids >= 256 are registered third-party filters: the v1 message
        # carries their name (8-padded); builtin ids omit it (spec IV.A.2.l)
        name = _FILTER_NAMES.get(fid, b"") if fid >= 256 else b""
        name_len = ((len(name) + 1 + 7) & ~7) if name else 0
        body += struct.pack("<HHHH", fid, name_len, 0, len(vals))
        if name_len:
            body += (name + b"\0").ljust(name_len, b"\0")
        body += b"".join(struct.pack("<I", v) for v in vals)
        if len(vals) % 2:
            body += b"\0\0\0\0"
    return body


def _chunked_layout_body(cdims, itemsize: int, btree_addr: int) -> bytes:
    return (struct.pack("<BBB", 3, 2, len(cdims) + 1)
            + struct.pack("<Q", btree_addr)
            + b"".join(struct.pack("<I", int(c)) for c in (*cdims, itemsize)))


def _btree_node(level: int, items, left: int, right: int,
                end_key_offs) -> bytes:
    """One v1 raw-data B-tree node; ``items`` = [(offs, nbytes, child)]."""
    b = (b"TREE" + struct.pack("<BBH", 1, level, len(items))
         + struct.pack("<QQ", left, right))
    for offs, nb, child in items:
        b += struct.pack("<II", nb, 0)
        b += b"".join(struct.pack("<Q", int(o)) for o in offs)
        b += struct.pack("<Q", 0)  # element-size dimension offset
        b += struct.pack("<Q", child)
    b += struct.pack("<II", 0, 0)
    b += b"".join(struct.pack("<Q", int(o)) for o in end_key_offs)
    b += struct.pack("<Q", 0)
    return b


def _encode_chunks(arr: np.ndarray, cdims, filters):
    """Split ``arr`` into full-size chunks (edge chunks zero-padded, as the
    format requires — filters run over whole chunks) and apply the filter
    pipeline in write order.  Returns [(offs, blob)] row-major."""
    import itertools

    coords = itertools.product(
        *[range(0, max(s, 1), c) for s, c in zip(arr.shape, cdims)])
    out = []
    for offs in coords:
        sl = tuple(slice(o, min(o + c, s))
                   for o, c, s in zip(offs, cdims, arr.shape))
        sub = arr[sl]
        if sub.shape != tuple(cdims):
            pad = np.zeros(tuple(cdims), arr.dtype)
            pad[tuple(slice(0, x) for x in sub.shape)] = sub
            sub = pad
        raw = np.ascontiguousarray(sub).tobytes()
        for fid, vals in filters:
            if fid == 2:  # shuffle
                elem = vals[0]
                raw = (np.frombuffer(raw, np.uint8)
                       .reshape(-1, elem).T.tobytes())
            elif fid == 1:  # deflate
                raw = zlib.compress(raw, vals[0] if vals else 6)
            elif fid == 32000:  # lzf
                from bigvectorbench_spark.sources.lzf import lzf_compress
                raw = lzf_compress(raw)
            else:
                raise NotImplementedError(f"writer filter id {fid}")
        out.append((offs, raw))
    return out


def write_hdf5(path: str, datasets: dict[str, np.ndarray],
               attrs: dict | None = None, *,
               chunks: dict[str, tuple[int, ...]] | None = None,
               compression: str | dict | None = None,
               compression_level: int = 6) -> None:
    """Minimal old-style HDF5 writer (same spec subset the reader parses):
    v0 superblock, root symbol-table group, contiguous datasets by default,
    root attributes.  ``chunks={name: chunk_dims}`` switches a dataset to
    CHUNKED layout (v1 chunk B-tree, multi-level past 16 chunks/node);
    ``compression`` ("gzip" or "gzip+shuffle", or a per-name dict) adds the
    deflate / shuffle+deflate filter pipeline.  Used for test fixtures and
    for exporting ground-truth packs in the reference's own container
    format — and to prove the chunked reader against files it did not
    itself shape."""
    attrs = attrs or {}
    chunks = chunks or {}
    names = sorted(datasets)

    def _filters_for(nm: str, arr: np.ndarray):
        comp = (compression.get(nm) if isinstance(compression, dict)
                else compression)
        fl: list[tuple[int, tuple[int, ...]]] = []
        if comp in ("gzip+shuffle", "shuffle+gzip", "lzf+shuffle",
                    "shuffle+lzf"):
            fl.append((2, (arr.dtype.itemsize,)))
        if comp in ("gzip", "gzip+shuffle", "shuffle+gzip"):
            fl.append((1, (compression_level,)))
        elif comp in ("lzf", "lzf+shuffle", "shuffle+lzf"):
            fl.append((32000, ()))
        elif comp is not None:
            raise NotImplementedError(f"compression {comp!r}")
        return fl

    # local heap data: empty string at 0, then each name, 8-padded
    heap_data = bytearray(b"\0" * 8)
    name_off = {}
    for nm in names:
        name_off[nm] = len(heap_data)
        heap_data += _pad8(nm.encode() + b"\0")

    pos = 96  # superblock v0 incl. root symbol-table entry

    root_oh_addr = pos
    root_oh = _object_header(
        [_msg(0x0011, b"\0" * 16)]  # symbol table: patched below
        + [_msg(0x000C, _attr_msg(k, v)) for k, v in sorted(attrs.items())])
    pos += len(root_oh)

    heap_addr = pos
    heap_hdr_size = 32
    heap_data_addr = heap_addr + heap_hdr_size
    pos = heap_data_addr + len(heap_data)

    btree_addr = pos
    btree = (b"TREE" + struct.pack("<BBH", 0, 0, 1)
             + struct.pack("<QQ", UNDEF, UNDEF)
             + struct.pack("<Q", 0))           # key0: empty name
    # child + key1 appended below once snod_addr known
    pos += len(btree) + 16
    snod_addr = pos
    snod_size = 8 + len(names) * 40
    pos += snod_size

    ds_oh_addr, ds_data_addr = {}, {}
    ds_oh_blob = {}
    ds_chunk_plan: dict[str, dict] = {}
    for nm in names:
        arr = np.ascontiguousarray(datasets[nm])
        ds_oh_addr[nm] = pos
        if nm in chunks:
            cdims = tuple(chunks[nm])
            if len(cdims) != arr.ndim:
                raise ValueError(f"{nm}: chunk rank {len(cdims)} != {arr.ndim}")
            fl = _filters_for(nm, arr)
            blobs = _encode_chunks(arr, cdims, fl)

            def _oh(btree_addr, arr=arr, cdims=cdims, fl=fl):
                msgs = [_msg(0x0001, _ds_msg(arr.shape)),
                        _msg(0x0003, _dt_msg(arr.dtype))]
                if fl:
                    msgs.append(_msg(0x000B, _filter_msg_body(fl)))
                msgs.append(_msg(0x0008, _chunked_layout_body(
                    cdims, arr.dtype.itemsize, btree_addr)))
                return _object_header(msgs)

            oh = _oh(UNDEF)  # same length regardless of address
            pos += len(oh)
            chunk_addrs = []
            for _, blob in blobs:
                chunk_addrs.append(pos)
                pos += len(blob)
            key_size = 8 + 8 * (arr.ndim + 1)
            leaf_cap = 16
            groups = [list(range(i, min(i + leaf_cap, len(blobs))))
                      for i in range(0, len(blobs), leaf_cap)]
            leaf_addrs = []
            for g in groups:
                leaf_addrs.append(pos)
                pos += 24 + len(g) * (key_size + 8) + key_size
            if len(groups) > 1:
                root_addr = pos
                pos += 24 + len(groups) * (key_size + 8) + key_size
            else:
                root_addr = leaf_addrs[0]
            ds_chunk_plan[nm] = dict(arr=arr, cdims=cdims, fl=fl, blobs=blobs,
                                     oh_fn=_oh, chunk_addrs=chunk_addrs,
                                     groups=groups, leaf_addrs=leaf_addrs,
                                     root_addr=root_addr)
            ds_oh_blob[nm] = oh
            continue
        oh = _object_header([
            _msg(0x0001, _ds_msg(arr.shape)),
            _msg(0x0003, _dt_msg(arr.dtype)),
            _msg(0x0008, struct.pack("<BBQQ", 3, 1, 0, arr.nbytes)),  # patched
        ])
        ds_oh_blob[nm] = oh
        pos += len(oh)
        pos = (pos + 7) & ~7
        ds_data_addr[nm] = pos
        pos += arr.nbytes

    eof = pos

    out = bytearray(eof)
    out[0:8] = _SIGNATURE
    out[8:24] = struct.pack("<BBBBBBBBHHI", 0, 0, 0, 0, 0, 8, 8, 0, 4, 16, 0)
    out[24:56] = struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
    out[56:96] = struct.pack("<QQIIQQ", 0, root_oh_addr, 1, 0,
                             btree_addr, heap_addr)

    # root OH with patched symbol-table message (btree, heap)
    root_oh = bytearray(root_oh)
    root_oh[24:40] = struct.pack("<QQ", btree_addr, heap_addr)
    out[root_oh_addr:root_oh_addr + len(root_oh)] = root_oh

    out[heap_addr:heap_addr + heap_hdr_size] = (
        b"HEAP" + struct.pack("<Bxxx", 0)
        + struct.pack("<QQQ", len(heap_data), UNDEF, heap_data_addr))
    out[heap_data_addr:heap_data_addr + len(heap_data)] = heap_data

    btree_full = (btree + struct.pack("<Q", snod_addr)
                  + struct.pack("<Q", name_off[names[-1]] if names else 0))
    out[btree_addr:btree_addr + len(btree_full)] = btree_full

    snod = bytearray(b"SNOD" + struct.pack("<BBH", 1, 0, len(names)))
    for nm in names:
        snod += struct.pack("<QQII", name_off[nm], ds_oh_addr[nm], 0, 0)
        snod += b"\0" * 16
    out[snod_addr:snod_addr + len(snod)] = snod

    for nm in names:
        if nm in ds_chunk_plan:
            plan = ds_chunk_plan[nm]
            oh = plan["oh_fn"](plan["root_addr"])
            out[ds_oh_addr[nm]:ds_oh_addr[nm] + len(oh)] = oh
            blobs, chunk_addrs = plan["blobs"], plan["chunk_addrs"]
            for (offs, blob), addr in zip(blobs, chunk_addrs):
                out[addr:addr + len(blob)] = blob
            arr, cdims = plan["arr"], plan["cdims"]
            end_key = (((arr.shape[0] + cdims[0] - 1) // cdims[0]) * cdims[0],
                       ) + (0,) * (arr.ndim - 1)
            groups, leaf_addrs = plan["groups"], plan["leaf_addrs"]
            for gi, g in enumerate(groups):
                items = [(blobs[i][0], len(blobs[i][1]), chunk_addrs[i])
                         for i in g]
                left = leaf_addrs[gi - 1] if gi > 0 else UNDEF
                right = leaf_addrs[gi + 1] if gi + 1 < len(groups) else UNDEF
                node = _btree_node(0, items, left, right, end_key)
                out[leaf_addrs[gi]:leaf_addrs[gi] + len(node)] = node
            if len(groups) > 1:
                items = [(blobs[g[0]][0], 0, leaf_addrs[gi])
                         for gi, g in enumerate(groups)]
                node = _btree_node(1, items, UNDEF, UNDEF, end_key)
                out[plan["root_addr"]:plan["root_addr"] + len(node)] = node
            continue
        arr = np.ascontiguousarray(datasets[nm])
        oh = bytearray(ds_oh_blob[nm])
        # patch the layout message's addr+size: its 18-byte body (v3:
        # version, class, addr(8), size(8)) pads to 24, so addr starts 22
        # bytes from the end of the header blob
        oh[-22:-6] = struct.pack("<QQ", ds_data_addr[nm], arr.nbytes)
        out[ds_oh_addr[nm]:ds_oh_addr[nm] + len(oh)] = oh
        out[ds_data_addr[nm]:ds_data_addr[nm] + arr.nbytes] = arr.tobytes()

    with open(path, "wb") as f:
        f.write(out)
