"""Pure-Python LZF codec — the HDF5 ``lzf`` filter (id 32000, the h5py
builtin third-party filter) without any native library.

Format (liblzf data format, as consumed by h5py's lzf_filter.c — the HDF5
filter stores the raw liblzf stream with no extra header):

- control byte ``ctrl < 0x20``: literal run of ``ctrl + 1`` bytes follows.
- otherwise a back-reference: length ``(ctrl >> 5) + 2`` (with ``ctrl >> 5
  == 7`` meaning one extension byte follows holding ``length - 9``), then
  one byte completing the 13-bit offset ``((ctrl & 0x1f) << 8) | byte``;
  the match starts ``offset + 1`` bytes behind the current output position
  and may overlap it (RLE-style copies), so the copy is byte-sequential.

The compressor is the standard greedy liblzf scheme: a 3-byte rolling hash
table of last-seen positions, matches up to 264 bytes / 8192 back.  Output
for incompressible data grows by at most 1 byte per 32 (literal-run
control bytes) — callers can always store the compressed form, matching
what the roundtrip tests pin.

Used by sources/hdf5.py for chunked datasets whose filter pipeline names
id 32000; decompression is a per-chunk, executor-side operation (each
Spark task unfilters only the chunk byte ranges it owns).
"""

from __future__ import annotations

_MAX_OFF = 1 << 13  # 13-bit offset field
_MAX_LEN = 264  # len-2 <= 7+255
_MAX_LIT = 32  # literal-run control byte < 0x20


def lzf_decompress(data: bytes) -> bytes:
    """Decode a liblzf stream (the whole input is one stream; the HDF5
    chunk size bounds it).  Raises ValueError on a truncated stream or an
    out-of-range back-reference."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        ctrl = data[i]
        i += 1
        if ctrl < 0x20:  # literal run
            run = ctrl + 1
            if i + run > n:
                raise ValueError("lzf: truncated literal run")
            out += data[i:i + run]
            i += run
        else:  # back-reference
            length = ctrl >> 5
            if length == 7:
                if i >= n:
                    raise ValueError("lzf: truncated length extension")
                length += data[i]
                i += 1
            length += 2
            if i >= n:
                raise ValueError("lzf: truncated offset byte")
            ref = len(out) - (((ctrl & 0x1F) << 8) | data[i]) - 1
            i += 1
            if ref < 0:
                raise ValueError("lzf: back-reference before stream start")
            # may overlap the output head — byte-sequential by design
            for _ in range(length):
                out.append(out[ref])
                ref += 1
    return bytes(out)


def lzf_compress(data: bytes) -> bytes:
    """Greedy liblzf encoder (hash-table of 3-byte prefixes).  Always
    returns a decodable stream, even for incompressible input (worst case
    +1 control byte per 32 literals)."""
    n = len(data)
    out = bytearray()
    htab: dict[int, int] = {}
    lit = 0  # start of the pending literal run
    i = 0

    def _flush(upto: int) -> None:
        p = lit
        while p < upto:
            run = min(_MAX_LIT, upto - p)
            out.append(run - 1)
            out.extend(data[p:p + run])
            p += run

    while i + 2 < n:
        key = data[i] << 16 | data[i + 1] << 8 | data[i + 2]
        ref = htab.get(key)
        htab[key] = i
        if (ref is not None and i - ref <= _MAX_OFF
                and data[ref:ref + 3] == data[i:i + 3]):
            length = 3
            max_len = min(n - i, _MAX_LEN)
            while length < max_len and data[ref + length] == data[i + length]:
                length += 1
            _flush(i)
            off = i - ref - 1
            stored = length - 2
            if stored < 7:
                out.append((stored << 5) | (off >> 8))
            else:
                out.append((7 << 5) | (off >> 8))
                out.append(stored - 7)
            out.append(off & 0xFF)
            i += length
            lit = i
        else:
            i += 1
    _flush(n)
    return bytes(out)
