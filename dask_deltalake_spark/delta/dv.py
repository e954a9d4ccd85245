"""Deletion vectors (Delta reader v3 / writer v7 table feature) —
merge-on-read row-level deletes per the public Delta protocol spec
(PROTOCOL.md §Deletion Vectors + the RoaringBitmap format spec
https://github.com/RoaringBitmap/RoaringFormatSpec).

A deletion vector marks rows of one data file as deleted by POSITION
(0-based row index within the file) without rewriting the file: the
add action carries a ``deletionVector`` descriptor pointing at a
compressed Roaring bitmap of deleted positions. DELETE then costs
O(matched rows) bitmap bytes instead of a copy-on-write rewrite of
every touched file — at 100 TB deleting 0.1% of rows rewrites nothing.

Wire formats implemented here, both directions:

- **z85** (ZeroMQ base-85, RFC draft): encodes the DV file's UUID (and
  inline bitmap data) in ``pathOrInlineDv``.
- **32-bit Roaring portable serialization**: array / bitmap / run
  containers, cookies 12346/12347, descriptive + offset headers. Run
  containers are READ for interop; this writer emits array/bitmap
  containers only (always valid Roaring).
- **RoaringBitmapArray "portable"** (the 64-bit layering Delta uses):
  magic 1681511377 (4B LE) + int64 bitmap count + per-index 32-bit
  bitmaps (index i covers row positions [i·2³², (i+1)·2³²)).
- **DV file layout** (storageType ``u``): 1 version byte (=1), then
  per DV blob: 4B BIG-endian data length, the bitmap-array data, 4B
  BIG-endian CRC-32 of the data. ``offset`` in the descriptor points
  at the length field; ``sizeInBytes`` is the data length.

Readers accept all three storage types (``u`` relative-file, ``p``
absolute-file, ``i`` inline); the writer emits ``u`` (one .bin per
commit holding every file's DV, delta-spark's layout) so the log
stays metadata-sized however many rows die.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib
from typing import Iterable, Optional

import numpy as np
import pandas as pd  # module-level so the pandas-UDF type hints
# (stringified by `from __future__ import annotations`) resolve
# against this module's globals at decoration time

ROARING_ARRAY_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUNCONTAINER = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            v = v * 85 + _Z85_INDEX[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# 32-bit Roaring portable serialization
# ---------------------------------------------------------------------------


def _serialize_roaring32(values: np.ndarray) -> bytes:
    """Sorted unique uint32 values → portable Roaring bytes (array /
    bitmap containers only — run optimization is a size nicety, not a
    validity requirement)."""
    keys = (values >> 16).astype(np.uint16)
    uniq_keys, starts = np.unique(keys, return_index=True)
    bounds = list(starts) + [len(values)]
    n = len(uniq_keys)
    head = struct.pack("<II", _SERIAL_COOKIE_NO_RUNCONTAINER, n)
    desc = bytearray()
    data_parts = []
    for i, k in enumerate(uniq_keys):
        lows = (values[bounds[i] : bounds[i + 1]] & 0xFFFF).astype(np.uint16)
        card = len(lows)
        desc += struct.pack("<HH", int(k), card - 1)
        if card <= 4096:
            data_parts.append(lows.astype("<u2").tobytes())
        else:
            bits = np.zeros(65536, dtype=bool)
            bits[lows] = True
            data_parts.append(np.packbits(bits, bitorder="little").tobytes())
    # offset header is mandatory with the no-run cookie
    offsets = bytearray()
    pos = len(head) + len(desc) + 4 * n
    for part in data_parts:
        offsets += struct.pack("<I", pos)
        pos += len(part)
    return bytes(head) + bytes(desc) + bytes(offsets) + b"".join(data_parts)


def _deserialize_roaring32(buf: bytes) -> np.ndarray:
    """Portable Roaring bytes → sorted uint32 numpy array. Handles
    array, bitmap, and run containers."""
    cookie = struct.unpack_from("<I", buf, 0)[0]
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        run_flags = np.unpackbits(
            np.frombuffer(buf, dtype=np.uint8, count=(n + 7) // 8, offset=4),
            bitorder="little",
        )[:n].astype(bool)
        pos = 4 + (n + 7) // 8
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUNCONTAINER:
        n = struct.unpack_from("<I", buf, 4)[0]
        run_flags = np.zeros(n, dtype=bool)
        pos = 8
        has_offsets = True
    else:
        raise ValueError(f"Not a portable Roaring bitmap (cookie={cookie})")
    keys = np.empty(n, dtype=np.uint32)
    cards = np.empty(n, dtype=np.int64)
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, pos + 4 * i)
        keys[i], cards[i] = k, cm1 + 1
    pos += 4 * n
    if has_offsets:
        pos += 4 * n  # container data is sequential; offsets redundant
    out = []
    for i in range(n):
        base = np.uint32(keys[i]) << np.uint32(16)
        if run_flags[i]:
            n_runs = struct.unpack_from("<H", buf, pos)[0]
            pos += 2
            runs = np.frombuffer(
                buf, dtype="<u2", count=2 * n_runs, offset=pos
            ).reshape(n_runs, 2)
            pos += 4 * n_runs
            lows = np.concatenate(
                [
                    np.arange(int(s), int(s) + int(l) + 1, dtype=np.uint32)
                    for s, l in runs
                ]
            ) if n_runs else np.empty(0, dtype=np.uint32)
        elif cards[i] <= 4096:
            lows = np.frombuffer(
                buf, dtype="<u2", count=int(cards[i]), offset=pos
            ).astype(np.uint32)
            pos += 2 * int(cards[i])
        else:
            bits = np.unpackbits(
                np.frombuffer(buf, dtype=np.uint8, count=8192, offset=pos),
                bitorder="little",
            )
            pos += 8192
            lows = np.nonzero(bits)[0].astype(np.uint32)
        out.append(lows | base)
    return np.concatenate(out) if out else np.empty(0, dtype=np.uint32)


# ---------------------------------------------------------------------------
# 64-bit RoaringBitmapArray (Delta's layering)
# ---------------------------------------------------------------------------


def serialize_positions(positions: Iterable[int]) -> bytes:
    """Sorted-or-not iterable of row positions → Delta
    RoaringBitmapArray portable bytes."""
    arr = np.unique(np.asarray(list(positions), dtype=np.uint64))
    highs = (arr >> np.uint64(32)).astype(np.uint64)
    n_bitmaps = int(highs[-1]) + 1 if len(arr) else 0
    parts = [struct.pack("<iq", ROARING_ARRAY_MAGIC, n_bitmaps)]
    for hi in range(n_bitmaps):
        lows = (arr[highs == hi] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        parts.append(_serialize_roaring32(lows))
    return b"".join(parts)


def deserialize_positions(data: bytes) -> np.ndarray:
    """Delta RoaringBitmapArray portable bytes → sorted uint64 row
    positions."""
    magic, n_bitmaps = struct.unpack_from("<iq", data, 0)
    if magic != ROARING_ARRAY_MAGIC:
        raise ValueError(f"Bad RoaringBitmapArray magic {magic}")
    pos = 12
    out = []
    buf = data[pos:]
    for hi in range(n_bitmaps):
        lows = _deserialize_roaring32(buf)
        out.append(lows.astype(np.uint64) | (np.uint64(hi) << np.uint64(32)))
        buf = buf[_roaring32_size(buf):]
    return (
        np.concatenate(out) if out else np.empty(0, dtype=np.uint64)
    )


def _roaring32_size(buf: bytes) -> int:
    """Byte length of the leading portable roaring bitmap in buf."""
    cookie = struct.unpack_from("<I", buf, 0)[0]
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        pos = 4 + (n + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(buf, dtype=np.uint8, count=(n + 7) // 8, offset=4),
            bitorder="little",
        )[:n].astype(bool)
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    else:
        n = struct.unpack_from("<I", buf, 4)[0]
        pos = 8
        run_flags = np.zeros(n, dtype=bool)
        has_offsets = True
    cards = [
        struct.unpack_from("<HH", buf, pos + 4 * i)[1] + 1 for i in range(n)
    ]
    pos += 4 * n + (4 * n if has_offsets else 0)
    for i in range(n):
        if run_flags[i]:
            n_runs = struct.unpack_from("<H", buf, pos)[0]
            pos += 2 + 4 * n_runs
        elif cards[i] <= 4096:
            pos += 2 * cards[i]
        else:
            pos += 8192
    return pos


# ---------------------------------------------------------------------------
# DV files + descriptors
# ---------------------------------------------------------------------------


def write_dv_file(
    table_path: str, dv_blobs: list[bytes]
) -> tuple[str, list[dict]]:
    """Write ONE deletion-vector .bin holding every blob of a commit
    (delta-spark's layout: a DELETE touching 10k files appends 10k
    blobs to one file, not 10k files). Returns (relative file path,
    one descriptor per blob, in input order — cardinality left for the
    caller to fill).

    The bin is assembled in driver memory and written through the
    LogStore seam, so DV commits work on pure-seam (object-store)
    tables; size is bounded by the commit's deleted-row bitmaps
    (RoaringBitmap-compressed — metadata-class, not data-class)."""
    import io

    from dask_deltalake_spark.delta.logstore import store_for

    uid = _uuid.uuid4()
    rel = f"deletion_vector_{uid}.bin"
    encoded_uuid = z85_encode(uid.bytes)
    descriptors = []
    buf = io.BytesIO()
    buf.write(b"\x01")  # format version
    offset = 1
    for blob in dv_blobs:
        buf.write(struct.pack(">i", len(blob)))
        buf.write(blob)
        buf.write(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
        descriptors.append(
            {
                "storageType": "u",
                "pathOrInlineDv": encoded_uuid,
                "offset": offset,
                "sizeInBytes": len(blob),
            }
        )
        offset += 4 + len(blob) + 4
    store_for(table_path).write_bytes(
        os.path.join(table_path, rel), buf.getvalue()
    )
    return rel, descriptors


def dv_absolute_path(table_path: str, descriptor: dict) -> Optional[str]:
    st = descriptor["storageType"]
    if st == "i":
        return None
    if st == "p":
        return descriptor["pathOrInlineDv"]
    if st == "u":
        enc = descriptor["pathOrInlineDv"]
        prefix, enc_uuid = enc[:-20], enc[-20:]
        uid = _uuid.UUID(bytes=z85_decode(enc_uuid))
        rel = f"deletion_vector_{uid}.bin"
        return os.path.join(table_path, prefix, rel) if prefix else os.path.join(
            table_path, rel
        )
    raise ValueError(f"Unknown DV storageType {st!r}")


def read_dv_bytes(table_path: str, descriptor: dict) -> bytes:
    """Descriptor → the RoaringBitmapArray data bytes (CRC-checked for
    file storage)."""
    from dask_deltalake_spark.delta.logstore import store_for

    if descriptor["storageType"] == "i":
        return z85_decode(descriptor["pathOrInlineDv"])
    path = dv_absolute_path(table_path, descriptor)
    size = int(descriptor["sizeInBytes"])
    with store_for(path).open_input(path) as f:
        f.seek(int(descriptor["offset"]))
        (length,) = struct.unpack(">i", f.read(4))
        if length != size:
            raise ValueError(
                f"DV length mismatch at {path}:{descriptor['offset']}: "
                f"{length} != descriptor sizeInBytes {size}"
            )
        data = f.read(length)
        (crc,) = struct.unpack(">I", f.read(4))
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError(f"DV checksum mismatch in {path}")
    return data


def read_dv_positions(table_path: str, descriptor: dict) -> np.ndarray:
    return deserialize_positions(read_dv_bytes(table_path, descriptor))


def strip_file_scheme(p: str) -> str:
    """'file:///x', 'file:/x' (Hadoop Path.toString), or '/x' → '/x'."""
    if p.startswith("file:"):
        p = p[5:]
        while p.startswith("//"):
            p = p[1:]
    return p


# executor-process-local cache of decoded position arrays, keyed by
# absolute file path + descriptor identity (a file's DV changes only
# via a new add action, which changes the descriptor)
_DECODE_CACHE: dict = {}


def dv_membership_predicate(spark, blob_map: dict, keep_if_member: bool):
    """Vectorized row-position predicate: a pandas UDF over
    (_metadata.file_path, _metadata.row_index). ``blob_map`` maps
    absolute file path → serialized RoaringBitmapArray bytes. With
    ``keep_if_member=False`` rows AT bitmap positions are dropped (the
    DV read semantics); with True only those rows survive (CDC change
    image extraction). The compressed bitmap BYTES (not the positions)
    are broadcast once; each executor process decodes a file's bitmap
    at most once and runs a numpy membership test per Arrow batch. No
    shuffle anywhere."""
    from pyspark.sql.functions import pandas_udf

    keyed = {
        path: ((path, zlib.crc32(blob)), blob)
        for path, blob in blob_map.items()
    }
    bc = spark.sparkContext.broadcast(keyed)

    @pandas_udf("boolean")
    def member(file_path: pd.Series, row_idx: pd.Series) -> pd.Series:
        blobs = bc.value
        out = np.full(len(file_path), not keep_if_member, dtype=bool)
        idx = row_idx.to_numpy(dtype=np.uint64, na_value=0)
        for fp in file_path.unique():
            sel = (file_path == fp).to_numpy()
            entry = blobs.get(strip_file_scheme(fp))
            if entry is None:
                continue
            cache_key, blob = entry
            positions = _DECODE_CACHE.get(cache_key)
            if positions is None:
                positions = deserialize_positions(blob)
                _DECODE_CACHE[cache_key] = positions
            isin = np.isin(idx[sel], positions)
            out[sel] = isin if keep_if_member else ~isin
        return pd.Series(out)

    return member


def dv_keep_predicate(spark, table_path: str, dv_adds: list):
    """Keep-row predicate for DV'd file scans: False at deleted
    positions (see dv_membership_predicate)."""
    from dask_deltalake_spark.delta.logstore import resolve_spark_path

    # keys must match the SCAN's _metadata.file_path, which saw the
    # JVM-resolved (scheme-mapped) paths
    scan_root = resolve_spark_path(table_path)
    blob_map = {
        os.path.abspath(os.path.join(scan_root, a.path)): read_dv_bytes(
            table_path, a.deletion_vector
        )
        for a in dv_adds
    }
    return dv_membership_predicate(spark, blob_map, keep_if_member=False)
