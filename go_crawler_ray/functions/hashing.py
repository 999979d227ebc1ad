"""Vectorized CRC-32 kernels over Arrow string arrays.

The crawl's hot paths hash every URL at least twice (corpus-index lookup
in the fetch stage, seen-shard routing in the dedup stage). A per-row
``zlib.crc32`` Python loop was the measured driver-serial floor behind
round 1's 0.743 scaling efficiency, so these kernels compute the same
values with one numpy pass per byte position (URLs are short, ~60-80
bytes): a table-driven CRC advanced simultaneously for every row.

``crc32_many(arr)`` == ``[zlib.crc32(s.encode()) for s in arr]`` exactly;
``reverse=True`` hashes each row's bytes reversed (the independent second
map of the 64-bit key — see stages/fetch._hash_urls).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_POLY = np.uint32(0xEDB88320)


def _make_table() -> np.ndarray:
    t = np.empty(256, dtype=np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
        t[i] = c
    return t


_TABLE = _make_table()


def _offsets_data(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(row byte offsets, flat byte buffer) of a string/binary array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    odt = (np.int64 if pa.types.is_large_string(arr.type)
           or pa.types.is_large_binary(arr.type) else np.int32)
    o = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return o, data


def crc32_many(arr, reverse: bool = False) -> np.ndarray:
    """Per-row crc32 (uint32) of an Arrow string/binary array.

    ``reverse=True`` computes crc32 of each row's reversed bytes — a
    genuinely different GF(2)-linear map, so pairing it with the forward
    pass yields a 64-bit key whose joint collisions are ~2^-64.
    """
    if isinstance(arr, list):
        arr = pa.array(arr, pa.string())
    o, data = _offsets_data(arr)
    n = len(o) - 1
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    starts, ends = o[:-1], o[1:]
    ln = ends - starts
    h = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    maxlen = int(ln.max()) if n else 0
    for p in range(maxlen):
        active = np.nonzero(ln > p)[0]
        idx = (ends[active] - 1 - p) if reverse else (starts[active] + p)
        b = data[idx]
        ha = h[active]
        h[active] = (ha >> np.uint32(8)) ^ _TABLE[(ha ^ b) & np.uint32(0xFF)]
    return h ^ np.uint32(0xFFFFFFFF)


def hash64_many(arr) -> np.ndarray:
    """(crc32(b) << 32) | crc32(reversed b) per row, as uint64 — the
    corpus-index / cuckoo key (matches stages.fetch-style scalar hashing
    bit for bit)."""
    f = crc32_many(arr).astype(np.uint64)
    r = crc32_many(arr, reverse=True).astype(np.uint64)
    return (f << np.uint64(32)) | r
