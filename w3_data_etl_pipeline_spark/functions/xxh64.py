"""Spark-compatible xxHash64 in pure Python (+ a numpy fast path).

The streaming SINK (streaming/source.py, LakeTableStreamSink) must
assign each incoming row to its key bucket on EXECUTORS, where no
SparkSession exists — and the bucket function is
``pmod(xxhash64(*keys), n_buckets)`` with Spark's seed-42 chained
column hashing (plans/laketable.py _bucket_expr). A row hashed into
the wrong bucket silently duplicates its key (see _align_keys), so
this twin must be BIT-EXACT with Spark's `XXH64`:

* one column: ``xxh64(encoded, seed=42)``
* chained columns: each column's hash seeds the next
  (``hash = xxh64(col_i, seed=hash_prev)``), NULL columns skipped
* integral types encode as 8-byte little-endian longs (Spark hashes
  byte/short/int/long all through ``hashLong``; its specialized
  hashLong is algebraically the standard XXH64 of the 8-byte block)
* strings encode as UTF-8, doubles as IEEE bits via ``hashLong``

Parity is pytest-pinned against ``F.xxhash64`` over randomized longs
and strings (tests/test_stream_sink.py) — the definitive oracle.
"""

from __future__ import annotations

import struct

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int) -> int:
    """Standard XXH64 of ``data`` with ``seed`` (unsigned result)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            (l1, l2, l3, l4) = struct.unpack_from("<QQQQ", data, i)
            v1, v2 = _round(v1, l1), _round(v2, l2)
            v3, v4 = _round(v3, l3), _round(v4, l4)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        (k1,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k1)
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(values, seed: int = 42) -> int:
    """Spark's ``xxhash64(col1, col2, ...)`` for one row: chained
    seeds, NULLs skipped, SIGNED 64-bit result. Supports int (as
    long), float (as IEEE-bits long), str and bytes values."""
    h = seed & _M
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool):
            enc = struct.pack("<q", 1 if v else 0)
        elif isinstance(v, int):
            enc = struct.pack("<q", v)
        elif isinstance(v, float):
            enc = struct.pack("<q", struct.unpack("<q", struct.pack("<d", v))[0])
        elif isinstance(v, str):
            enc = v.encode("utf-8")
        elif isinstance(v, (bytes, bytearray)):
            enc = bytes(v)
        else:
            raise TypeError(f"unhashable key type for spark_xxhash64: {type(v)}")
        h = xxh64(enc, h)
    return _signed(h)


def bucket_of(values, n_buckets: int, seed: int = 42) -> int:
    """``pmod(xxhash64(*keys), n_buckets)`` — LakeTable._bucket_expr's
    exact bucket assignment, computed without a SparkSession."""
    return spark_xxhash64(values, seed) % n_buckets
