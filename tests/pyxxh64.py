"""Pure-Python XXH64 — an independent oracle for Spark's `xxhash64`.

Implements the public xxHash64 specification (Yann Collet,
https://github.com/Cyan4973/xxHash — BSD; algorithm reimplemented from the
published spec, no code copied) plus the Spark-specific composition rules of
`org.apache.spark.sql.catalyst.expressions.XxHash64`:

* default seed 42;
* IntegerType hashed as the 4 little-endian two's-complement bytes,
  LongType as the 8 little-endian bytes (Spark's dedicated hashInt/hashLong
  fast paths are algebraically identical to hashing those byte strings);
* StringType hashed as its UTF-8 bytes;
* ArrayType hashed by seed-chaining element hashes (seed -> h(e0) -> ...);
* multi-argument xxhash64(c1, c2, ...) seed-chains across arguments.

This module exists so the production-hash twin queries (q29p/q31p/...)
can be VALUE-verified against an engine-independent implementation — the
same role DuckDB plays for the md5-family queries.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1

SPARK_DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M64, 31) * _P1) & _M64


def _merge_round(h: int, v: int) -> int:
    return ((h ^ _round(0, v)) * _P1 + _P4) & _M64


def xxh64(data: bytes, seed: int = SPARK_DEFAULT_SEED) -> int:
    """XXH64 of a byte string (unsigned 64-bit result)."""
    length = len(data)
    i = 0
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        limit = length - 32
        while i <= limit:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + length) & _M64
    while i + 8 <= length:
        k1 = _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h ^ k1, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= length:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < length:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _to_unsigned(s: int) -> int:
    return s & _M64


def xxh64_int(value: int, seed: int) -> int:
    """Spark hash of an IntegerType value (4 LE two's-complement bytes)."""
    return xxh64((value & 0xFFFFFFFF).to_bytes(4, "little"), seed)


def xxh64_long(value: int, seed: int) -> int:
    """Spark hash of a LongType value (8 LE two's-complement bytes)."""
    return xxh64((value & _M64).to_bytes(8, "little"), seed)


def spark_xxhash64(*values, seed: int = SPARK_DEFAULT_SEED) -> int:
    """Replicates Spark `F.xxhash64(*cols)` on Python values, returning the
    SIGNED 64-bit result Spark produces. Supported value types: str (hashed
    as UTF-8), ('int', i) tags or plain small ints treated as IntegerType
    ONLY when wrapped, int = LongType, list/tuple of ints = array<long>
    (seed-chained), None (skipped, like Spark's null)."""
    h = seed
    for v in values:
        h = _hash_one(v, h)
    return _to_signed(h)


def _hash_one(v, seed: int) -> int:
    if v is None:
        return seed
    if isinstance(v, str):
        return xxh64(v.encode("utf-8"), seed)
    if isinstance(v, bytes):
        return xxh64(v, seed)
    if isinstance(v, tuple) and len(v) == 2 and v[0] == "int":
        return xxh64_int(v[1], seed)
    if isinstance(v, int):
        return xxh64_long(v, seed)
    if isinstance(v, (list,)):
        h = seed
        for e in v:
            if e is not None:
                h = _hash_one(e, h)
        return h
    raise TypeError(f"unsupported value for spark_xxhash64: {type(v)}")
