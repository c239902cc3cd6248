"""Pure-Python XXH64 matching Spark SQL's ``xxhash64`` bit-for-bit.

Spark's ``xxhash64(c1, c2, ...)`` chains the standard XXH64 algorithm
over the column values with running seeds, starting at seed 42:

    h = 42
    for each column value v (left to right):
        h = hash_<type>(v, seed=h)

where strings hash their UTF-8 bytes through the full streaming XXH64,
ints hash as a 4-byte block and longs as an 8-byte block (the dedicated
``hashInt`` / ``hashLong`` finalizers of the XXH64 spec).

Used to generate DuckDB-side oracle inputs for the MinHash/SimHash
queries: DuckDB has no xxhash64, but the signatures/fingerprints can be
recomputed here (deterministically, from the same parquet) and injected
into the oracle SQL, so the *banding + bucket-join + verification*
relational logic is still independently checked by DuckDB.

The XXH64 algorithm is public (Yann Collet, BSD); this is a from-scratch
Python transcription of the spec, validated against Spark in
tests/test_xxh.py.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _u(seed: int) -> int:
    return seed & _M


def hash_long(v: int, seed: int) -> int:
    """XXH64 of one 8-byte block (Spark's hashLong path for LongType)."""
    v &= _M
    h = (_u(seed) + _P5 + 8) & _M
    h ^= _round(0, v)
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_int(v: int, seed: int) -> int:
    """XXH64 of one 4-byte block (Spark's hashInt path for IntegerType)."""
    h = (_u(seed) + _P5 + 4) & _M
    h ^= ((v & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_bytes(b: bytes, seed: int) -> int:
    """Full streaming XXH64 over a byte string (Spark's path for
    StringType/BinaryType: UTF-8 bytes)."""
    n = len(b)
    i = 0
    seed = _u(seed)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(b[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(b[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(b[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(b[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(b[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(b[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (b[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64(*values, seed: int = SPARK_SEED) -> int:
    """Spark's ``xxhash64(...)``: chain over values with running seed,
    return a SIGNED 64-bit int (Spark LongType). Python ints are hashed
    by Spark's literal type rules: 32-bit-representable ints as
    IntegerType (hashInt), larger as LongType (hashLong); pass
    ``Long(v)`` to force the long path."""
    h = seed & _M
    for v in values:
        if isinstance(v, Long):
            h = hash_long(int(v), h)
        elif isinstance(v, bool):
            raise TypeError("boolean hashing not implemented")
        elif isinstance(v, int):
            if -(1 << 31) <= v < (1 << 31):
                h = hash_int(v, h)
            else:
                h = hash_long(v, h)
        elif isinstance(v, str):
            h = hash_bytes(v.encode("utf-8"), h)
        elif isinstance(v, (bytes, bytearray)):
            h = hash_bytes(bytes(v), h)
        else:
            raise TypeError(f"unsupported type {type(v)}")
    return _signed(h)


class Long(int):
    """Marker: hash this int through the LongType path regardless of
    magnitude (Spark column values of LongType, e.g. minhash columns)."""
