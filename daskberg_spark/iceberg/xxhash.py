"""Pure-Python XXH64 bit-compatible with Spark's ``xxhash64``.

The file-level Bloom index (``bloomindex.py``) builds bit positions on
EXECUTORS with the built-in ``F.xxhash64`` (JVM, codegen) and probes
them on the DRIVER at plan time — so the driver needs the exact same
hash.  This implements the public xxHash64 algorithm
(github.com/Cyan4973/xxHash, BSD spec) plus Spark's type mapping and
seed-chaining conventions:

- ``xxhash64(col, lit(seed))`` chains left-to-right from the default
  seed 42: ``h = hash(col_value, 42); h = hash(seed, h)``.
- int/date hash through the 4-byte path (``hashInt``), long/timestamp
  through the 8-byte path (``hashLong``), strings as UTF-8 bytes
  through the streaming path, booleans as int 0/1.
- Java semantics: signed 64-bit overflow wrap; ``pmod`` of the signed
  result equals Python's ``%`` for a positive modulus.

Bit-compatibility is enforced by a differential pytest
(``test_bloomindex.py``) comparing every typed path and the chain
against the real ``F.xxhash64`` across random values.
"""

from __future__ import annotations

import datetime

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_DEFAULT_SEED = 42

# shared Bloom seed battery (xxHash/Knuth-style odd constants) — ONE
# definition so the join prefilter (operators/bloomjoin.py) and the
# file-level index (iceberg/bloomindex.py) can never drift apart in
# word/bit layout
BLOOM_SEEDS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F, 0x165667B1)

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_DT = datetime.datetime(1970, 1, 1)


def _rotl(v: int, n: int) -> int:
    return ((v << n) | (v >> (64 - n))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_long(value: int, seed: int) -> int:
    """8-byte input specialization (Spark XXH64.hashLong)."""
    value &= _M64
    h = (seed + _P5 + 8) & _M64
    h ^= _rotl((value * _P2) & _M64, 31) * _P1 & _M64
    h &= _M64
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """4-byte input specialization (Spark XXH64.hashInt)."""
    h = (seed + _P5 + 4) & _M64
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M64
    h = (_rotl(h, 23) * _P2 + _P3) & _M64
    return _fmix(h)


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Streaming xxHash64 over a byte string (Spark hashUnsafeBytes;
    words read little-endian, matching the JVM on LE hardware)."""
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while off <= n - 32:
            k = int.from_bytes(data[off : off + 8], "little")
            v1 = (_rotl((v1 + k * _P2) & _M64, 31) * _P1) & _M64
            k = int.from_bytes(data[off + 8 : off + 16], "little")
            v2 = (_rotl((v2 + k * _P2) & _M64, 31) * _P1) & _M64
            k = int.from_bytes(data[off + 16 : off + 24], "little")
            v3 = (_rotl((v3 + k * _P2) & _M64, 31) * _P1) & _M64
            k = int.from_bytes(data[off + 24 : off + 32], "little")
            v4 = (_rotl((v4 + k * _P2) & _M64, 31) * _P1) & _M64
            off += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while off <= n - 8:
        k = int.from_bytes(data[off : off + 8], "little")
        h ^= (_rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        off += 8
    if off <= n - 4:
        k = int.from_bytes(data[off : off + 4], "little")
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        off += 4
    while off < n:
        h ^= (data[off] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        off += 1
    return _fmix(h)


# iceberg type → Spark hash path; types absent here (float/double with
# their -0.0/NaN normalization, decimal, binary) are simply not
# bloom-probed — the index stays conservative
def hash_typed(value, type_str: str, seed: int) -> int | None:
    """Spark ``xxhash64`` of one typed value with ``seed``; None when
    the type has no supported bit-exact mapping (caller must not
    prune)."""
    if value is None:
        return seed & _M64  # Spark leaves the hash unchanged for NULL
    if type_str in ("long", "int"):
        # bools are ints in Python; anything else non-integral means a
        # value shape this mapping does not cover → None (never prune)
        if not isinstance(value, int):
            return None
        return (
            xxh64_long(value, seed)
            if type_str == "long"
            else xxh64_int(value, seed)
        )
    if type_str == "boolean":
        return xxh64_int(1 if value else 0, seed)
    if type_str == "date":
        if isinstance(value, datetime.datetime):
            value = value.date()
        if isinstance(value, datetime.date):
            value = (value - _EPOCH_DATE).days
        if not isinstance(value, int):
            return None
        return xxh64_int(value, seed)
    if type_str in ("timestamp", "timestamptz", "timestampz"):
        if isinstance(value, datetime.date) and not isinstance(
            value, datetime.datetime
        ):
            # bounds comparisons promote a date filter value against a
            # timestamp column (planner._vector_elem) — hash the same
            # midnight the residual filter compares against
            value = datetime.datetime(value.year, value.month, value.day)
        if isinstance(value, datetime.datetime):
            if value.tzinfo is not None:
                value = value.astimezone(datetime.timezone.utc).replace(
                    tzinfo=None
                )
            delta = value - _EPOCH_DT
            # exact integer micros: float total_seconds() rounds the
            # last microsecond for ~1% of values, which would silently
            # desync this hash from Spark's and prune LIVE files
            value = (
                delta.days * 86_400 + delta.seconds
            ) * 1_000_000 + delta.microseconds
        if not isinstance(value, int):
            return None
        return xxh64_long(value, seed)
    if type_str == "string":
        return xxh64_bytes(str(value).encode("utf-8"), seed)
    return None


def to_signed64(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_chain(value, type_str: str, extra_seed: int) -> int | None:
    """Signed-long result of Spark ``xxhash64(col, lit(extra_seed)
    .cast('long'))`` for one value, or None if unsupported."""
    h = hash_typed(value, type_str, SPARK_DEFAULT_SEED)
    if h is None:
        return None
    return to_signed64(xxh64_long(int(extra_seed), h))
