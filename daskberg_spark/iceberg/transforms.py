"""Iceberg partition transforms, spec-correct and pure Python.

Reference counterpart: ``/root/reference/daskberg/conversions.py:48-87``
(identity/bucket/truncate/day/void via the ``mmh3`` package).  ``mmh3`` is
not available here, so ``murmur3_x86_32`` is implemented from the public
MurmurHash3 reference algorithm and validated against the test vectors in
the Iceberg spec (Appendix B) — this matters because Spark's builtin
``hash()`` uses a different seed/encoding and must NOT be reused for
Iceberg bucket values (SURVEY.md §2 A7b).

Order-preserving transforms (identity, truncate, year/month/day/hour) admit
range-predicate pruning; bucket is not order-preserving, so the planner
only prunes ``==`` / ``in`` / ``!=`` through it.
"""

from __future__ import annotations

import datetime
import re
import struct
import uuid as _uuid
from decimal import Decimal
from typing import Any, Callable

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_DT = datetime.datetime(1970, 1, 1)

_BUCKET_RE = re.compile(r"bucket\[\s*(\d+)\s*\]")
_TRUNCATE_RE = re.compile(r"truncate\[\s*(\d+)\s*\]")

_MASK32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """32-bit MurmurHash3 (x86 variant), returns a signed int32."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _MASK32
    nblocks = len(data) // 4
    for i in range(nblocks):
        (k,) = struct.unpack_from("<I", data, i * 4)
        k = (k * c1) & _MASK32
        k = _rotl32(k, 15)
        k = (k * c2) & _MASK32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _MASK32
    # tail
    k = 0
    tail = data[nblocks * 4 :]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & _MASK32
        k = _rotl32(k, 15)
        k = (k * c2) & _MASK32
        h ^= k
    # finalize
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _bucket_hash_bytes(value: Any) -> bytes:
    """Iceberg bucket-hash byte encoding of a value (spec Appendix B).

    int/long/date/time/timestamp all hash as 8-byte little-endian longs
    (so ``bucket(34 as int) == bucket(34L)``); float/double as the 8-byte
    little-endian double bits; string as UTF-8; decimal as minimal
    big-endian unscaled bytes; uuid as 16 big-endian bytes.
    """
    if isinstance(value, bool):
        raise NotImplementedError("bucket[boolean] is not defined by the spec")
    if isinstance(value, int):
        return value.to_bytes(8, "little", signed=True)
    if isinstance(value, float):
        if value == 0.0:
            value = 0.0  # -0.0 → +0.0 per spec
        if value != value:
            # doubleToLongBits semantics: every NaN payload canonicalizes
            # to the quiet NaN before hashing, or NaN rows would land in
            # different buckets than spec-compliant engines compute
            return (0x7FF8000000000000).to_bytes(8, "little")
        return struct.pack("<d", value)
    if isinstance(value, datetime.time):
        micros = (
            (value.hour * 3600 + value.minute * 60 + value.second) * 1_000_000
            + value.microsecond
        )
        return micros.to_bytes(8, "little", signed=True)
    if isinstance(value, Decimal):
        from daskberg_spark.iceberg.conversions import min_signed_bytes

        unscaled = int(value.scaleb(-value.as_tuple().exponent))
        return min_signed_bytes(unscaled)
    if isinstance(value, str):
        # strings ALWAYS hash as UTF-8 (spec); uuid-typed columns must be
        # normalized to uuid.UUID before reaching here — guessing UUID-ness
        # from string shape would mis-bucket string columns holding
        # UUID-formatted text
        return value.encode("utf-8")
    if isinstance(value, _uuid.UUID):
        return value.bytes
    if isinstance(value, datetime.datetime):
        from daskberg_spark.iceberg.conversions import datetime_to_micros

        # integer-exact: float total_seconds() is off by ≥1 µs beyond
        # ~year 2112 (incl. the 9999-12-31 sentinel) — a wrong micro
        # flips the murmur3 bucket and silently prunes matching files
        micros = datetime_to_micros(_naive_utc(value))
        return micros.to_bytes(8, "little", signed=True)
    if isinstance(value, datetime.date):
        days = (value - _EPOCH_DATE).days
        return days.to_bytes(8, "little", signed=True)
    if isinstance(value, (bytes, bytearray)):
        return bytes(value)
    raise NotImplementedError(f"bucket hash for {type(value)}")


def bucket(value: Any, n: int) -> int | None:
    if value is None:
        return None
    h = murmur3_x86_32(_bucket_hash_bytes(value))
    return (h & 0x7FFFFFFF) % n


def truncate(value: Any, width: int) -> Any:
    if value is None:
        return None
    if isinstance(value, int):
        return value - (value % width)  # Python % is floored: correct for negatives
    if isinstance(value, Decimal):
        scale = -value.as_tuple().exponent
        unscaled = int(value.scaleb(scale))
        return Decimal(unscaled - (unscaled % width)).scaleb(-scale)
    if isinstance(value, (str, bytes)):
        return value[:width]
    raise NotImplementedError(f"truncate for {type(value)}")


def _naive_utc(dt: datetime.datetime) -> datetime.datetime:
    """tz-aware → naive UTC; epoch arithmetic against the naive _EPOCH_DT
    would otherwise raise TypeError (e.g. a timestamptz ISO string parsed
    with an offset) instead of transforming — round-1 ADVICE."""
    if dt.tzinfo is not None:
        dt = dt.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return dt


def _to_datetime(value: Any) -> datetime.datetime:
    if isinstance(value, datetime.datetime):
        return _naive_utc(value)
    if isinstance(value, datetime.date):
        return datetime.datetime(value.year, value.month, value.day)
    if isinstance(value, str):
        return _naive_utc(datetime.datetime.fromisoformat(value))
    raise NotImplementedError(f"temporal transform for {type(value)}")


def year(value: Any) -> int | None:
    if value is None:
        return None
    return _to_datetime(value).year - 1970


def month(value: Any) -> int | None:
    if value is None:
        return None
    dt = _to_datetime(value)
    return (dt.year - 1970) * 12 + dt.month - 1


def day(value: Any) -> int | None:
    """datetime/date → epoch days (ordered; the manifest stores int days)."""
    if value is None:
        return None
    dt = _to_datetime(value)
    return (dt.date() - _EPOCH_DATE).days


def hour(value: Any) -> int | None:
    if value is None:
        return None
    from daskberg_spark.iceberg.conversions import datetime_to_micros

    dt = _to_datetime(value)
    # integer floor-division: the float path rounds across hour
    # boundaries in far-out years
    return datetime_to_micros(dt) // 3_600_000_000


import functools


@functools.lru_cache(maxsize=None)
def get_transform(name: str) -> tuple[Callable[[Any], Any], bool]:
    """transform spec string → (fn, order_preserving).

    ``order_preserving=False`` (bucket, void) restricts pruning to
    equality-shaped predicates.
    """
    if name == "identity":
        return (lambda v: v), True
    if name == "void":
        return (lambda v: None), False
    if name == "year":
        return year, True
    if name == "month":
        return month, True
    if name == "day":
        return day, True
    if name == "hour":
        return hour, True
    m = _BUCKET_RE.fullmatch(name)
    if m:
        n = int(m.group(1))
        if n < 1:
            # a zero width would defer to a ZeroDivisionError deep in
            # predicate evaluation — invalid specs fail at resolve time
            raise NotImplementedError(f"invalid transform {name!r}")
        return (lambda v, n=n: bucket(v, n)), False
    m = _TRUNCATE_RE.fullmatch(name)
    if m:
        w = int(m.group(1))
        if w < 1:
            raise NotImplementedError(f"invalid transform {name!r}")
        return (lambda v, w=w: truncate(v, w)), True
    raise NotImplementedError(f"partition transform {name!r}")


_DEC_SCALE_RE = re.compile(r"decimal\(\s*\d+\s*,\s*(\d+)\s*\)")


def coerce_for_transform(value: Any, source_type: str | None) -> Any:
    """Coerce a PREDICATE value to the column type's domain before a
    partition transform: bucket/truncate dispatch on the python runtime
    type, so a float literal against a long column, a canonical-string
    uuid, or a short-scale Decimal would transform differently than the
    writer stored — silent row loss through partition pruning.  Raises
    NotImplementedError when no exact coercion exists (callers must then
    treat the predicate as un-prunable, never guess)."""
    if value is None or source_type is None:
        return value
    t = source_type
    if t == "uuid" and isinstance(value, str):
        return _uuid.UUID(value)
    if t in ("int", "long") and isinstance(value, float):
        if value != value or value in (
            float("inf"),
            float("-inf"),
        ) or int(value) != value:
            raise NotImplementedError(
                "non-integral float against an integer column has no "
                "exact transform image"
            )
        return int(value)
    if (
        t in ("float", "double")
        and isinstance(value, int)
        and not isinstance(value, bool)
    ):
        return float(value)
    m = _DEC_SCALE_RE.fullmatch(t)
    if m and isinstance(value, Decimal):
        # the spec transforms the UNSCALED value at the COLUMN's scale:
        # Decimal('14.2') against decimal(9,2) must hash/truncate as
        # unscaled 1420, not 142 — and a value needing MORE scale has
        # no exact image
        exp = Decimal(1).scaleb(-int(m.group(1)))
        try:
            q = value.quantize(exp)
        except Exception:
            raise NotImplementedError("decimal out of column range")
        if q != value:
            raise NotImplementedError(
                "decimal predicate exceeds the column scale"
            )
        return q
    return value
