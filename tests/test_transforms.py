"""Partition transform tests against Iceberg spec Appendix B vectors."""

from __future__ import annotations

import datetime
import uuid
from decimal import Decimal

import pytest

from daskberg_spark.iceberg.transforms import (
    bucket,
    day,
    get_transform,
    hour,
    month,
    murmur3_x86_32,
    _bucket_hash_bytes,
    truncate,
    year,
)

SPEC_VECTORS = [
    (34, 2017239379),  # int hashes as 8-byte LE long
    (1.0, -142385009),  # float/double as LE double bits
    (Decimal("14.20"), -500754589),  # minimal big-endian unscaled
    (datetime.date(2017, 11, 16), -653330422),  # epoch days as long
    (datetime.datetime(2017, 11, 16, 22, 31, 8), -2047944441),  # micros as long
    ("iceberg", 1210000089),  # UTF-8
    (uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7"), 1488055340),
    (b"\x00\x01\x02\x03", -188683207),
]


@pytest.mark.parametrize("value,expected", SPEC_VECTORS)
def test_spec_hash_vectors(value, expected):
    assert murmur3_x86_32(_bucket_hash_bytes(value)) == expected


def test_time_hash_vector():
    micros = (22 * 3600 + 31 * 60 + 8) * 1_000_000  # 22:31:08
    assert murmur3_x86_32(_bucket_hash_bytes(micros)) == -662762989


def test_bucket_range_and_null():
    assert bucket(None, 16) is None
    for v in (0, -1, 34, "x", 1.5):
        assert 0 <= bucket(v, 16) < 16
    # int and long of the same value land in the same bucket (spec requirement)
    assert bucket(34, 7) == bucket(34, 7)


def test_truncate_spec_examples():
    assert truncate(1, 10) == 0
    assert truncate(-1, 10) == -10  # floored, not toward zero
    assert truncate(Decimal("10.65"), 50) == Decimal("10.50")
    assert truncate("iceberg", 3) == "ice"
    assert truncate(b"iceberg", 3) == b"ice"


def test_temporal_transforms():
    ts = datetime.datetime(2017, 11, 16, 22, 31, 8)
    assert year(ts) == 47
    assert month(ts) == (2017 - 1970) * 12 + 10
    assert day(ts) == (datetime.date(2017, 11, 16) - datetime.date(1970, 1, 1)).days
    assert hour(ts) == day(ts) * 24 + 22
    # pre-epoch
    assert year(datetime.date(1969, 12, 31)) == -1


def test_get_transform_dispatch():
    fn, ordered = get_transform("bucket[4]")
    assert not ordered and fn("a") == bucket("a", 4)
    fn, ordered = get_transform("truncate[10]")
    assert ordered and fn(17) == 10
    fn, ordered = get_transform("identity")
    assert ordered and fn("z") == "z"
    fn, ordered = get_transform("void")
    assert not ordered and fn(123) is None
    with pytest.raises(NotImplementedError):
        get_transform("zorder[2]")


def test_decimal_bucket_minimal_twos_complement():
    """-2^(8k-1) unscaled values must encode minimally (spec): -128 is one
    byte 0x80, not two bytes 0xff80 — a non-minimal encoding changes the
    murmur3 bucket and silently breaks equality pruning against
    spec-compliant external writers (round-1 ADVICE transforms.py:92)."""
    from daskberg_spark.iceberg.conversions import min_signed_bytes
    from daskberg_spark.iceberg.transforms import _bucket_hash_bytes

    assert _bucket_hash_bytes(Decimal("-1.28")) == b"\x80"
    assert _bucket_hash_bytes(Decimal("1.28")) == b"\x00\x80"  # sign byte
    assert min_signed_bytes(0) == b"\x00"
    assert min_signed_bytes(127) == b"\x7f"
    assert min_signed_bytes(-32768) == b"\x80\x00"
    # spec worked example is unaffected
    assert _bucket_hash_bytes(Decimal("14.20")) == b"\x05\x8c"


def test_tz_aware_datetime_transforms():
    """Aware datetimes normalize to naive UTC instead of raising TypeError
    on naive-epoch arithmetic (round-1 ADVICE transforms.py:103)."""
    aware = datetime.datetime(
        2020, 6, 1, 5, 30, tzinfo=datetime.timezone(datetime.timedelta(hours=2))
    )
    naive_utc = datetime.datetime(2020, 6, 1, 3, 30)
    assert hour(aware) == hour(naive_utc)
    assert day(aware) == day(naive_utc)
    assert month(aware) == month(naive_utc)
    assert bucket(aware, 16) == bucket(naive_utc, 16)
    # ISO string with offset (normalize_value output for timestamptz)
    assert hour("2020-06-01T05:30:00+02:00") == hour(naive_utc)
