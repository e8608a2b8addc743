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


def test_predicate_type_coercion_is_pruning_sound():
    """Regression battery: predicate literals whose python type differs
    from the column type must transform to the SAME partition value the
    writer stored, or the matching file is silently pruned."""
    import datetime as dt
    import uuid as uuid_mod
    from decimal import Decimal

    from daskberg_spark.iceberg.transforms import (
        bucket,
        coerce_for_transform,
        truncate,
    )

    # uuid: the planner canonicalizes to string; the hash needs 16 bytes
    u = "f79c3e09-677c-4bbd-a479-3f349cb785e7"
    assert bucket(coerce_for_transform(u, "uuid"), 16) == bucket(
        uuid_mod.UUID(u), 16
    )
    # integral float literal on a long column hashes as the long
    assert bucket(coerce_for_transform(34.0, "long"), 100) == bucket(34, 100)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        coerce_for_transform(34.5, "long")  # no exact image → no prune
    # decimal: unscaled at the COLUMN scale, not the literal's
    assert bucket(
        coerce_for_transform(Decimal("14.2"), "decimal(9,2)"), 100
    ) == bucket(Decimal("14.20"), 100)
    assert truncate(
        coerce_for_transform(Decimal("1E+2"), "decimal(9,2)"), 50
    ) == truncate(Decimal("100.00"), 50)
    # int literal on a double column hashes as the double
    assert bucket(coerce_for_transform(34, "double"), 100) == bucket(
        34.0, 100
    )
    # time values hash as micros-since-midnight longs
    assert bucket(dt.time(12, 0), 100) == bucket(
        12 * 3600 * 1_000_000, 100
    )


def test_nan_bucket_canonicalizes_like_doubleToLongBits():
    import struct as st

    from daskberg_spark.iceberg.transforms import bucket

    payload_nan = st.unpack("<d", (0xFFF8000000000001).to_bytes(8, "little"))[0]
    assert bucket(payload_nan, 100) == bucket(float("nan"), 100)


def test_invalid_zero_width_transforms_rejected():
    import pytest as _pytest

    from daskberg_spark.iceberg.transforms import get_transform

    with _pytest.raises(NotImplementedError, match="invalid"):
        get_transform("bucket[0]")
    with _pytest.raises(NotImplementedError, match="invalid"):
        get_transform("truncate[0]")


def test_planner_keeps_files_when_transform_cannot_take_value():
    """A predicate value with no sound transform image must degrade to
    'cannot prune' instead of crashing the whole plan."""
    from daskberg_spark.iceberg.planner import FieldInfo, apply_filters

    fields = {
        "b": FieldInfo(
            field_id=1,
            type="long",
            transform="bucket[16]",
            partition_name="b_bucket",
        )
    }
    files = [
        {"file_path": "f0", "partition": {"b_bucket": 3}, "_spec_id": 0}
    ]
    # non-integral float: no long can equal it, but pruning must not crash
    out = apply_filters(files, [("b", "==", 3.5)], fields)
    assert [f["file_path"] for f in out] == ["f0"]
    # integral float coerces and prunes exactly like the int
    from daskberg_spark.iceberg.transforms import bucket as _bucket

    hit = _bucket(3, 16)
    files2 = [
        {"file_path": "hit", "partition": {"b_bucket": hit}, "_spec_id": 0},
        {
            "file_path": "miss",
            "partition": {"b_bucket": (hit + 1) % 16},
            "_spec_id": 0,
        },
    ]
    out2 = apply_filters(files2, [("b", "==", 3.0)], fields)
    assert [f["file_path"] for f in out2] == ["hit"]
