"""The shared group-key codec (groupkeys.py, r15).

r14 left the two statistics families with different timestamp key
encodings: theta's Arrow builder saw session-TZ-AWARE datetimes and
normalized to UTC, while the quantile family's ``collect()`` passes
saw driver-SYSTEM-local NAIVE datetimes and encoded them verbatim —
under any non-UTC driver the LTZ key spaces disagreed and decoded
keys shifted.  The r15 codec is TYPE-aware, matching Iceberg's own
semantics: ``timestamp`` (Spark NTZ) keys are WALL CLOCKS encoded
verbatim and decoded naive; ``timestamptz`` keys are INSTANTS always
stored UTC-naive and decoded aware-UTC.

These tests patch the process TZ (``time.tzset``) to a non-UTC,
non-DST zone with a NON-WHOLE-HOUR offset and assert both families
produce the SAME keys, that they match the wall-clock/instant truth,
and that stats-route answers equal scan-route answers.  The JVM keeps
its own (UTC) zone — exactly the asymmetric deployment the codec must
survive.
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pytest

TZ = "Asia/Kathmandu"  # +05:45, no DST — maximally misaligned


@pytest.fixture()
def kathmandu_tz():
    old = os.environ.get("TZ")
    os.environ["TZ"] = TZ
    time.tzset()
    yield
    if old is None:
        os.environ.pop("TZ", None)
    else:
        os.environ["TZ"] = old
    time.tzset()


def test_codec_roundtrip_under_nonutc_system_tz(kathmandu_tz):
    from daskberg_spark.iceberg.groupkeys import (
        decode_group_value,
        encode_group_value,
    )

    # --- LTZ (timestamptz): instant semantics -------------------------
    instant = dt.datetime(2024, 3, 1, 12, 30, 0, 250,
                          tzinfo=dt.timezone.utc)
    # the collect() path: fromInternal yields system-local NAIVE
    naive_local = instant.astimezone().replace(tzinfo=None)
    assert naive_local.hour == 18 and naive_local.minute == 15  # +05:45
    # the Arrow path: session-TZ-stamped AWARE
    aware_session = instant.astimezone(
        dt.timezone(dt.timedelta(hours=-4))
    )
    want = "2024-03-01T12:30:00.000250"
    assert encode_group_value(naive_local, "timestamptz") == want
    assert encode_group_value(aware_session, "timestamptz") == want
    assert encode_group_value(instant, "timestamptz") == want
    back = decode_group_value(want, "timestamptz")
    assert back == instant and back.tzinfo is not None
    assert encode_group_value(back, "timestamptz") == want

    # --- NTZ (timestamp): wall-clock semantics ------------------------
    wall = dt.datetime(2024, 3, 1, 22, 10, 0)
    assert encode_group_value(wall, "timestamp") == "2024-03-01T22:10:00"
    assert encode_group_value(wall) == "2024-03-01T22:10:00"  # default
    ntz_back = decode_group_value("2024-03-01T22:10:00", "timestamp")
    assert ntz_back == wall and ntz_back.tzinfo is None

    # non-temporal passthrough unchanged
    assert encode_group_value(dt.date(2024, 3, 1)) == "2024-03-01"
    assert decode_group_value("2024-03-01", "date") == dt.date(2024, 3, 1)
    assert decode_group_value("7", "long") == 7
    assert decode_group_value(None, "timestamptz") is None


def _make_table(tmp_path, name, ice_type, rows):
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / name),
        [
            {"id": 1, "name": "ts", "type": ice_type, "required": False},
            {"id": 2, "name": "u", "type": "long", "required": False},
        ],
    )
    w.append(rows)
    return w


def _key_spaces(spark, w):
    """(theta keys, quantile keys) for an hour(ts) grouping on u."""
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)

    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.quantiles import (
        write_grouped_quantile_statistics,
    )
    from daskberg_spark.iceberg.theta import write_grouped_theta_statistics

    write_grouped_theta_statistics(w, spark, ["hour(ts)"], ["u"])
    write_grouped_quantile_statistics(w, spark, ["hour(ts)"], ["u"])
    t = IcebergTable(w.path)
    theta = {
        g["key"][0]
        for g in t.grouped_column_ndv("u", ["hour(ts)"])["groups"]
    }
    quant = {
        g["key"][0]
        for g in t.grouped_column_quantiles("u", ["hour(ts)"])["groups"]
    }
    return t, theta, quant


def test_ntz_keys_are_wall_clocks_under_nonutc_system_tz(
    spark, tmp_path, kathmandu_tz
):
    """Iceberg ``timestamp`` (NTZ) base: hour(ts) keys are the WALL
    CLOCK truncated — both families agree, TZ plays no part."""
    base = dt.datetime(2024, 3, 1, 22, 10)  # crosses a UTC day edge
    rows = [
        {"ts": base + dt.timedelta(hours=i % 4, minutes=i % 7),
         "u": i % 13}
        for i in range(120)
    ]
    w = _make_table(tmp_path, "ntz", "timestamp", rows)
    t, theta_keys, quant_keys = _key_spaces(spark, w)
    assert theta_keys == quant_keys, (theta_keys, quant_keys)
    truth_keys = {
        r["ts"].replace(minute=0, second=0, microsecond=0).isoformat()
        for r in rows
    }
    assert theta_keys == truth_keys, (theta_keys, truth_keys)
    # stats route == scan route, keys collect as naive NTZ walls
    from pyspark.sql import functions as F

    out = t.ndv_groupby(spark, "u", ["hour(ts)"])
    assert t.last_ndv_groupby["route"] == "stats"
    got = {r["hour(ts)"]: r["ndv"] for r in out.collect()}
    truth = {
        r["h"]: r["ndv"]
        for r in t.to_df(spark)
        .groupBy(
            F.date_trunc("hour", F.col("ts").cast("timestamp"))
            .cast("timestamp_ntz")
            .alias("h")
        )
        .agg(F.count_distinct("u").alias("ndv"))
        .collect()
    }
    assert got == truth, (got, truth)
    assert all(k.tzinfo is None for k in got)


def test_ltz_keys_are_utc_instants_under_nonutc_system_tz(
    spark, tmp_path, kathmandu_tz
):
    """Iceberg ``timestamptz`` base: hour(ts) keys are INSTANTS on
    UTC hour boundaries — the Arrow (aware) and collect() (system-
    local naive) producer paths land on the same UTC-naive strings,
    and the stats route returns the same instants as the scan."""
    base = dt.datetime(2024, 3, 1, 22, 10, tzinfo=dt.timezone.utc)
    rows = [
        {"ts": base + dt.timedelta(hours=i % 4, minutes=i % 7),
         "u": i % 13}
        for i in range(120)
    ]
    w = _make_table(tmp_path, "ltz", "timestamptz", rows)
    t, theta_keys, quant_keys = _key_spaces(spark, w)
    assert theta_keys == quant_keys, (theta_keys, quant_keys)
    truth_keys = {
        r["ts"]
        .replace(minute=0, second=0, microsecond=0)
        .astimezone(dt.timezone.utc)
        .replace(tzinfo=None)
        .isoformat()
        for r in rows
    }
    assert theta_keys == truth_keys, (theta_keys, truth_keys)
    # stats route == scan route under the misaligned driver zone:
    # both collect through TimestampType, so equal instants compare
    # equal whatever the system zone renders them as
    from pyspark.sql import functions as F

    out = t.ndv_groupby(spark, "u", ["hour(ts)"])
    assert t.last_ndv_groupby["route"] == "stats"
    got = {r["hour(ts)"]: r["ndv"] for r in out.collect()}
    truth = {
        r["h"]: r["ndv"]
        for r in t.to_df(spark)
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count_distinct("u").alias("ndv"))
        .collect()
    }
    assert got == truth, (got, truth)
