"""Distributed multi-format data-file writes: ``write_df`` ORC (native
Spark writer + one JVM-side stats aggregate) and AVRO (executor task
containers with in-task stats) legs."""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest
from pyspark.sql import functions as F

from daskberg_spark.iceberg.metadata import IcebergTable
from daskberg_spark.iceberg.writer import IcebergWriter, write_df

import daskberg_spark.iceberg.scan  # noqa: F401  (attaches .to_df)


def _table(partitioned=True):
    d = tempfile.mkdtemp(prefix="fmtwrite_") + "/t"
    spec = (
        [{"name": "grp", "transform": "identity", "source": "grp"}]
        if partitioned
        else None
    )
    return d, IcebergWriter(
        d,
        [
            {"id": 1, "name": "id", "type": "long", "required": False},
            {"id": 2, "name": "grp", "type": "string", "required": False},
            {"id": 3, "name": "val", "type": "double", "required": False},
            {"id": 4, "name": "d", "type": "date", "required": False},
        ],
        spec,
    )


def _df(spark, lo=0, hi=300, null_grp=False):
    grp = F.concat(F.lit("g"), (F.col("id") % 3).cast("string"))
    if null_grp:
        grp = F.when(F.col("id") % 3 != 2, grp)  # every third grp NULL
    return spark.range(lo, hi).select(
        F.col("id"),
        grp.alias("grp"),
        (F.col("id") * 0.5).alias("val"),
        F.date_add(
            F.lit("2024-01-01"), (F.col("id") % 30).cast("int")
        ).alias("d"),
    )


@pytest.mark.parametrize("fmt", ["orc", "avro"])
def test_write_df_format_roundtrip(spark, fmt):
    d, w = _table()
    write_df(w, _df(spark), mode="hash", file_format=fmt)
    t = IcebergTable(d)
    out = t.to_df(spark)
    assert out.count() == 300
    assert out.agg(F.sum("id")).collect()[0][0] == sum(range(300))
    # one file per partition tuple under hash mode
    files = t.plan_files()
    assert len(files) == 3
    assert all(f["file_format"].upper() == fmt.upper() for f in files)
    # identity partition pruning works on the committed entries
    assert len(t.plan_files([("grp", "==", "g1")])) == 1
    got = sorted(
        r["id"] for r in out.filter(F.col("grp") == "g1").collect()
    )
    assert got == [i for i in range(300) if i % 3 == 1]


@pytest.mark.parametrize("fmt", ["orc", "avro"])
def test_write_df_format_stats_prune(spark, fmt):
    # range mode clusters on id, so the lifted bounds must prune a
    # point lookup down to one file — proving ORC's distributed stats
    # pass and AVRO's in-task stats both land real manifest bounds
    d, w = _table(partitioned=False)
    write_df(
        w, _df(spark), mode="range", sort_by=["id"], num_tasks=6,
        file_format=fmt,
    )
    t = IcebergTable(d)
    total = t.plan_files()
    assert len(total) == 6
    hit = t.plan_files([("id", "==", 7)])
    assert len(hit) == 1
    # and the residual read returns exactly the row
    rows = t.to_df(spark, filters=[("id", "==", 7)]).collect()
    assert [r["id"] for r in rows] == [7]
    # null counts landed (whole-file proof machinery needs them)
    rec = total[0]
    assert rec.get("null_value_counts")


@pytest.mark.parametrize("fmt", ["orc", "avro"])
def test_write_df_format_null_partition(spark, fmt):
    d, w = _table()
    write_df(w, _df(spark, null_grp=True), mode="hash", file_format=fmt)
    t = IcebergTable(d)
    out = t.to_df(spark)
    assert out.count() == 300
    null_rows = out.filter(F.col("grp").isNull()).count()
    assert null_rows == 100  # the __HIVE_DEFAULT_PARTITION__ round-trip
    # the NULL partition tuple is its own scope
    parts = {
        tuple(sorted((f.get("partition") or {}).items()))
        for f in t.plan_files()
    }
    assert (("grp", None),) in parts


def test_orc_nan_stats(spark):
    # NaN must be excluded from ORC bounds and counted in the census —
    # otherwise float pruning would wrongly drop matches
    d, w = _table(partitioned=False)
    df = spark.range(0, 50).select(
        F.col("id"),
        F.lit("g").alias("grp"),
        F.when(F.col("id") % 10 == 0, float("nan"))
        .otherwise(F.col("id") * 1.0)
        .alias("val"),
        F.lit(dt.date(2024, 1, 1)).alias("d"),
    )
    write_df(w, df.coalesce(1), mode="none", file_format="orc")
    t = IcebergTable(d)
    rec = t.plan_files()[0]
    nans = {e["key"]: e["value"] for e in rec["nan_value_counts"]}
    assert nans[3] == 5
    uppers = {e["key"] for e in rec["upper_bounds"]}
    assert 3 in uppers  # bounds still present, NaN-free
    # a filter above the true max prunes the file despite the NaNs...
    assert len(t.plan_files([("val", ">", 1e9)])) in (0, 1)
    # ...and the residual read never loses the NaN rows on a broad scan
    assert t.to_df(spark).filter(F.isnan("val")).count() == 5


@pytest.mark.parametrize("fmt", ["parquet", "orc", "avro"])
def test_write_df_empty_commit(spark, fmt):
    # review finding: an empty ORC staging dir (only _SUCCESS) crashed
    # spark.read.orc in the stats pass; every format must commit an
    # empty snapshot like an empty micro-batch would
    d, w = _table()
    write_df(w, _df(spark).filter(F.col("id") < 0), file_format=fmt)
    t = IcebergTable(d)
    assert t.to_df(spark).count() == 0
    assert len(t.metadata["snapshots"]) == 1


def test_orc_timestamp_bounds_tz_proof(spark):
    # review finding: timestamp min/max collected as session-local
    # naive datetimes re-encoded as UTC — bounds shifted by the session
    # TZ.  Aggregating epoch micros is TZ-proof: force a non-UTC
    # session TZ and check the manifest bounds are the true instants.
    import datetime as dt

    from daskberg_spark.iceberg.conversions import decode_bound

    d = tempfile.mkdtemp(prefix="fmtwrite_") + "/t"
    w = IcebergWriter(
        d,
        [
            {"id": 1, "name": "id", "type": "long", "required": False},
            {"id": 2, "name": "ts", "type": "timestamp", "required": False},
        ],
    )
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.range(0, 10).select(
            F.col("id"),
            F.timestamp_micros(
                F.lit(1717243200000000) + F.col("id") * 1000000
            ).alias("ts"),  # 2024-06-01T12:00:00Z + id seconds
        )
        write_df(w, df.coalesce(1), mode="none", file_format="orc")
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    rec = IcebergTable(d).plan_files()[0]
    lo = {e["key"]: e["value"] for e in rec["lower_bounds"]}[2]
    hi = {e["key"]: e["value"] for e in rec["upper_bounds"]}[2]
    # decode_bound renders naive-UTC datetimes; the true instants are
    # 2024-06-01T12:00:00Z and +9s — NOT the 08:00 New-York-shifted
    # values the pre-fix collect produced
    assert decode_bound(lo, "timestamp") == dt.datetime(2024, 6, 1, 12, 0, 0)
    assert decode_bound(hi, "timestamp") == dt.datetime(2024, 6, 1, 12, 0, 9)


def test_orc_ntz_timestamp_bounds(spark):
    # TIMESTAMP_NTZ: the collected naive datetime IS the stored wall
    # clock — the plain min/max branch must handle it (unix_micros
    # rejects NTZ), and the bound is the literal wall time
    import datetime as dt

    from daskberg_spark.iceberg.conversions import decode_bound

    d = tempfile.mkdtemp(prefix="fmtwrite_") + "/t"
    w = IcebergWriter(
        d,
        [
            {"id": 1, "name": "id", "type": "long", "required": False},
            {"id": 2, "name": "ts", "type": "timestamp", "required": False},
        ],
    )
    df = spark.range(0, 5).select(
        F.col("id"),
        (
            F.lit("2024-06-01 12:00:00").cast("timestamp_ntz")
            + F.make_dt_interval(secs=F.col("id").cast("double"))
        ).alias("ts"),
    )
    write_df(w, df.coalesce(1), mode="none", file_format="orc")
    rec = IcebergTable(d).plan_files()[0]
    lo = {e["key"]: e["value"] for e in rec["lower_bounds"]}[2]
    assert decode_bound(lo, "timestamp") == dt.datetime(2024, 6, 1, 12, 0, 0)


def test_avro_task_flush_budget(spark, monkeypatch):
    # review finding: a task buffered its whole input before writing;
    # the flush budget must cap per-group buffering by spilling extra
    # containers (manifest tolerates several files per tuple)
    monkeypatch.setenv("DASKBERG_AVRO_WRITE_FLUSH_ROWS", "40")
    d, w = _table()
    # small arrow batches so the budget sees MULTIPLE batches per task
    # (a single batch flushes whole — arrow batch size is the floor)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "25")
    try:
        write_df(w, _df(spark).coalesce(1), mode="none", file_format="avro")
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    t = IcebergTable(d)
    files = t.plan_files()
    assert len(files) > 3  # overflow containers per partition tuple
    out = t.to_df(spark)
    assert out.count() == 300
    assert out.agg(F.sum("id")).collect()[0][0] == sum(range(300))


def test_arrow_bounds_match_rows_bounds():
    # the task-side columnar stats must be byte-identical to the
    # driver writer's row-wise rows_bounds, NaN/null included
    import numpy as np
    import pyarrow as pa

    from daskberg_spark.iceberg.writer import (
        arrow_table_bounds,
        rows_bounds,
    )

    fields = [
        {"id": 1, "name": "id", "type": "long", "required": False},
        {"id": 2, "name": "s", "type": "string", "required": False},
        {"id": 3, "name": "v", "type": "double", "required": False},
        {"id": 4, "name": "d", "type": "date", "required": False},
        {"id": 5, "name": "ts", "type": "timestamp", "required": False},
    ]
    rng = np.random.default_rng(5)
    n = 500
    rows = [
        {
            "id": None if i % 13 == 0 else int(rng.integers(-(2**40), 2**40)),
            "s": None if i % 7 == 0 else f"w{int(rng.integers(0, 999)):03d}",
            "v": float("nan") if i % 11 == 0 else float(rng.normal()),
            "d": dt.date(2024, 1, 1) + dt.timedelta(days=i % 90),
            "ts": dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
        }
        for i in range(n)
    ]
    tbl = pa.table(
        {
            "id": pa.array([r["id"] for r in rows], type=pa.int64()),
            "s": pa.array([r["s"] for r in rows], type=pa.string()),
            "v": pa.array([r["v"] for r in rows], type=pa.float64()),
            "d": pa.array([r["d"] for r in rows], type=pa.date32()),
            "ts": pa.array(
                [r["ts"] for r in rows], type=pa.timestamp("us")
            ),
        }
    )
    assert arrow_table_bounds(fields, tbl) == rows_bounds(fields, rows)


def test_avro_preserves_nan_vs_null(spark):
    # arrow transport keeps NULL and NaN doubles distinct; the pandas
    # path folded both to NaN and wrote NaN values as NULLs
    d, w = _table(partitioned=False)
    df = spark.createDataFrame(
        [(0, "g", float("nan"), dt.date(2024, 1, 1)),
         (1, "g", None, dt.date(2024, 1, 1)),
         (2, "g", 2.5, dt.date(2024, 1, 1))],
        "id long, grp string, val double, d date",
    )
    write_df(w, df.coalesce(1), mode="none", file_format="avro")
    out = IcebergTable(d).to_df(spark)
    assert out.filter(F.isnan("val")).count() == 1
    assert out.filter(F.col("val").isNull()).count() == 1


def test_randomized_write_read_differential(spark):
    """Randomized end-to-end differential across ALL THREE write
    formats: random typed content (nulls, negative longs, unicode,
    NaN-free doubles — NaN equality is format-independent and covered
    by test_orc_nan_stats) written via write_df must read back
    row-identical through the multiformat scan, for both partitioned
    and unpartitioned specs."""
    import random

    rng = random.Random(17)
    for trial in range(3):
        partitioned = trial % 2 == 0
        d = tempfile.mkdtemp(prefix="fmtrand_") + "/t"
        spec = (
            [{"name": "g", "transform": "identity", "source": "g"}]
            if partitioned
            else None
        )
        w = IcebergWriter(
            d,
            [
                {"id": 1, "name": "i", "type": "long", "required": False},
                {"id": 2, "name": "g", "type": "string", "required": False},
                {"id": 3, "name": "x", "type": "double", "required": False},
                {"id": 4, "name": "day", "type": "date", "required": False},
                {"id": 5, "name": "ts", "type": "timestamp", "required": False},
                {"id": 6, "name": "b", "type": "boolean", "required": False},
            ],
            spec,
        )
        n = 200 + trial * 37
        rows = [
            (
                None if rng.random() < 0.1 else rng.randint(-(2**60), 2**60),
                None if rng.random() < 0.15 else f"grüp-{rng.randint(0, 3)}",
                None if rng.random() < 0.1 else rng.uniform(-1e9, 1e9),
                dt.date(2024, 1, 1) + dt.timedelta(days=rng.randint(0, 400)),
                dt.datetime(2024, 1, 1)
                + dt.timedelta(seconds=rng.randint(0, 10**7)),
                rng.random() < 0.5,
            )
            for _ in range(n)
        ]
        df = spark.createDataFrame(
            rows,
            "i long, g string, x double, day date, ts timestamp, b boolean",
        )
        def key(row):
            return tuple((v is None, v) for v in row)  # None-safe sort

        expect = sorted(map(tuple, df.collect()), key=key)
        for fmt in ("parquet", "orc", "avro"):
            snap_dir = tempfile.mkdtemp(prefix="fmtrand_") + f"/{fmt}"
            wf = IcebergWriter(
                snap_dir, [dict(f) for f in w.fields], spec and list(spec)
            )
            write_df(
                wf,
                df,
                mode="hash" if partitioned else "none",
                file_format=fmt,
            )
            got = sorted(
                map(tuple, IcebergTable(snap_dir).to_df(spark).collect()),
                key=key,
            )
            assert got == expect, f"trial {trial} format {fmt} diverged"


def test_bloom_index_over_mixed_formats(spark):
    # the Bloom index build reads file contents through the
    # format-dispatching scan, so ORC- and AVRO-written files index and
    # prune exactly like parquet ones
    from daskberg_spark.iceberg.bloomindex import write_file_blooms

    d, w = _table(partitioned=False)
    for lo, fmt in ((0, "parquet"), (300, "orc"), (600, "avro")):
        write_df(
            w, _df(spark, lo, lo + 300).coalesce(1), mode="none",
            file_format=fmt,
        )
    write_file_blooms(w, spark, ["id"])
    t = IcebergTable(d)
    assert len(t.plan_files()) == 3
    # one id per format file: each lookup plans exactly its file
    for probe in (7, 307, 607):
        hit = t.plan_files([("id", "==", probe)])
        assert len(hit) == 1, (probe, len(hit))
        rows = t.to_df(spark, filters=[("id", "==", probe)]).collect()
        assert [r["id"] for r in rows] == [probe]
    # absent key plans zero files across all three formats
    assert t.plan_files([("id", "==", 10_000)]) == []


def test_write_df_rejects_unknown_format(spark):
    d, w = _table()
    with pytest.raises(ValueError, match="unknown data file format"):
        write_df(w, _df(spark), file_format="csv")


def test_orc_string_bounds_code_point_order(spark):
    # ADVICE r10: string bounds must follow UTF-8/code-point order.  A
    # supplementary-plane character (U+1F600) is ABOVE every BMP string
    # in code-point order, but Java UTF-16 comparison would sort its
    # surrogate pair below U+FFFD — an understated upper bound would
    # wrongly prune the file for a point lookup on the emoji string.
    d, w = _table(partitioned=False)
    df = spark.createDataFrame(
        [(1, "\U0001F600", 1.0, dt.date(2024, 1, 1)),
         (2, "�", 2.0, dt.date(2024, 1, 1)),
         (3, "apple", 3.0, dt.date(2024, 1, 1))],
        "id long, grp string, val double, d date",
    )
    write_df(w, df.coalesce(1), mode="none", file_format="orc")
    t = IcebergTable(d)
    # the emoji row must survive a point-lookup plan AND the read
    assert len(t.plan_files([("grp", "==", "\U0001F600")])) == 1
    got = t.to_df(spark).filter(F.col("grp") == "\U0001F600").count()
    assert got == 1
    # decoded upper bound is the code-point max
    rec = t.plan_files()[0]
    ups = {e["key"]: e["value"] for e in rec["upper_bounds"]}
    from daskberg_spark.iceberg.conversions import decode_bound

    assert decode_bound(ups[2], "string") >= "\U0001F600"


def test_eq_delete_orc_stays_native(spark):
    # An equality delete needs only __file (sequence attachment), never
    # per-row positions — the ORC leg must stay on Spark's NATIVE
    # vectorized reader (_metadata.file_path), with exactly one
    # MapInArrow leg in the whole plan (the AVRO decode, which has no
    # native reader here).  Routing ORC through the Python decode for
    # eq-deletes was a measured 1.18x regression at bench scale and
    # would cost far more at 100 TB.
    d, w = _table(partitioned=False)
    for lo, fmt in ((0, "parquet"), (300, "orc"), (600, "avro")):
        write_df(
            w, _df(spark, lo, lo + 300).coalesce(1), mode="none",
            file_format=fmt,
        )
    w.delete_rows_equality([{"id": i} for i in (5, 305, 605)])
    t = IcebergTable(d)
    df = t.to_df(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1, plan
    assert "Scan orc" in plan, plan
    ids = {r["id"] for r in df.collect()}
    assert not ids & {5, 305, 605}
    assert len(ids) == 897


def test_avro_write_num_tasks_spreads_encode(spark):
    # r10 verdict item 5: mode="none" now honors num_tasks, so a large
    # AVRO write spreads the python encode across cores by construction
    # (one container per task on an unpartitioned spec) instead of
    # inheriting the input's partitioning.
    d, w = _table(partitioned=False)
    write_df(
        w, _df(spark, 0, 4000).coalesce(1), mode="none", num_tasks=8,
        file_format="avro",
    )
    t = IcebergTable(d)
    files = t.plan_files()
    assert len(files) == 8
    assert all(f["file_format"].upper() == "AVRO" for f in files)
    out = t.to_df(spark)
    assert out.count() == 4000
    assert out.agg(F.sum("id")).collect()[0][0] == sum(range(4000))
    # in-task stats still land: the union of file bounds covers the range
    los = [
        {e["key"]: e["value"] for e in f["lower_bounds"]} for f in files
    ]
    assert los and all(1 in lo for lo in los)
