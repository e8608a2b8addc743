"""Per-file sum statistics (sumstats.py) and the SUM aggregate
pushdown they enable (agg.py): exactness under NULLs, deletes,
filters, decimals, grouping, incremental refresh, and overflow."""

from __future__ import annotations

import decimal

import pytest


def _writer(path, extra=()):
    from daskberg_spark.iceberg.writer import IcebergWriter

    fields = [
        {"id": 1, "name": "id", "type": "long", "required": False},
        {"id": 2, "name": "grp", "type": "string", "required": False},
        {"id": 3, "name": "v", "type": "int", "required": False},
        {"id": 4, "name": "d", "type": "decimal(12,2)", "required": False},
        {"id": 5, "name": "f", "type": "double", "required": False},
    ]
    return IcebergWriter(str(path), fields, list(extra))


def _rows(lo, hi, null_every=7, null_d=False):
    return [
        {
            "id": i,
            "grp": "ab"[i % 2],
            "v": None if null_every and i % null_every == 0 else i * 3,
            "d": None if null_d else decimal.Decimal(f"{i}.25"),
            "f": i * 0.5,
        }
        for i in range(lo, hi)
    ]


def _truth(t, spark, sql):
    t.to_df(spark).createOrReplaceTempView("__sum_truth")
    return spark.sql(sql.replace("$T", "__sum_truth")).collect()


def test_sum_pushdown_zero_scan_matches_scan(spark, tmp_path):
    import daskberg_spark.iceberg.agg  # noqa: F401
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.sumstats import write_sum_statistics

    w = _writer(tmp_path / "t")
    w.append(_rows(0, 40))
    w.append(_rows(40, 70, null_d=True))
    assert write_sum_statistics(w, spark)  # id, v, d auto-selected
    t = IcebergTable(w.path)
    out = t.agg_pushdown(
        spark,
        [
            ("sum", "id", "s_id"),
            ("sum", "v", "s_v"),
            ("sum", "d", "s_d"),
            ("count", "v", "n_v"),
        ],
    ).first()
    assert t.last_agg_pushdown["files_scanned"] == 0
    assert t.last_scan["files_scanned"] == 0  # zero data IO recorded
    (truth,) = _truth(
        t,
        spark,
        "SELECT sum(id) s_id, sum(v) s_v, cast(sum(d) as decimal(38,2)) "
        "s_d, count(v) n_v FROM $T",
    )
    assert out.s_id == truth.s_id and out.s_v == truth.s_v
    assert out.s_d == truth.s_d and out.n_v == truth.n_v


def test_sum_filtered_hybrid_scans_boundary_only(spark, tmp_path):
    import daskberg_spark.iceberg.agg  # noqa: F401
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.sumstats import write_sum_statistics

    w = _writer(tmp_path / "t")
    w.append(_rows(0, 40))   # ids 0..39
    w.append(_rows(40, 70))  # ids 40..69 — whole-matches id >= 20? no; >= 40 yes
    write_sum_statistics(w, spark, ["v"])
    t = IcebergTable(w.path)
    out = t.agg_pushdown(
        spark, [("sum", "v", "s")], filters=[("id", ">=", 20)]
    ).first()
    rep = t.last_agg_pushdown
    assert rep["files_scanned"] == 1 and rep["meta_files"]["s"] == 1
    (truth,) = _truth(t, spark, "SELECT sum(v) s FROM $T WHERE id >= 20")
    assert out.s == truth.s


def test_sum_under_deletes_scans_and_stays_exact(spark, tmp_path):
    import daskberg_spark.iceberg.agg  # noqa: F401
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.sumstats import write_sum_statistics

    w = _writer(tmp_path / "t")
    w.append(_rows(0, 40))
    w.append(_rows(40, 70))
    write_sum_statistics(w, spark, ["v"])
    w.delete_rows_equality([{"id": 5}, {"id": 41}])
    t = IcebergTable(w.path)
    out = t.agg_pushdown(spark, [("sum", "v", "s")]).first()
    # the eq delete may apply to both (strictly-older) files → both scan
    assert t.last_agg_pushdown["files_scanned"] == 2
    (truth,) = _truth(t, spark, "SELECT sum(v) s FROM $T")
    assert out.s == truth.s


def test_sum_grouped_by_identity_partition(spark, tmp_path):
    import daskberg_spark.iceberg.agg  # noqa: F401
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.sumstats import write_sum_statistics

    w = _writer(
        tmp_path / "t",
        extra=[{"name": "grp", "transform": "identity", "source": "grp"}],
    )
    rows = _rows(0, 60)
    w.append([r for r in rows if r["grp"] == "a"])
    w.append([r for r in rows if r["grp"] == "b"])
    write_sum_statistics(w, spark, ["v", "d"])
    t = IcebergTable(w.path)
    out = {
        r.grp: (r.s_v, r.s_d)
        for r in t.agg_pushdown(
            spark,
            [("sum", "v", "s_v"), ("sum", "d", "s_d")],
            group_by=["grp"],
        ).collect()
    }
    assert t.last_agg_pushdown["files_scanned"] == 0
    truth = {
        r.grp: (r.s_v, r.s_d)
        for r in _truth(
            t,
            spark,
            "SELECT grp, sum(v) s_v, cast(sum(d) as decimal(38,2)) s_d "
            "FROM $T GROUP BY grp",
        )
    }
    assert out == truth


def test_sum_refresh_covers_only_new_files(spark, tmp_path):
    import daskberg_spark.iceberg.agg  # noqa: F401
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.sumstats import (
        column_filesums,
        refresh_sum_statistics,
        write_sum_statistics,
    )

    w = _writer(tmp_path / "t")
    w.append(_rows(0, 40))
    write_sum_statistics(w, spark, ["v"])
    assert refresh_sum_statistics(w, spark) is None  # fully covered
    w.append(_rows(40, 70))
    t = IcebergTable(w.path)
    covered_before = set(column_filesums(t, "v"))
    assert refresh_sum_statistics(w, spark)
    t = IcebergTable(w.path)
    sums = column_filesums(t, "v")
    assert len(sums) == 2 and covered_before < set(sums)
    out = t.agg_pushdown(spark, [("sum", "v", "s")]).first()
    assert t.last_agg_pushdown["files_scanned"] == 0
    (truth,) = _truth(t, spark, "SELECT sum(v) s FROM $T")
    assert out.s == truth.s


def test_sum_uncovered_and_allnull_and_empty_files(spark, tmp_path):
    import daskberg_spark.iceberg.agg  # noqa: F401
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.sumstats import write_sum_statistics

    w = _writer(tmp_path / "t")
    w.append([{"id": i, "grp": "a", "v": None, "d": None, "f": 0.0} for i in range(5)])
    w.append(_rows(0, 30))
    write_sum_statistics(w, spark, ["v"])
    w.append(_rows(30, 50))  # appended AFTER stats — uncovered
    t = IcebergTable(w.path)
    out = t.agg_pushdown(spark, [("sum", "v", "s")]).first()
    rep = t.last_agg_pushdown
    # all-NULL file SKIPs from its blob, covered file answers, only the
    # uncovered file scans
    assert rep["files_scanned"] == 1 and rep["meta_files"]["s"] == 2
    (truth,) = _truth(t, spark, "SELECT sum(v) s FROM $T")
    assert out.s == truth.s
    # a column with NO blob anywhere still answers — full scan
    out2 = t.agg_pushdown(spark, [("sum", "id", "s")]).first()
    assert t.last_agg_pushdown["files_scanned"] == 3
    (truth2,) = _truth(t, spark, "SELECT sum(id) s FROM $T")
    assert out2.s == truth2.s


def test_sum_float_refused_and_allnull_result_is_null(spark, tmp_path):
    import daskberg_spark.iceberg.agg  # noqa: F401
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.sumstats import write_sum_statistics

    w = _writer(tmp_path / "t")
    w.append([{"id": i, "grp": "a", "v": None, "d": None, "f": 1.0} for i in range(5)])
    write_sum_statistics(w, spark, ["v"])
    t = IcebergTable(w.path)
    with pytest.raises(ValueError, match="order-dependent|exact sum"):
        write_sum_statistics(w, spark, ["f"])
    with pytest.raises(ValueError, match="no exact decomposable sum"):
        t.agg_pushdown(spark, [("sum", "f", "s")])
    row = t.agg_pushdown(spark, [("sum", "v", "s")]).first()
    assert row.s is None  # SQL SUM over zero non-null rows
    assert t.last_agg_pushdown["files_scanned"] == 0


def test_sum_overflow_raises_loudly(spark, tmp_path):
    import daskberg_spark.iceberg.agg  # noqa: F401
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.sumstats import write_sum_statistics

    big = (1 << 62) + 7
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "t"),
        [{"id": 1, "name": "x", "type": "long", "required": False}],
    )
    w.append([{"x": big}, {"x": big}])
    w.append([{"x": big}])
    write_sum_statistics(w, spark, ["x"])
    t = IcebergTable(w.path)
    with pytest.raises(ValueError, match="overflows BIGINT"):
        t.agg_pushdown(spark, [("sum", "x", "s")])


def test_sum_blobs_coexist_and_survive_maintain(spark, tmp_path):
    """maintain() refreshes sum blobs incrementally for opted-in tables
    and other statistics flavors stay live (the daskberg-* keep rule)."""
    import daskberg_spark.iceberg.agg  # noqa: F401
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.sumstats import SUM_BLOB_TYPE, write_sum_statistics
    from daskberg_spark.iceberg.writer import maintain, write_table_statistics

    w = _writer(tmp_path / "t")
    w.append(_rows(0, 40))
    write_sum_statistics(w, spark, ["v"])
    write_table_statistics(w, spark)  # theta NDV replaces the stats entry
    t = IcebergTable(w.path)
    types = {
        b.get("type")
        for e in t.table_statistics()
        for b in e.get("blob-metadata", [])
    }
    assert SUM_BLOB_TYPE in types, "NDV write dropped the sum blobs"
    w.append(_rows(40, 60))
    report = maintain(w, spark=spark, keep_last=100)
    assert report["refresh_sums"], "maintain did not catch up sum blobs"
    t = IcebergTable(w.path)
    out = t.agg_pushdown(spark, [("sum", "v", "s")]).first()
    assert t.last_agg_pushdown["files_scanned"] == 0
    (truth,) = _truth(t, spark, "SELECT sum(v) s FROM $T")
    assert out.s == truth.s


def test_footer_stats_lift_survives_allnull_decimal_chunk(spark, tmp_path):
    """Regression (found via maintain() in this suite): pyarrow raises
    ArrowNotImplementedError casting min/max of an all-NULL FLBA
    decimal chunk even though has_min_max reports True —
    lift_footer_stats must degrade that column to boundless, not
    crash the whole compaction commit."""
    import decimal as _d

    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import IcebergWriter, maintain

    w = IcebergWriter(
        str(tmp_path / "t"),
        [
            {"id": 1, "name": "id", "type": "long", "required": False},
            {"id": 2, "name": "d", "type": "decimal(12,2)", "required": False},
        ],
    )
    w.append([{"id": i, "d": _d.Decimal(f"{i}.25")} for i in range(10)])
    w.append([{"id": i, "d": None} for i in range(10, 20)])
    report = maintain(w, spark=spark, keep_last=100)
    assert report["compact"]  # the two small files actually compacted
    t = IcebergTable(w.path)
    rows = sorted(
        (r.id, r.d) for r in t.to_df(spark).collect()
    )
    assert rows == [
        (i, _d.Decimal(f"{i}.25") if i < 10 else None) for i in range(20)
    ]


def test_sum_randomized_differential(spark, tmp_path):
    """Randomized battery vs the full-scan aggregate: NULL mixes,
    filters, deletes, and grouped shapes."""
    import random

    import daskberg_spark.iceberg.agg  # noqa: F401
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.sumstats import write_sum_statistics

    rng = random.Random(1311)
    w = _writer(
        tmp_path / "t",
        extra=[{"name": "grp", "transform": "identity", "source": "grp"}],
    )
    for _ in range(3):
        rows = [
            {
                "id": rng.randrange(1000),
                "grp": rng.choice("ab"),
                "v": None if rng.random() < 0.2 else rng.randrange(-500, 500),
                "d": None
                if rng.random() < 0.3
                else decimal.Decimal(rng.randrange(-10**6, 10**6)).scaleb(-2),
                "f": rng.random(),
            }
            for _ in range(50)
        ]
        for g in "ab":
            part = [r for r in rows if r["grp"] == g]
            if part:
                w.append(part)
    write_sum_statistics(w, spark, ["v", "d", "id"])
    if rng.random() < 0.8:
        w.delete_rows_equality([{"id": rng.randrange(1000)} for _ in range(3)])
    t = IcebergTable(w.path)
    cases = [
        (None, ""),
        ([("id", ">=", 500)], " WHERE id >= 500"),
        ([("grp", "==", "a")], " WHERE grp = 'a'"),
    ]
    for filters, where in cases:
        out = t.agg_pushdown(
            spark,
            [("sum", "v", "s_v"), ("sum", "d", "s_d"), ("sum", "id", "s_i")],
            filters=filters,
        ).first()
        (truth,) = _truth(
            t,
            spark,
            "SELECT sum(v) s_v, cast(sum(d) as decimal(38,2)) s_d, "
            f"sum(id) s_i FROM $T{where}",
        )
        assert (out.s_v, out.s_d, out.s_i) == (truth.s_v, truth.s_d, truth.s_i)


def test_colsum_entries_consolidate(spark, tmp_path):
    """Each refresh appends a colsum entry; past the cap the refresh
    rewrites ONE consolidated live-files entry — the statistics list
    stays O(live files), and the SUM pushdown's answers are unchanged
    (still zero data files on clean tables)."""
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.sumstats import (
        SUM_BLOB_TYPE,
        refresh_sum_statistics,
        write_sum_statistics,
    )

    w = _writer(tmp_path / "cs")
    w.append(_rows(0, 40))
    write_sum_statistics(w, spark, ["v", "d"])
    for r in range(10):
        w.append(_rows(40 + 20 * r, 60 + 20 * r))
        refresh_sum_statistics(w, spark)

    def n_entries():
        return sum(
            1
            for e in w.statistics
            if any(
                b.get("type") == SUM_BLOB_TYPE
                for b in e.get("blob-metadata", [])
            )
        )

    assert n_entries() <= 9, n_entries()
    t = IcebergTable(w.path)
    out = t.agg_pushdown(
        spark, [("sum", "v", "s"), ("count", "v", "n")]
    ).first()
    assert t.last_agg_pushdown["files_scanned"] == 0
    truth = _truth(
        t, spark, "SELECT cast(sum(v) as long) s, count(v) n FROM $T"
    )[0]
    assert (out.s, out.n) == (truth.s, truth.n)
    # a further refresh after consolidation indexes nothing
    assert refresh_sum_statistics(w, spark) is None
