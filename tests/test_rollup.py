"""Incrementally-maintained materialized rollups (rollup.py): signed
changelog merge vs full recompute under appends, row-level deletes,
NULL groups/values, filters, compaction churn, and rollback."""

from __future__ import annotations


def _source(path):
    from daskberg_spark.iceberg.writer import IcebergWriter

    return IcebergWriter(
        str(path),
        [
            {"id": 1, "name": "id", "type": "long", "required": False},
            {"id": 2, "name": "grp", "type": "string", "required": False},
            {"id": 3, "name": "v", "type": "int", "required": False},
        ],
    )


def _recompute(spark, src_path, where=""):
    from daskberg_spark.iceberg.metadata import IcebergTable

    IcebergTable(src_path).to_df(spark).createOrReplaceTempView("__ru_src")
    return sorted(
        map(
            tuple,
            spark.sql(
                "SELECT grp, count(*) n, cast(sum(v) AS decimal(38,0)) s, "
                f"count(v) nn FROM __ru_src {where} GROUP BY grp"
            ).collect(),
        ),
        key=lambda r: (r[0] is None, r[0] or ""),
    )


def _state(spark, ru_path):
    from daskberg_spark.iceberg.metadata import IcebergTable

    return sorted(
        (
            (r.grp, r.n, r.sum_v, r.nn_v)
            for r in IcebergTable(ru_path).to_df(spark).collect()
        ),
        key=lambda r: (r[0] is None, r[0] or ""),
    )


def test_rollup_incremental_appends_and_deletes(spark, tmp_path):
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.rollup import create_rollup, refresh_rollup

    w = _source(tmp_path / "src")
    w.append(
        [
            {"id": i, "grp": "abc"[i % 3], "v": None if i % 5 == 0 else i}
            for i in range(60)
        ]
    )
    rw = create_rollup(
        spark, IcebergTable(w.path), str(tmp_path / "ru"), ["grp"], ["v"]
    )
    assert _state(spark, rw.path) == _recompute(spark, w.path)
    # append a new group + delete across groups, refresh incrementally
    w.append([{"id": i, "grp": "cd"[i % 2], "v": i} for i in range(100, 130)])
    w.delete_rows_equality([{"id": 7}, {"id": 101}])
    rep = refresh_rollup(spark, rw)
    assert rep["mode"] == "incremental" and rep["steps"] == 2
    assert _state(spark, rw.path) == _recompute(spark, w.path)
    # noop when the watermark is current
    assert refresh_rollup(spark, rw)["mode"] == "noop"
    # killing every row of a group removes its rollup row
    w.delete_rows_equality([{"id": i} for i in range(101, 130, 2)])
    refresh_rollup(spark, rw)
    state = _state(spark, rw.path)
    assert state == _recompute(spark, w.path)
    assert "d" not in {g for g, *_ in state}


def test_rollup_allnull_sum_stays_null_through_merge(spark, tmp_path):
    """A group whose every value is NULL must roll up sum=NULL, keep
    NULL when more NULLs arrive, turn non-NULL when a value lands, and
    return to NULL when the last value dies — a coalesce-only merge
    gets all four wrong."""
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.rollup import create_rollup, refresh_rollup

    w = _source(tmp_path / "src")
    w.append([{"id": 1, "grp": "z", "v": None}, {"id": 2, "grp": "z", "v": None}])
    rw = create_rollup(
        spark, IcebergTable(w.path), str(tmp_path / "ru"), ["grp"], ["v"]
    )
    assert _state(spark, rw.path) == [("z", 2, None, 0)]
    w.append([{"id": 3, "grp": "z", "v": None}])
    refresh_rollup(spark, rw)
    assert _state(spark, rw.path) == [("z", 3, None, 0)]
    w.append([{"id": 4, "grp": "z", "v": 10}])
    refresh_rollup(spark, rw)
    assert _state(spark, rw.path)[0][2:] == (10, 1)
    w.delete_rows_equality([{"id": 4}])
    refresh_rollup(spark, rw)
    assert _state(spark, rw.path) == [("z", 3, None, 0)]
    assert _state(spark, rw.path) == _recompute(spark, w.path)


def test_rollup_null_group_key(spark, tmp_path):
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.rollup import create_rollup, refresh_rollup

    w = _source(tmp_path / "src")
    w.append([{"id": 1, "grp": None, "v": 3}, {"id": 2, "grp": "a", "v": 4}])
    rw = create_rollup(
        spark, IcebergTable(w.path), str(tmp_path / "ru"), ["grp"], ["v"]
    )
    w.append([{"id": 3, "grp": None, "v": 5}])
    refresh_rollup(spark, rw)
    # a non-null-safe merge would mint a SECOND NULL-group row
    assert _state(spark, rw.path) == _recompute(spark, w.path)


def test_rollup_filtered_view(spark, tmp_path):
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.rollup import create_rollup, refresh_rollup

    w = _source(tmp_path / "src")
    w.append([{"id": i, "grp": "ab"[i % 2], "v": i} for i in range(40)])
    rw = create_rollup(
        spark,
        IcebergTable(w.path),
        str(tmp_path / "ru"),
        ["grp"],
        ["v"],
        filters=[("id", ">=", 10)],
    )
    w.append([{"id": i, "grp": "ab"[i % 2], "v": i} for i in range(100, 120)])
    w.delete_rows_equality([{"id": 15}, {"id": 3}])  # one in, one out
    rep = refresh_rollup(spark, rw)
    assert rep["mode"] == "incremental"
    assert _state(spark, rw.path) == _recompute(
        spark, w.path, where="WHERE id >= 10"
    )


def test_rollup_compaction_churn_cancels(spark, tmp_path):
    """Compaction rewrites files (changelog delete+insert pairs with
    identical content) — the signed merge must net to zero change."""
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.rollup import create_rollup, refresh_rollup
    from daskberg_spark.iceberg.writer import compact_files_spark

    w = _source(tmp_path / "src")
    for lo in (0, 20, 40):
        w.append(
            [{"id": i, "grp": "ab"[i % 2], "v": i} for i in range(lo, lo + 20)]
        )
    rw = create_rollup(
        spark, IcebergTable(w.path), str(tmp_path / "ru"), ["grp"], ["v"]
    )
    before = _state(spark, rw.path)
    compact_files_spark(w, spark, min_file_bytes=1 << 20)
    rep = refresh_rollup(spark, rw)
    assert rep["mode"] == "incremental"
    assert _state(spark, rw.path) == before == _recompute(spark, w.path)


def test_rollup_rollback_falls_back_to_full(spark, tmp_path):
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.rollup import create_rollup, refresh_rollup

    w = _source(tmp_path / "src")
    w.append([{"id": i, "grp": "a", "v": i} for i in range(10)])
    base_sid = w.head_snapshot["snapshot-id"]
    w.append([{"id": i, "grp": "b", "v": i} for i in range(10, 20)])
    rw = create_rollup(
        spark, IcebergTable(w.path), str(tmp_path / "ru"), ["grp"], ["v"]
    )
    # rollback strands the watermark (head is no longer a descendant),
    # then diverge with a new commit
    from daskberg_spark.iceberg.writer import rollback_to

    rollback_to(w, base_sid)
    w.append([{"id": i, "grp": "c", "v": i} for i in range(30, 35)])
    rep = refresh_rollup(spark, rw)
    assert rep["mode"] == "full"
    assert _state(spark, rw.path) == _recompute(spark, w.path)
