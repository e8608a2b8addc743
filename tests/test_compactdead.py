"""Delete-ratio compaction trigger (compact_files_spark
min_dead_fraction / maintain compact_dead_fraction): files whose
row-level deletes reach the fraction are rewritten — folding the
deletes — regardless of size; lightly-deleted files are left alone."""

from __future__ import annotations

import daskberg_spark.iceberg.scan  # noqa: F401  (attaches .to_df)


def _table(path, n_files=3, rows_per=40):
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(path),
        [
            {"id": 1, "name": "id", "type": "long", "required": False},
            {"id": 2, "name": "v", "type": "int", "required": False},
        ],
    )
    for f in range(n_files):
        w.append(
            [
                {"id": f * 1000 + i, "v": f * 1000 + i}
                for i in range(rows_per)
            ]
        )
    return w


def _live_rows(spark, path):
    from daskberg_spark.iceberg.metadata import IcebergTable

    return sorted(
        (r.id, r.v) for r in IcebergTable(path).to_df(spark).collect()
    )


def test_dead_fraction_rewrites_only_heavy_files_posdeletes(spark, tmp_path):
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import compact_files_spark

    w = _table(tmp_path / "t")
    t = IcebergTable(w.path)
    files = sorted(f["file_path"] for f in t.plan_files(None))
    # 50% of file 0 dead, 5% of file 1 dead (path-named pos parquet)
    w.delete_rows_position([(files[0], p) for p in range(20)])
    w.delete_rows_position([(files[1], p) for p in range(2)])
    before = _live_rows(spark, w.path)
    # min_file_bytes=0 disables the small-file path: only the ratio
    # trigger can select anything
    sid = compact_files_spark(
        w, spark, min_file_bytes=0, min_dead_fraction=0.3
    )
    assert sid is not None
    t = IcebergTable(w.path)
    after_paths = {f["file_path"] for f in t.plan_files(None)}
    assert files[0] not in after_paths, "heavy-deleted file not rewritten"
    assert files[1] in after_paths and files[2] in after_paths, (
        "lightly-deleted / clean files must be untouched"
    )
    assert _live_rows(spark, w.path) == before
    # the rewritten file's rows are live WITHOUT its delete parquet:
    # the folded file contributes 20 rows plainly
    rewritten = after_paths - set(files)
    assert len(rewritten) >= 1


def test_dead_fraction_rewrites_dv_files_and_threshold_respected(
    spark, tmp_path
):
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import (
        compact_files_spark,
        delete_where_dv_spark,
    )

    w = _table(tmp_path / "t")
    delete_where_dv_spark(w, spark, "id < 20")  # 50% of file 0 via DV
    before = _live_rows(spark, w.path)
    # below threshold: nothing qualifies
    assert (
        compact_files_spark(
            w, spark, min_file_bytes=0, min_dead_fraction=0.6
        )
        is None
    )
    t = IcebergTable(w.path)
    files_before = sorted(f["file_path"] for f in t.plan_files(None))
    assert (
        compact_files_spark(
            w, spark, min_file_bytes=0, min_dead_fraction=0.3
        )
        is not None
    )
    t = IcebergTable(w.path)
    after_paths = {f["file_path"] for f in t.plan_files(None)}
    assert files_before[0] not in after_paths
    assert set(files_before[1:]) <= after_paths
    assert _live_rows(spark, w.path) == before


def test_maintain_runs_dead_fraction_compaction(spark, tmp_path):
    """maintain() triggers the Spark rewrite on dead weight alone —
    no small files — and remove_dangling cleans the stranded deletes."""
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import maintain

    w = _table(tmp_path / "t")
    t = IcebergTable(w.path)
    files = sorted(f["file_path"] for f in t.plan_files(None))
    w.delete_rows_position([(files[0], p) for p in range(25)])
    before = _live_rows(spark, w.path)
    report = maintain(
        w, spark=spark, keep_last=100, min_file_bytes=0
    )
    assert report["compact"], report
    assert _live_rows(spark, w.path) == before
    t = IcebergTable(w.path)
    assert files[0] not in {f["file_path"] for f in t.plan_files(None)}
    # the folded file's position-delete parquet no longer applies
    assert not t.plan_deletes(), "dangling delete not cleaned"
    # opting out skips the trigger
    w2 = _table(tmp_path / "t2")
    t2 = IcebergTable(w2.path)
    f2 = sorted(f["file_path"] for f in t2.plan_files(None))
    w2.delete_rows_position([(f2[0], p) for p in range(25)])
    report2 = maintain(
        w2,
        spark=spark,
        keep_last=100,
        min_file_bytes=0,
        compact_dead_fraction=None,
    )
    assert report2["compact"] is None
