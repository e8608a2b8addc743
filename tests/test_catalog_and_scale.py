"""Catalog resolution + table-scale pruning invariants."""

from __future__ import annotations

import pytest


def test_catalog_register_and_sql(spark, golden_table):
    from daskberg_spark.iceberg.catalog import Catalog

    cat = Catalog(spark)
    cat.register("golden_t", golden_table)
    assert cat.sql("SELECT COUNT(*) AS n FROM golden_t").collect()[0]["n"] == 5
    cat.drop("golden_t")
    with pytest.raises(Exception):
        spark.table("golden_t")


def test_catalog_refresh_follows_snapshot(spark, golden_table):
    from daskberg_spark.iceberg.catalog import Catalog

    cat = Catalog(spark)
    cat.register("g2", golden_table)
    golden_table.open_snapshot(rel=-1)
    cat.refresh("g2")
    assert cat.sql("SELECT COUNT(*) AS n FROM g2").collect()[0]["n"] == 4
    assert cat.sql("SELECT * FROM g2").columns == ["name", "age"]
    cat.drop("g2")


@pytest.fixture(scope="module")
def lineitem_ice(spark):
    from daskberg_spark.iceberg.fixtures import ensure_lineitem_iceberg
    from daskberg_spark.iceberg.metadata import IcebergTable

    return IcebergTable(ensure_lineitem_iceberg(spark, "/root/testdata/sf0.001"))


def test_lineitem_table_counts(spark, lineitem_ice):
    source = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    assert lineitem_ice.to_df(spark).count() == source.count()


def test_lineitem_pruning_invariant(spark, lineitem_ice):
    """Pruned read == unpruned read + filter, and strictly fewer files."""
    filt = [("l_shipdate", ">=", "2001-01-01 00:00:00")]
    total = len(lineitem_ice.plan_files())
    pruned_files = len(lineitem_ice.plan_files(filt))
    assert 0 < pruned_files < total
    a = lineitem_ice.to_df(spark, filters=filt).count()
    b = (
        lineitem_ice.to_df(spark)
        .filter("l_shipdate >= '2001-01-01 00:00:00'")
        .count()
    )
    assert a == b > 0


def test_lineitem_footer_bounds_present(lineitem_ice):
    """commit_spark_output lifts real footer stats into the manifests."""
    f = lineitem_ice.plan_files()[0]
    keys = {b["key"] for b in f["lower_bounds"]}
    assert {1, 6} <= keys  # l_orderkey and l_shipdate have bounds
    assert f["partition"].get("l_shipmonth") is not None
    assert f["record_count"] > 0


SF = "/root/testdata/sf0.001"


def test_runtime_bloom_filter_join_pruning(spark):
    """Spark's runtime bloom-filter injection: a selective dim predicate
    materializes a bloom filter that pre-filters the fact side BEFORE the
    join shuffle — the semi-join reduction that matters when the fact is
    100 TB and the dim filter keeps 1%.  Results must be unchanged."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan.lower() or "mightContain" in plan
        filtered = {(r.o_orderstatus, r.n) for r in j.collect()}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    plain = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF}/orders.parquet").filter(
                F.col("o_totalprice") > 400000
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert filtered == {(r.o_orderstatus, r.n) for r in plain.collect()}


def test_driver_window_invariants():
    """The driver records only the first 50 registry entries: the priority
    list must fill the window exactly, reference every name it promises,
    and every windowed query must carry an oracle (rows-only families
    register after the window by design)."""
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    window = list(q)[:50]
    assert len(e._PRIORITY) == 50
    assert window == e._PRIORITY  # no unregistered priority names
    missing_oracle = [n for n in window if n not in o]
    assert missing_oracle == []


def test_bench_json_line_fits_driver_tail():
    """The driver keeps only the last ~2000 chars of bench output and
    parses the single JSON line out of that window; round 8's line
    carried two per-query control maps, outgrew it, and the round's
    BENCH artifact recorded "parsed": null.  Pin the invariant
    structurally: the line bench.py would emit — every HEADLINE query at
    a worst-case float width plus the control-summary fields — must stay
    under the 1900-char guard so adding headline queries trips THIS test
    before it trips the driver."""
    import json as _json

    import bench

    names = list(bench.HEADLINE) + ["maint_rewrite_manifests"]
    doc = {
        "metric": "headline_suite_seconds",
        "value": 9999.1234,
        "unit": "sec",
        "queries": {n: 99.1234 for n in names},
        "sf": 0.1,
        "bench_vs_control_ratio": 1.0234,
        "control": "BENCH_CONTROL_DETAIL.json",
    }
    line = _json.dumps(doc)
    assert len(line) <= 1900, (
        f"bench stdout line would be {len(line)} chars; trim HEADLINE or "
        "move fields to BENCH_CONTROL_DETAIL.json"
    )
    # and the fallback guard in bench.main exists
    import inspect

    src = inspect.getsource(bench.main)
    assert "1900" in src


def test_catalog_metadata_views_sql(spark, tmp_path):
    """Catalog.register_metadata_views: every metadata table registers
    as a name__suffix temp view (real Iceberg's tbl$suffix idiom under
    Spark's temp-view naming rules) and answers SQL; counts agree with
    the direct *_df calls."""
    from daskberg_spark.iceberg.catalog import Catalog
    from daskberg_spark.iceberg.writer import IcebergWriter

    p = str(tmp_path / "t")
    w = IcebergWriter(
        p, [{"id": 1, "name": "k", "type": "long", "required": False}]
    )
    w.append([{"k": 1}, {"k": 2}])
    w.append([{"k": 3}])
    w.delete_rows_equality([{"k": 2}])
    cat = Catalog(spark)
    cat.register_path("mt", p)
    names = cat.register_metadata_views("mt")
    assert len(names) == 16  # the full inspect-table family (+statistics)
    assert "mt__snapshots" in names and "mt__all_files" in names
    assert "mt__partitions" in names and "mt__position_deletes" in names
    n_part = spark.sql(
        "SELECT SUM(record_count) AS n FROM mt__partitions"
    ).collect()[0]["n"]
    assert n_part == 3  # metadata-claimed rows = appended rows
    n_snap = spark.sql("SELECT COUNT(*) AS n FROM mt__snapshots").collect()[0]["n"]
    assert n_snap == 3
    n_all = spark.sql("SELECT COUNT(*) AS n FROM mt__all_files").collect()[0]["n"]
    direct = cat.tables["mt"].all_files_df(spark).count()
    assert n_all == direct >= 3  # 2 data + 1 eq-delete at minimum
    # refs view answers too (main at least)
    rows = spark.sql("SELECT name FROM mt__refs").collect()
    assert {r["name"] for r in rows} >= {"main"}


def test_catalog_refresh_sees_new_commits(spark):
    """refresh reloads the table when a NEWER metadata version landed on
    disk after registration (review finding: the old refresh re-served
    the version pinned at open time forever), while preserving
    open_snapshot time travel when nothing new was committed (the
    sibling test above)."""
    import tempfile

    from daskberg_spark.iceberg.catalog import Catalog
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import IcebergWriter

    path = tempfile.mkdtemp(prefix="cat_refresh_")
    w = IcebergWriter(
        path, [{"id": 1, "name": "k", "type": "long", "required": False}]
    )
    w.append([{"k": 1}, {"k": 2}])
    cat = Catalog(spark)
    cat.register("rt", IcebergTable(path))
    assert cat.sql("SELECT COUNT(*) AS n FROM rt").collect()[0]["n"] == 2
    w.append([{"k": 3}])
    cat.refresh("rt")
    assert cat.sql("SELECT COUNT(*) AS n FROM rt").collect()[0]["n"] == 3


def test_catalog_drop_removes_metadata_views(spark):
    import tempfile

    import pytest as _pytest

    from daskberg_spark.iceberg.catalog import Catalog
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import IcebergWriter

    path = tempfile.mkdtemp(prefix="cat_drop_")
    w = IcebergWriter(
        path, [{"id": 1, "name": "k", "type": "long", "required": False}]
    )
    w.append([{"k": 1}])
    cat = Catalog(spark)
    cat.register("dt", IcebergTable(path))
    cat.register_metadata_views("dt")
    assert cat.sql("SELECT COUNT(*) AS n FROM dt__snapshots").collect()
    cat.drop("dt")
    from pyspark.sql.utils import AnalysisException

    with _pytest.raises(AnalysisException):
        cat.sql("SELECT * FROM dt__snapshots").collect()
    with _pytest.raises(AnalysisException):
        cat.sql("SELECT * FROM dt").collect()


def test_fast_scratch_dir_shm_free_space_guard(monkeypatch):
    """The tmpfs auto-pick must respect the free-space floor: plenty of
    room -> /dev/shm scratch; below the floor -> fall back to the Spark
    default (None).  Explicit SPARK_GRAFT_LOCAL_DIR always wins."""
    import os

    from daskberg_spark import session as sess

    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)
    monkeypatch.delenv("SPARK_LOCAL_DIRS", raising=False)

    class FakeStat:
        def __init__(self, avail_bytes):
            self.f_bavail = avail_bytes // 4096
            self.f_frsize = 4096

    # branch 1: ample free space -> auto-pick
    monkeypatch.setattr(
        sess.os, "statvfs", lambda p: FakeStat(64 << 30)
    )
    got = sess._fast_scratch_dir()
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        assert got == "/dev/shm/daskberg-scratch"
    else:
        assert got is None

    # branch 2: below the floor -> fall back to None
    monkeypatch.setattr(
        sess.os, "statvfs", lambda p: FakeStat(1 << 30)
    )
    assert sess._fast_scratch_dir() is None

    # configurable floor: a tiny floor re-admits the small tmpfs
    monkeypatch.setenv("SPARK_GRAFT_SHM_MIN_FREE_BYTES", str(1 << 20))
    got = sess._fast_scratch_dir()
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        assert got == "/dev/shm/daskberg-scratch"

    # explicit override bypasses the guard entirely
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", "/tmp/explicit-scratch")
    assert sess._fast_scratch_dir() == "/tmp/explicit-scratch"
