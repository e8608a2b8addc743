"""Join-derived runtime file pruning (``scan.join_pruned_df``) — the
planner-level analogue of Spark's dynamic partition pruning.

Contract: for inner/semi star joins with a broadcast-sized dim, the fact
scan reads ONLY files whose key stats/partitions intersect the dim's
surviving keys, and the result is row-identical to the unpruned join.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

import daskberg_spark.iceberg.scan  # noqa: F401
from daskberg_spark.iceberg.metadata import IcebergTable
from daskberg_spark.iceberg.scan import join_pruned_df
from daskberg_spark.iceberg.writer import IcebergWriter


@pytest.fixture()
def fact_table(spark):
    path = tempfile.mkdtemp(prefix="jp_fact_")
    w = IcebergWriter(
        path,
        [
            {"id": 1, "name": "k", "type": "long", "required": False},
            {"id": 2, "name": "grp", "type": "long", "required": False},
            {"id": 3, "name": "v", "type": "double", "required": False},
        ],
        [{"name": "grp", "transform": "identity", "source": "grp"}],
    )
    w.append(
        [
            {"k": g * 100 + i, "grp": g, "v": float(i)}
            for g in range(8)
            for i in range(5)
        ]
    )
    return IcebergTable(path)


def _dim(spark, groups):
    return spark.createDataFrame([(g,) for g in groups], "g long")


def test_prunes_fact_files_and_matches_unpruned(spark, fact_table):
    dim = _dim(spark, [2, 5])
    res = join_pruned_df(fact_table, spark, dim, "grp", "g")
    assert len(set(res.inputFiles())) == 2  # 2 of 8 partition files
    got = sorted((r.grp, r.k) for r in res.collect())
    full = fact_table.to_df(spark).join(
        F.broadcast(dim), F.col("grp") == F.col("g")
    )
    assert got == sorted((r.grp, r.k) for r in full.collect())
    assert len(got) == 10


def test_semi_join_keeps_fact_columns_only(spark, fact_table):
    dim = _dim(spark, [3])
    res = join_pruned_df(fact_table, spark, dim, "grp", "g", how="semi")
    assert set(res.columns) == {"k", "grp", "v"}
    assert sorted(r.k for r in res.collect()) == [300 + i for i in range(5)]


def test_range_fallback_above_max_keys(spark, fact_table):
    """max_keys exceeded → [min, max] range filter still prunes the
    outside files and the join still fixes up exact membership."""
    dim = _dim(spark, [1, 3])
    res = join_pruned_df(fact_table, spark, dim, "grp", "g", max_keys=1)
    # range [1, 3] keeps groups 1-3 (3 files of 8); join drops group 2
    assert len(set(res.inputFiles())) == 3
    assert sorted({r.grp for r in res.collect()}) == [1, 3]


def test_empty_dim_scans_nothing(spark, fact_table):
    dim = _dim(spark, []).filter("g > 0")
    res = join_pruned_df(fact_table, spark, dim, "grp", "g")
    assert res.count() == 0
    assert len(set(res.inputFiles())) == 0


def test_outer_join_rejected(spark, fact_table):
    with pytest.raises(ValueError):
        join_pruned_df(
            fact_table, spark, _dim(spark, [1]), "grp", "g", how="left"
        )


def test_extra_filters_and_merge(spark, fact_table):
    dim = _dim(spark, [2, 5])
    res = join_pruned_df(
        fact_table, spark, dim, "grp", "g", filters=[("k", "<", 500)]
    )
    # group 5 file pruned by the AND-merged k<500 bound (keys 500-504)
    assert len(set(res.inputFiles())) == 1
    assert sorted(r.k for r in res.collect()) == [200 + i for i in range(5)]


def test_join_prune_through_bucket_transform(spark):
    """Join-derived keys prune through a bucket[N] partition spec: the
    in-filter's equality shape rewrites through the murmur3 bucket, so
    a 2-key dim reads at most 2 bucket files of 8."""
    import tempfile

    path = tempfile.mkdtemp(prefix="jp_bucket_")
    w = IcebergWriter(
        path,
        [
            {"id": 1, "name": "k", "type": "long", "required": False},
            {"id": 2, "name": "v", "type": "double", "required": False},
        ],
        [{"name": "k_bucket", "transform": "bucket[8]", "source": "k"}],
    )
    w.append([{"k": i, "v": float(i)} for i in range(400)])
    t = IcebergTable(path)
    all_files = len(t.plan_files(None))
    assert all_files > 2
    dim = spark.createDataFrame([(7,), (311,)], "g long")
    res = join_pruned_df(t, spark, dim, "k", "g")
    assert len(set(res.inputFiles())) <= 2
    assert sorted(r.k for r in res.collect()) == [7, 311]
