"""Metadata-only aggregate pushdown (``iceberg.agg.agg_pushdown``).

Contract: COUNT/MIN/MAX answer from manifest stats wherever PROVABLY
sound and scan only the residual files; the combined answer always
equals the full-scan aggregate.  The gates under test: row-level
deletes (DV cardinality keeps count(*) metadata-only; min/max must
scan the affected file), NaN on float columns (Spark orders NaN
greatest — bounds exclude it), all-NULL columns, truncation-unsafe
string bounds (refined scan), and the fully-deleted-file cap trap in
the bounds refinement.
"""

from __future__ import annotations

import math
import tempfile

import pytest

import daskberg_spark.iceberg.agg  # noqa: F401  (attaches .agg_pushdown)
import daskberg_spark.iceberg.scan  # noqa: F401  (attaches .to_df)
from daskberg_spark.iceberg.metadata import IcebergTable
from daskberg_spark.iceberg.writer import IcebergWriter, delete_where_dv_spark


def _writer(path, partitioned=True):
    spec = (
        [{"name": "cat", "transform": "identity", "source": "cat"}]
        if partitioned
        else []
    )
    return IcebergWriter(
        path,
        [
            {"id": 1, "name": "k", "type": "long", "required": False},
            {"id": 2, "name": "cat", "type": "string", "required": False},
            {"id": 3, "name": "v", "type": "double", "required": False},
            {"id": 4, "name": "s", "type": "string", "required": False},
        ],
        spec,
    )


def _mk(path, rows_by_cat):
    w = _writer(path)
    for cat, rows in rows_by_cat.items():
        w.append(
            [
                {"k": k, "cat": cat, "v": v, "s": s}
                for k, v, s in rows
            ]
        )
    return w


def test_pure_metadata_zero_scan(spark):
    path = tempfile.mkdtemp(prefix="aggpush_")
    _mk(
        path,
        {
            "a": [(1, 1.5, "apple"), (2, 2.5, "berry")],
            "b": [(10, -3.0, "cherry"), (20, 9.0, "date")],
        },
    )
    t = IcebergTable(path)
    out = t.agg_pushdown(
        spark,
        [
            ("count", "*", "n"),
            ("count", "k", "n_k"),
            ("min", "k", "min_k"),
            ("max", "k", "max_k"),
            ("min", "v", "min_v"),
            ("max", "v", "max_v"),
        ],
    )
    row = out.first()
    assert (row.n, row.n_k, row.min_k, row.max_k) == (4, 4, 1, 20)
    assert (row.min_v, row.max_v) == (-3.0, 9.0)
    assert t.last_agg_pushdown["files_scanned"] == 0
    assert t.last_scan["files_scanned"] == 0


def test_filtered_hybrid_matches_full_scan(spark):
    path = tempfile.mkdtemp(prefix="aggpush_")
    t_rows = {
        c: [(i + off, float(i), f"s{i}") for i in range(10)]
        for off, c in ((0, "a"), (100, "b"), (200, "c"))
    }
    _mk(path, t_rows)
    t = IcebergTable(path)
    filters = [("k", ">=", 5)]
    out = t.agg_pushdown(
        spark,
        [("count", "*", "n"), ("min", "k", "min_k"), ("max", "k", "max_k")],
        filters=filters,
    ).first()
    # oracle: full scan with the same filter
    import pyspark.sql.functions as F

    ora = (
        t.to_df(spark, filters=filters)
        .agg(F.count(F.lit(1)), F.min("k"), F.max("k"))
        .first()
    )
    assert (out.n, out.min_k, out.max_k) == tuple(ora)
    # files 'b' (100..109) and 'c' (200..209) wholly match k>=5 → only the
    # boundary file 'a' scans
    assert t.last_agg_pushdown["files_scanned"] == 1


def test_dv_delete_count_stays_metadata_minmax_scans(spark):
    path = tempfile.mkdtemp(prefix="aggpush_")
    w = _mk(
        path,
        {
            "a": [(i, float(i), f"s{i}") for i in range(10)],
            "b": [(100 + i, 100.0 + i, f"t{i}") for i in range(10)],
        },
    )
    # DV-delete the max row of partition b
    import pyspark.sql.functions as F

    delete_where_dv_spark(w, spark, F.col("k") == 109)
    t = IcebergTable(path)
    out = t.agg_pushdown(
        spark,
        [("count", "*", "n"), ("max", "k", "max_k"), ("min", "k", "min_k")],
    ).first()
    assert (out.n, out.max_k, out.min_k) == (19, 108, 0)
    # count(*) subtracted the DV cardinality without scanning; min/max
    # had to scan the DV-affected file (its extremum may be deleted —
    # and here the max row genuinely was)
    rep = t.last_agg_pushdown
    assert rep["files_scanned"] == 1
    assert rep["meta_files"]["n"] == rep["files_planned"]


def test_eq_delete_forces_scan_but_stays_exact(spark):
    path = tempfile.mkdtemp(prefix="aggpush_")
    w = _mk(
        path,
        {"a": [(i, float(i), f"s{i}") for i in range(5)]},
    )
    w.delete_rows_equality([{"k": 4}])
    t = IcebergTable(path)
    out = t.agg_pushdown(
        spark, [("count", "*", "n"), ("max", "k", "max_k")]
    ).first()
    assert (out.n, out.max_k) == (4, 3)
    assert t.last_agg_pushdown["files_scanned"] == 1


def test_nan_gating_matches_spark_semantics(spark):
    path = tempfile.mkdtemp(prefix="aggpush_")
    w = _writer(path)
    w.append([{"k": 1, "cat": "a", "v": 5.0, "s": "x"}])
    w.append([{"k": 2, "cat": "b", "v": math.nan, "s": "y"}])
    t = IcebergTable(path)
    out = t.agg_pushdown(
        spark, [("max", "v", "max_v"), ("min", "v", "min_v")]
    ).first()
    # Spark orders NaN greatest: max = NaN, min = 5.0
    assert math.isnan(out.max_v)
    assert out.min_v == 5.0
    import pyspark.sql.functions as F

    ora = t.to_df(spark).agg(F.max("v"), F.min("v")).first()
    assert math.isnan(ora[0]) and ora[1] == 5.0
    # the NaN-free file answered from metadata; only the NaN file scanned
    assert t.last_agg_pushdown["files_scanned"] == 1


def test_all_null_column(spark):
    path = tempfile.mkdtemp(prefix="aggpush_")
    w = _writer(path, partitioned=False)
    w.append([{"k": 1, "cat": "a", "v": None, "s": None}])
    w.append([{"k": 2, "cat": "b", "v": None, "s": None}])
    t = IcebergTable(path)
    out = t.agg_pushdown(
        spark,
        [
            ("count", "*", "n"),
            ("count", "v", "n_v"),
            ("min", "v", "min_v"),
            ("max", "s", "max_s"),
        ],
    ).first()
    assert (out.n, out.n_v, out.min_v, out.max_s) == (2, 0, None, None)
    assert t.last_agg_pushdown["files_scanned"] == 0


def test_string_bounds_refinement_skips_files(spark):
    """Strings never answer min/max from (possibly truncated) bounds,
    but the refinement proves which files CANNOT hold the extremum:
    with ranges apple..cherry and xray..zulu, min scans only the low
    file and max only the high file."""
    path = tempfile.mkdtemp(prefix="aggpush_")
    _mk(
        path,
        {
            "a": [(1, 1.0, "apple"), (2, 2.0, "cherry")],
            "b": [(3, 3.0, "xray"), (4, 4.0, "zulu")],
        },
    )
    t = IcebergTable(path)
    out = t.agg_pushdown(spark, [("min", "s", "min_s")])
    assert out.first().min_s == "apple"
    assert t.last_agg_pushdown["files_scanned"] == 1
    out = t.agg_pushdown(spark, [("max", "s", "max_s")])
    assert out.first().max_s == "zulu"
    assert t.last_agg_pushdown["files_scanned"] == 1


def test_refinement_cap_ignores_fully_deleted_files(spark):
    """The cap trap: a fully-deleted file's stale upper bound must not
    shrink the refinement cap — otherwise the file genuinely holding
    the minimum gets skipped and the answer is silently wrong."""
    path = tempfile.mkdtemp(prefix="aggpush_")
    w = _mk(
        path,
        {
            "a": [(1, 1.0, "aaa"), (2, 2.0, "bbb")],  # low range...
            "b": [(3, 3.0, "xxx"), (4, 4.0, "yyy")],
        },
    )
    # kill ALL of partition a's rows (the low string range)
    w.delete_rows_equality([{"k": 1}, {"k": 2}])
    t = IcebergTable(path)
    out = t.agg_pushdown(spark, [("min", "s", "min_s")]).first()
    assert out.min_s == "xxx"  # 'aaa'/'bbb' are dead; b holds the min


def test_empty_table(spark):
    path = tempfile.mkdtemp(prefix="aggpush_")
    _writer(path)  # schema only, no snapshot... commit an empty append
    w = _writer(path)
    w.append([])
    t = IcebergTable(path)
    out = t.agg_pushdown(
        spark, [("count", "*", "n"), ("min", "k", "min_k")]
    ).first()
    assert (out.n, out.min_k) == (0, None)


def test_validation():
    path = tempfile.mkdtemp(prefix="aggpush_")
    w = _writer(path)
    w.append([{"k": 1, "cat": "a", "v": 1.0, "s": "x"}])
    t = IcebergTable(path)
    with pytest.raises(ValueError, match="unsupported aggregate"):
        t.agg_pushdown(None, [("median", "k", "x")])
    # sum is supported since r11 (sumstats.py) — but only on exactly-
    # summable types; float sums are order-dependent and refused
    with pytest.raises(ValueError, match="no exact decomposable sum"):
        t.agg_pushdown(None, [("sum", "v", "x")])
    with pytest.raises(ValueError, match="not an aggregate"):
        t.agg_pushdown(None, [("min", "*", "x")])
    with pytest.raises(ValueError, match="unknown column"):
        t.agg_pushdown(None, [("min", "nope", "x")])
    with pytest.raises(ValueError, match="duplicate alias"):
        t.agg_pushdown(None, [("count", "*", "x"), ("min", "k", "x")])


def test_randomized_vs_full_scan_oracle(spark):
    """Randomized differential: random small tables (NULLs, NaNs,
    duplicate keys, optional equality deletes, random filters) — the
    pushdown answer must equal the full-scan aggregate every time.
    Seeded, so failures reproduce."""
    import random

    import pyspark.sql.functions as F

    rng = random.Random(20260815)
    for trial in range(12):
        path = tempfile.mkdtemp(prefix=f"aggprop{trial}_")
        w = _writer(path, partitioned=trial % 2 == 0)
        n_files = rng.randint(1, 4)
        for _ in range(n_files):
            rows = []
            for _ in range(rng.randint(0, 30)):
                k = rng.choice([None, rng.randint(-50, 50)])
                v = rng.choice(
                    [None, math.nan, float(rng.randint(-99, 99)) / 4]
                )
                s = rng.choice([None, "", "a", "zz", f"s{rng.randint(0, 9)}"])
                rows.append(
                    {"k": k, "cat": rng.choice("abc"), "v": v, "s": s}
                )
            w.append(rows)
        if rng.random() < 0.5:
            keys = [
                {"k": rng.randint(-50, 50)} for _ in range(rng.randint(1, 3))
            ]
            w.delete_rows_equality(keys)
        filters = rng.choice(
            [
                None,
                [("k", ">=", rng.randint(-40, 40))],
                [("cat", "==", rng.choice("abc"))],
                [("k", "<", 0), ("cat", "!=", "b")],
            ]
        )
        t = IcebergTable(path)
        aggs = [
            ("count", "*", "n"),
            ("count", "k", "n_k"),
            ("count", "v", "n_v"),
            ("min", "k", "min_k"),
            ("max", "k", "max_k"),
            ("min", "v", "min_v"),
            ("max", "v", "max_v"),
            ("min", "s", "min_s"),
            ("max", "s", "max_s"),
        ]
        got = t.agg_pushdown(spark, aggs, filters=filters).first()
        df = t.to_df(spark, filters=filters)
        exp = df.agg(
            F.count(F.lit(1)),
            F.count("k"),
            F.count("v"),
            F.min("k"),
            F.max("k"),
            F.min("v"),
            F.max("v"),
            F.min("s"),
            F.max("s"),
        ).first()

        def same(a, b):
            if a is None or b is None:
                return a is b
            if isinstance(a, float) and isinstance(b, float):
                return (a != a and b != b) or a == b
            return a == b

        for i, (_, _, alias) in enumerate(aggs):
            assert same(got[alias], exp[i]), (
                trial,
                alias,
                got[alias],
                exp[i],
                filters,
            )


def test_grouped_pushdown_matches_groupby(spark):
    import pyspark.sql.functions as F

    path = tempfile.mkdtemp(prefix="agggrp_")
    w = _mk(
        path,
        {
            "a": [(1, 1.0, "x"), (2, 2.0, None)],
            "b": [(10, 5.0, "y")],
            "c": [(7, None, "z")],
        },
    )
    t = IcebergTable(path)
    got = {
        r.cat: (r.n, r.n_s, r.min_k, r.max_k)
        for r in t.agg_pushdown(
            spark,
            [
                ("count", "*", "n"),
                ("count", "s", "n_s"),
                ("min", "k", "min_k"),
                ("max", "k", "max_k"),
            ],
            group_by=["cat"],
        ).collect()
    }
    exp = {
        r.cat: (r.n, r.n_s, r.min_k, r.max_k)
        for r in t.to_df(spark)
        .groupBy("cat")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("s").alias("n_s"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .collect()
    }
    assert got == exp
    assert t.last_agg_pushdown["files_scanned"] == 0
    # a whole-group delete removes its row entirely (SQL GROUP BY
    # semantics: empty groups don't exist)
    w.delete_rows_equality([{"k": 10}])
    t = IcebergTable(path)
    got2 = {
        r.cat: r.n
        for r in t.agg_pushdown(
            spark, [("count", "*", "n")], group_by=["cat"]
        ).collect()
    }
    assert got2 == {"a": 2, "c": 1}


def test_grouped_pushdown_filtered_hybrid(spark):
    import pyspark.sql.functions as F

    path = tempfile.mkdtemp(prefix="agggrp_")
    _mk(
        path,
        {
            c: [(i + off, float(i), f"s{i}") for i in range(10)]
            for off, c in ((0, "a"), (100, "b"), (200, "c"))
        },
    )
    t = IcebergTable(path)
    filters = [("k", ">=", 5)]
    got = {
        r.cat: (r.n, r.max_k)
        for r in t.agg_pushdown(
            spark,
            [("count", "*", "n"), ("max", "k", "max_k")],
            filters=filters,
            group_by=["cat"],
        ).collect()
    }
    exp = {
        r.cat: (r.n, r.mx)
        for r in t.to_df(spark, filters=filters)
        .groupBy("cat")
        .agg(F.count(F.lit(1)).alias("n"), F.max("k").alias("mx"))
        .collect()
    }
    assert got == exp
    assert t.last_agg_pushdown["files_scanned"] == 1  # only the boundary


def test_grouped_pushdown_validation(spark):
    path = tempfile.mkdtemp(prefix="agggrp_")
    w = _writer(path)
    w.append([{"k": 1, "cat": "a", "v": 1.0, "s": "x"}])
    t = IcebergTable(path)
    with pytest.raises(ValueError, match="not identity-partitioned"):
        t.agg_pushdown(spark, [("count", "*", "n")], group_by=["k"])
    with pytest.raises(ValueError, match="unknown group column"):
        t.agg_pushdown(spark, [("count", "*", "n")], group_by=["nope"])


def test_grouped_rejects_collisions_and_empty(spark):
    path = tempfile.mkdtemp(prefix="agggrp_")
    w = _writer(path)
    w.append([{"k": 1, "cat": "a", "v": 1.0, "s": "x"}])
    t = IcebergTable(path)
    with pytest.raises(ValueError, match="at least one aggregate"):
        t.agg_pushdown(spark, [], group_by=["cat"])
    with pytest.raises(ValueError, match="internal columns"):
        t.agg_pushdown(spark, [("min", "k", "__exist")])
    with pytest.raises(ValueError, match="collides with an aggregate"):
        t.agg_pushdown(spark, [("max", "k", "cat")], group_by=["cat"])


def test_grouped_old_spec_nonidentity_same_name_scans(spark):
    """A file written under an older spec whose SAME-NAMED partition
    field used a non-identity transform must route to the scan — its
    recorded partition value is a transform result, not the group."""
    import pyspark.sql.functions as F

    path = tempfile.mkdtemp(prefix="agggrp_")
    w = IcebergWriter(
        path,
        [
            {"id": 1, "name": "k", "type": "long", "required": False},
            {"id": 2, "name": "cat", "type": "string", "required": False},
        ],
        [{"name": "cat", "transform": "truncate[1]", "source": "cat"}],
    )
    w.append([{"k": 1, "cat": "apple"}, {"k": 2, "cat": "avocado"}])
    w.update_partition_spec(
        [{"name": "cat", "transform": "identity", "source": "cat"}]
    )
    w.append([{"k": 3, "cat": "banana"}])
    t = IcebergTable(path)
    got = {
        r.cat: r.n
        for r in t.agg_pushdown(
            spark, [("count", "*", "n")], group_by=["cat"]
        ).collect()
    }
    exp = {
        r.cat: r.n
        for r in t.to_df(spark)
        .groupBy("cat")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp  # NOT {'a': 2, 'banana': 1}
    # the truncate-spec file had to scan; the identity file did not
    assert t.last_agg_pushdown["files_scanned"] == 1


def test_agg_auto_strategy_ladder(spark, tmp_path):
    """agg_auto picks the cheapest exact rung and records the route:
    fresh rollup for non-partition grouping, metadata pushdown for
    partition grouping/whole-table, plain scan for shapes the
    statistics layer refuses (float sums) — all equal to SQL."""
    import daskberg_spark.iceberg.scan  # noqa: F401
    from daskberg_spark.iceberg.agg import agg_auto
    from daskberg_spark.iceberg.rollup import create_rollup
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "t"),
        [
            {"id": 1, "name": "id", "type": "long", "required": False},
            {"id": 2, "name": "grp", "type": "string", "required": False},
            {"id": 3, "name": "part", "type": "int", "required": False},
            {"id": 4, "name": "v", "type": "int", "required": False},
            {"id": 5, "name": "f", "type": "double", "required": False},
        ],
        [{"name": "part", "transform": "identity", "source": "part"}],
    )
    rows = [
        {
            "id": i,
            "grp": "ab"[i % 2],
            "part": i % 3,
            "v": None if i % 7 == 0 else i,
            "f": i * 0.5,
        }
        for i in range(60)
    ]
    for p in range(3):
        w.append([r for r in rows if r["part"] == p])
    t = IcebergTable(w.path)
    create_rollup(
        spark, t, str(tmp_path / "ru"), ["grp"], ["v"], source_writer=w
    )
    t = IcebergTable(w.path)
    t.to_df(spark).createOrReplaceTempView("__auto")

    def truth(sql):
        return sorted(map(tuple, spark.sql(sql).collect()))

    # 1. non-partition grouping → rollup
    out = agg_auto(
        t, spark, [("count", "*", "n"), ("sum", "v", "s")], group_by=["grp"]
    )
    assert t.last_agg_route == "rollup"
    assert sorted(map(tuple, out.collect())) == truth(
        "SELECT grp, count(*), cast(sum(v) as decimal(38,0)) FROM __auto GROUP BY grp"
    )
    # 2. identity-partition grouping → pushdown (no rollup covers part)
    out = agg_auto(
        t, spark, [("count", "*", "n"), ("min", "id", "m")], group_by=["part"]
    )
    assert t.last_agg_route == "pushdown"
    assert sorted(map(tuple, out.collect())) == truth(
        "SELECT part, count(*), min(id) FROM __auto GROUP BY part"
    )
    # 3. float sum → the statistics layer refuses → plain scan
    out = agg_auto(t, spark, [("sum", "f", "s")])
    assert t.last_agg_route == "scan"
    assert out.first().s == spark.sql("SELECT sum(f) s FROM __auto").first().s
    # 4. whole-table battery → pushdown
    out = agg_auto(t, spark, [("count", "*", "n"), ("max", "v", "mx")])
    assert t.last_agg_route == "pushdown"
    assert tuple(out.first()) == tuple(
        spark.sql("SELECT count(*), max(v) FROM __auto").first()
    )
