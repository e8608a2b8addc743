"""Equi-depth quantile histograms (``iceberg.quantiles``) and their CBO
consumption: range selectivity measured from data beats the System R
1/3 guess, never changes results (estimates feed plan CHOICE only),
and coexists with every other statistics flavor on one snapshot."""

from __future__ import annotations

import datetime

import pytest

import daskberg_spark.iceberg.scan  # noqa: F401  (attaches .to_df)
from daskberg_spark.iceberg.cbo import JoinDim, estimated_rows, plan_star_join
from daskberg_spark.iceberg.metadata import IcebergTable
from daskberg_spark.iceberg.quantiles import (
    range_selectivity,
    value_to_number,
    write_quantile_statistics,
)
from daskberg_spark.iceberg.writer import IcebergWriter, write_table_statistics


def _table(tmp_path, rows, name="t", extra_fields=(), field_type="long"):
    w = IcebergWriter(
        str(tmp_path / name),
        [
            {"id": 1, "name": "v", "type": field_type, "required": False},
            {"id": 2, "name": "k", "type": "long", "required": False},
            *extra_fields,
        ],
    )
    w.append(rows)
    return w


def test_histogram_bounds_and_uniform_cdf(spark, tmp_path):
    w = _table(tmp_path, [{"v": i, "k": i} for i in range(1000)])
    path = write_quantile_statistics(w, spark, ["v"])
    assert path and path.endswith(".puffin")
    t = IcebergTable(w.path)
    hist = t.column_quantiles("v")
    assert hist["rows"] == 1000 and hist["nonnull"] == 1000
    bounds = hist["bounds"]
    assert len(bounds) == hist["buckets"] + 1
    assert bounds == sorted(bounds)
    assert bounds[0] == 0.0 and bounds[-1] == 999.0
    # uniform data: selectivity of v >= 900 is ~10%, not 33%
    s = range_selectivity(hist, ">=", 900.0)
    assert 0.08 <= s <= 0.12, s
    assert range_selectivity(hist, "<", 0.0) == 0.0
    assert range_selectivity(hist, ">=", 0.0) == 1.0
    assert range_selectivity(hist, "<=", 10**9) == 1.0


def test_estimated_rows_uses_histogram(spark, tmp_path):
    w = _table(tmp_path, [{"v": i, "k": i} for i in range(1000)])
    t = IcebergTable(w.path)
    # no stats: the 1/3 heuristic
    naive = estimated_rows(t, [("v", ">=", 900)])
    assert abs(naive - 1000 / 3) < 1.0
    write_quantile_statistics(w, spark, ["v"])
    t = IcebergTable(w.path)
    measured = estimated_rows(t, [("v", ">=", 900)])
    assert 80 <= measured <= 120, measured


def test_skewed_tail_selectivity(spark, tmp_path):
    # 95% of rows in [0, 10), a 5% tail spread to 10_000
    rows = [{"v": i % 10, "k": i} for i in range(950)] + [
        {"v": 10 + i * 200, "k": i} for i in range(50)
    ]
    w = _table(tmp_path, rows)
    write_quantile_statistics(w, spark, ["v"])
    hist = IcebergTable(w.path).column_quantiles("v")
    s_tail = range_selectivity(hist, ">=", 10.0)
    assert s_tail <= 0.08, s_tail  # measured ~5%, not 33%
    s_head = range_selectivity(hist, "<", 10.0)
    assert s_head >= 0.92, s_head


def test_null_fraction_scales_selectivity(spark, tmp_path):
    rows = [
        {"v": (i if i % 2 == 0 else None), "k": i} for i in range(1000)
    ]
    w = _table(tmp_path, rows)
    write_quantile_statistics(w, spark, ["v"])
    hist = IcebergTable(w.path).column_quantiles("v")
    assert hist["rows"] == 1000 and hist["nonnull"] == 500
    # every non-null satisfies v >= 0, but nulls never do: sel == 0.5
    assert abs(range_selectivity(hist, ">=", 0.0) - 0.5) < 1e-9


def test_temporal_columns_and_string_values(spark, tmp_path):
    rows = [
        {
            "v": datetime.date(2024, 1, 1) + datetime.timedelta(days=i),
            "k": i,
        }
        for i in range(365)
    ]
    w = _table(tmp_path, rows, field_type="date")
    write_quantile_statistics(w, spark, ["v"])
    t = IcebergTable(w.path)
    # ISO-string predicate value lands on the epoch-day rank domain
    est = estimated_rows(t, [("v", ">=", "2024-12-01")])
    assert 20 <= est <= 45, est  # ~31/365 ≈ 8.5% of rows
    v = value_to_number("2024-06-01", "date")
    assert v == (datetime.date(2024, 6, 1) - datetime.date(1970, 1, 1)).days


def test_star_join_order_flips_on_measured_ranges(spark, tmp_path):
    """Two range-filtered dims: the 1/3 guess ranks the BIG dim's
    barely-selective filter equal to the small dim's razor-sharp one;
    histograms measure 1% vs 60% and flip the order."""
    fact_rows = [
        {"v": None, "k": None, "fa": i % 2000, "fb": i % 1000}
        for i in range(6000)
    ]
    fact = IcebergWriter(
        str(tmp_path / "fact"),
        [
            {"id": 1, "name": "v", "type": "long", "required": False},
            {"id": 2, "name": "k", "type": "long", "required": False},
            {"id": 3, "name": "fa", "type": "long", "required": False},
            {"id": 4, "name": "fb", "type": "long", "required": False},
        ],
    )
    fact.append(fact_rows)
    # dim A: 2000 rows, filter v >= 1980 keeps 1%
    dima = _table(tmp_path, [{"v": i, "k": i} for i in range(2000)], "dima")
    # dim B: 1000 rows, filter v >= 400 keeps 60%
    dimb = _table(tmp_path, [{"v": i, "k": i} for i in range(1000)], "dimb")
    for w in (fact, dima, dimb):
        write_table_statistics(w, spark)
    ta, tb = IcebergTable(dima.path), IcebergTable(dimb.path)
    tf = IcebergTable(fact.path)
    # unique-key dims under the 1/3 guess ALL score growth 1/3
    # ((rows/3) / ndv(rows)) — a tie broken by label, so the sharp dim
    # 'z' sorts LAST; the histograms measure 1% vs 60% and flip it
    dims = [
        JoinDim(ta, "fa", "k", filters=[("v", ">=", 1980)], name="z"),
        JoinDim(tb, "fb", "k", filters=[("v", ">=", 400)], name="b"),
    ]
    naive = plan_star_join(tf, dims)
    assert naive.order == ["b", "z"]
    assert abs(naive.estimates["b"] - naive.estimates["z"]) < 1e-9
    for w in (dima, dimb):
        write_quantile_statistics(w, spark, ["v"])
    ta, tb = IcebergTable(dima.path), IcebergTable(dimb.path)
    dims = [
        JoinDim(ta, "fa", "k", filters=[("v", ">=", 1980)], name="z"),
        JoinDim(tb, "fb", "k", filters=[("v", ">=", 400)], name="b"),
    ]
    measured = plan_star_join(tf, dims)
    assert measured.order == ["z", "b"]  # 20 rows vs 600 rows
    assert measured.estimates["z"] < measured.estimates["b"]


def test_quantiles_coexist_with_other_statistics(spark, tmp_path):
    """NDV re-runs must not evict quantile or token-bloom entries (the
    _publish_statistics keep-rule covers every daskberg-* extension)."""
    from daskberg_spark.iceberg.bloomindex import write_token_blooms
    from daskberg_spark.iceberg.quantiles import QUANTILE_BLOB_TYPE

    w = IcebergWriter(
        str(tmp_path / "mix"),
        [
            {"id": 1, "name": "v", "type": "long", "required": False},
            {"id": 2, "name": "txt", "type": "string", "required": False},
        ],
    )
    w.append([{"v": i, "txt": f"word{i} common"} for i in range(100)])
    write_table_statistics(w, spark)
    write_quantile_statistics(w, spark, ["v"])
    write_token_blooms(w, spark, ["txt"])
    write_table_statistics(w, spark)  # NDV re-run replaces ONLY itself
    t = IcebergTable(w.path)
    types = {
        b["type"]
        for e in t.table_statistics()
        for b in e.get("blob-metadata", [])
    }
    assert {
        "apache-datasketches-theta-v1",
        QUANTILE_BLOB_TYPE,
        "daskberg-token-bloom-v1",
    } <= types
    assert t.column_quantiles("v") is not None
    assert t.column_ndv("v") == 100


def test_non_numeric_column_refused(spark, tmp_path):
    w = IcebergWriter(
        str(tmp_path / "s"),
        [{"id": 1, "name": "s", "type": "string", "required": False}],
    )
    w.append([{"s": "x"}])
    with pytest.raises(ValueError, match="numeric/temporal"):
        write_quantile_statistics(w, spark, ["s"])
    # default column selection simply skips it
    assert write_quantile_statistics(w, spark) is None


def test_percentile_pushdown_exact_at_knots(spark, tmp_path):
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from pyspark.sql import functions as F

    vals = [((i * 37) % 1000) for i in range(1000)]
    w = _table(tmp_path, [{"v": v, "k": i} for i, v in enumerate(vals)])
    write_quantile_statistics(w, spark, ["v"])
    t = IcebergTable(w.path)
    out = t.percentile_pushdown(
        spark, [("v", 0.25, "q1"), ("v", 0.5, "q2"), ("v", 1.0, "q3")]
    ).first()
    assert t.last_percentile_pushdown["scanned"] == []
    assert t.last_scan["files_scanned"] == 0
    exact = (
        t.to_df(spark, columns=["v"])
        .agg(
            F.percentile_approx(
                "v", F.array(F.lit(0.25), F.lit(0.5), F.lit(1.0)), F.lit(10000)
            )
        )
        .first()[0]
    )
    assert [out.q1, out.q2, out.q3] == list(exact)
    # off-knot p interpolates between its neighbors (still bounded)
    mid = t.percentile_pushdown(spark, [("v", 0.507, "m")]).first().m
    assert out.q2 <= mid <= max(vals)


def test_percentile_pushdown_scan_fallback(spark, tmp_path):
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from pyspark.sql import functions as F

    w = _table(tmp_path, [{"v": i, "k": 999 - i} for i in range(1000)])
    write_quantile_statistics(w, spark, ["v"])  # v only: k uncovered
    t = IcebergTable(w.path)
    out = t.percentile_pushdown(
        spark, [("v", 0.5, "pv"), ("k", 0.5, "pk")]
    ).first()
    rep = t.last_percentile_pushdown
    assert rep["from_stats"] == ["pv"] and rep["scanned"] == ["pk"]
    exact = (
        t.to_df(spark, columns=["k"])
        .agg(F.percentile_approx("k", F.lit(0.5), F.lit(10000)))
        .first()[0]
    )
    assert out.pk == exact


def test_percentile_pushdown_temporal_decode(spark, tmp_path):
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)

    rows = [
        {
            "v": datetime.date(2023, 1, 1) + datetime.timedelta(days=i),
            "k": i,
        }
        for i in range(400)
    ]
    w = _table(tmp_path, rows, field_type="date")
    write_quantile_statistics(w, spark, ["v"])
    t = IcebergTable(w.path)
    out = t.percentile_pushdown(spark, [("v", 0.5, "med")]).first()
    assert isinstance(out.med, datetime.date)
    assert out.med == datetime.date(2023, 1, 1) + datetime.timedelta(days=199)
    with pytest.raises(ValueError, match="outside"):
        t.percentile_pushdown(spark, [("v", 1.5, "x")])


def test_maintain_refreshes_quantiles(spark, tmp_path):
    """The nightly job keeps histograms fresh on opted-in tables: an
    append leaves the head uncovered -> maintain re-runs the SAME
    columns; a second run is a no-op (steady-state idempotence); tables
    that never opted in are never scanned."""
    from daskberg_spark.iceberg.writer import maintain

    w = _table(tmp_path, [{"v": i, "k": i} for i in range(500)])
    write_quantile_statistics(w, spark, ["v"])
    w.append([{"v": 500 + i, "k": i} for i in range(500)])
    rep = maintain(w, spark, min_file_bytes=0)
    assert rep["refresh_quantiles"] == ["v"]
    hist = IcebergTable(w.path).column_quantiles("v")
    assert hist["rows"] == 1000 and hist["bounds"][-1] == 999.0
    rep2 = maintain(w, spark, min_file_bytes=0)
    assert rep2["refresh_quantiles"] is None
    # never-opted-in table: no refresh attempted
    w2 = _table(tmp_path, [{"v": 1, "k": 1}], name="noopt")
    assert maintain(w2, spark, min_file_bytes=0)["refresh_quantiles"] is None


def test_rank_normalized_zorder_survives_skew(spark, tmp_path):
    """Min-max z-order collapses a skewed dimension (95% of rows share
    z-bucket 0 for it), degenerating to a sort on the OTHER column;
    rank normalization spreads the head across the full bit range so
    head-band predicates still prune.  Content identical either way."""
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        compact_files_spark,
    )

    def build(name):
        w = IcebergWriter(
            str(tmp_path / name),
            [
                {"id": 1, "name": "x", "type": "long", "required": False},
                {"id": 2, "name": "y", "type": "long", "required": False},
            ],
        )
        # x: 95% uniform in [0, 100), 5% tail out to ~1e6; y uniform —
        # interleaved appends so no file has bounds to start with
        rows = [
            {
                "x": ((i * 37) % 100)
                if i % 20
                else 1000 + (i * 9973) % 1_000_000,
                "y": (i * 13) % 1000,
            }
            for i in range(4000)
        ]
        for b in range(4):
            w.append(rows[b::4])
        return w

    pred = [("x", ">=", 20), ("x", "<=", 29), ("y", ">=", 100), ("y", "<=", 199)]
    results = {}
    for name, rank in (("mm", False), ("rank", True)):
        w = build(name)
        before = sorted(
            (r["x"], r["y"])
            for r in IcebergTable(w.path).to_df(spark).collect()
        )
        assert compact_files_spark(
            w,
            spark,
            target_partitions=16,
            zorder_by=["x", "y"],
            zorder_rank_normalize=rank,
        ) is not None
        t = IcebergTable(w.path)
        after = sorted(
            (r["x"], r["y"]) for r in t.to_df(spark).collect()
        )
        assert after == before  # clustering never changes content
        results[name] = len(t.plan_files(pred))
        got = sorted(
            (r["x"], r["y"])
            for r in t.to_df(spark, filters=pred).collect()
        )
        expect = sorted(
            p for p in before if 20 <= p[0] <= 29 and 100 <= p[1] <= 199
        )
        assert got == expect
    # the head-band query prunes strictly harder under rank
    # normalization; min-max leaves x unprunable for head values
    assert results["rank"] < results["mm"], results


def test_analyze_table_nulls_deletes_and_fallbacks(spark, tmp_path):
    """analyze_table stays EXACT on tables without statistics (HLL
    fallback for NDV is exact at this scale), under NULL columns, and
    after a row-level delete — everything routes through the same
    soundness-gated pushdown."""
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)

    w = _table(
        tmp_path,
        [{"v": (i if i % 4 else None), "k": i % 10} for i in range(100)],
    )
    w.delete_rows_equality([{"k": 3}])  # kills 10 rows
    t = IcebergTable(w.path)
    got = {r.column: r for r in t.analyze_table(spark).collect()}
    assert got["v"].row_count == 90
    # v NULL when i % 4 == 0 and i % 10 != 3 -> 23 of the 90 live rows
    live = [i for i in range(100) if i % 10 != 3]
    assert got["v"].null_count == sum(1 for i in live if i % 4 == 0)
    # no theta stats on this table -> the NDV comes from the HLL scan
    # fallback, approximate by design (~2% rsd) — never a wrong answer
    # from stats, merely an estimate where only an estimate was asked
    exact_ndv = len({i for i in live if i % 4})
    assert abs(got["v"].ndv - exact_ndv) <= max(2, exact_ndv // 25)
    assert abs(got["k"].ndv - 9) <= 1 and got["k"].null_count == 0
    assert got["k"].min_value == "0" and got["k"].max_value == "9"


def test_percentile_groupby_exact_at_knots(spark, tmp_path):
    """Grouped percentile battery answers from the grouped blob with
    zero data IO; on-knot p in exact mode equals the per-group exact
    order statistic; NULL group keys and all-NULL value groups are
    SQL-exact."""
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from daskberg_spark.iceberg.quantiles import (
        write_grouped_quantile_statistics,
    )

    rows = [
        {"v": i, "k": i % 3, "g": ["a", "b", None][i % 3]}
        for i in range(300)
    ]
    # one all-NULL-value group
    rows += [{"v": None, "k": 99, "g": "empty"} for _ in range(5)]
    w = _table(
        tmp_path,
        rows,
        extra_fields=[
            {"id": 3, "name": "g", "type": "string", "required": False}
        ],
    )
    path = write_grouped_quantile_statistics(w, spark, ["g"], ["v"])
    assert path and path.endswith(".puffin")
    t = IcebergTable(w.path)
    out = t.percentile_groupby(
        spark, [("v", 0.25, "p25"), ("v", 0.5, "p50")], ["g"]
    )
    assert t.last_percentile_groupby["route"] == "stats"
    assert t.last_scan["files_scanned"] == 0
    got = {r.g: (r.p25, r.p50) for r in out.collect()}
    # truth from one grouped pass over the raw rows
    truth = {
        r.g: (r.p25, r.p50)
        for r in t.to_df(spark)
        .groupBy("g")
        .agg(
            *[
                __import__("pyspark.sql.functions", fromlist=["x"])
                .percentile_approx("v", p, 1000000)
                .cast("long")
                .alias(a)
                for p, a in [(0.25, "p25"), (0.5, "p50")]
            ]
        )
        .collect()
    }
    assert got == truth, (got, truth)
    assert got["empty"] == (None, None)
    assert None in got  # the NULL group key round-trips


def test_percentile_groupby_staleness_and_mismatch_route_to_scan(
    spark, tmp_path
):
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from daskberg_spark.iceberg.quantiles import (
        write_grouped_quantile_statistics,
    )

    w = _table(tmp_path, [{"v": i, "k": i % 4} for i in range(200)])
    write_grouped_quantile_statistics(w, spark, ["k"], ["v"])
    t = IcebergTable(w.path)
    # a DIFFERENT grouping cannot use the blob
    out = t.percentile_groupby(spark, [("v", 0.5, "p50")], ["v"])
    assert t.last_percentile_groupby["route"] == "scan"
    # the matching grouping serves from stats...
    out = t.percentile_groupby(spark, [("v", 0.5, "p50")], ["k"])
    assert t.last_percentile_groupby["route"] == "stats"
    stats_vals = sorted(map(tuple, out.collect()))
    # ...until a commit stales the snapshot: route to scan, same values
    w.append([{"v": 10**6, "k": 0}])
    t2 = IcebergTable(w.path)
    out2 = t2.percentile_groupby(spark, [("v", 0.5, "p50")], ["k"])
    assert t2.last_percentile_groupby["route"] == "scan"
    scan_vals = sorted(map(tuple, out2.collect()))
    # k=0's median moved? regardless, both routes agree with a direct
    # recompute at THEIR OWN snapshots — check schema parity here
    assert out.schema == out2.schema
    assert len(scan_vals) == len(stats_vals) == 4


def test_grouped_quantiles_refuse_unbounded_groups(spark, tmp_path):
    from daskberg_spark.iceberg.quantiles import (
        write_grouped_quantile_statistics,
    )

    w = _table(tmp_path, [{"v": i, "k": i} for i in range(50)])
    with pytest.raises(ValueError, match="metadata-sized"):
        write_grouped_quantile_statistics(
            w, spark, ["k"], ["v"], max_groups=10
        )
    # float group keys can't round-trip JSON exactly: refused
    w2 = _table(
        tmp_path,
        [{"v": i, "k": i} for i in range(5)],
        name="t2",
        field_type="double",
    )
    with pytest.raises(ValueError, match="key on"):
        write_grouped_quantile_statistics(w2, spark, ["v"], ["k"])


def test_percentile_groupby_date_groups_and_temporal_values(
    spark, tmp_path
):
    """date group keys ISO-round-trip through the JSON blob; timestamp
    VALUE columns decode from the rank domain on both routes."""
    import datetime as dt

    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from daskberg_spark.iceberg.quantiles import (
        write_grouped_quantile_statistics,
    )

    w = IcebergWriter(
        str(tmp_path / "tt"),
        [
            {"id": 1, "name": "d", "type": "date", "required": False},
            {"id": 2, "name": "ts", "type": "timestamp", "required": False},
        ],
    )
    base = dt.datetime(2024, 1, 1)
    w.append(
        [
            {
                "d": (base + dt.timedelta(days=i % 3)).date(),
                "ts": base + dt.timedelta(minutes=i),
            }
            for i in range(90)
        ]
    )
    write_grouped_quantile_statistics(w, spark, ["d"], ["ts"])
    t = IcebergTable(w.path)
    out = t.percentile_groupby(spark, [("ts", 0.5, "p50")], ["d"])
    assert t.last_percentile_groupby["route"] == "stats"
    got = sorted(map(tuple, out.collect()))
    assert all(isinstance(r[0], dt.date) for r in got)
    # truth: group i%3==g holds minutes g, g+3, ..., g+87 — median is
    # the 15th of 30 values (exact-mode disc: lower-middle)
    for gi, (d, p50) in enumerate(got):
        mins = sorted(g for g in range(90) if g % 3 == gi)
        exact = base + dt.timedelta(minutes=mins[14])
        assert p50 == exact, (d, p50, exact)


def test_merge_cdf_parts_uniform_error_bound():
    """Merging per-part exact equi-depth CDFs recovers the global
    quantiles within the documented Σ n_p/K rank bound — checked on
    disjoint uniform shards whose exact answer is closed-form."""
    from daskberg_spark.iceberg.quantiles import merge_cdf_parts

    K = 16
    parts = []
    allv = []
    for lo in (0, 1000, 2000, 3000):
        vals = list(range(lo, lo + 1000))
        allv += vals
        bounds = [float(vals[round(i / K * 999)]) for i in range(K + 1)]
        parts.append((1000, 1000, bounds))
    rows, nn, merged = merge_cdf_parts(parts, 64)
    assert rows == nn == 4000 and len(merged) == 65
    assert merged == sorted(merged)
    assert merged[0] == 0.0 and merged[-1] == 3999.0
    allv.sort()
    tol = sum(1000 / K for _ in parts)  # rank tolerance
    for j, b in enumerate(merged):
        exact_rank = j / 64 * 4000
        # rank of merged knot b in the true data
        import bisect

        got_rank = bisect.bisect_right(allv, b)
        assert abs(got_rank - exact_rank) <= tol + 1, (j, b)
    # point-mass parts (constant files) merge too
    rows, nn, merged = merge_cdf_parts(
        [(10, 10, [5.0]), (10, 10, [7.0])], 4
    )
    assert merged[0] == 5.0 and merged[-1] == 7.0


def test_refresh_quantiles_incremental_on_append(spark, tmp_path):
    """Bootstrap writes partials for every file; a later append
    refreshes by reading ONLY the new file (O(new files), the r12
    mergeable-maintenance contract) and the merged histogram tracks
    the true distribution within the rank bound."""
    from daskberg_spark.iceberg.quantiles import (
        refresh_quantile_statistics,
    )

    w = _table(tmp_path, [{"v": i, "k": i} for i in range(400)])
    w.append([{"v": 400 + i, "k": i} for i in range(400)])
    rep = refresh_quantile_statistics(w, spark, ["v"])
    assert rep["files_total"] == 2 and rep["partials_computed"] == 2
    assert rep["dirty_files"] == 0
    t = IcebergTable(w.path)
    hist = t.column_quantiles("v")
    assert hist["merged"] is True
    assert hist["rows"] == hist["nonnull"] == 800
    assert hist["bounds"][0] == 0.0 and hist["bounds"][-1] == 799.0
    # CBO consumption unchanged
    s = range_selectivity(hist, ">=", 720.0)
    assert 0.07 <= s <= 0.13, s
    # append one more file: the refresh reads ONLY it
    w.append([{"v": 800 + i, "k": i} for i in range(400)])
    rep = refresh_quantile_statistics(w, spark)
    assert rep["files_total"] == 3 and rep["partials_computed"] == 1, rep
    hist = IcebergTable(w.path).column_quantiles("v")
    assert hist["rows"] == 1200 and hist["bounds"][-1] == 1199.0
    # merged bounds stay within the documented rank tolerance
    import bisect

    tol = 3 * 400 / hist["buckets"] + 1
    for j, b in enumerate(hist["bounds"]):
        exact_rank = j / hist["buckets"] * 1200
        assert abs(bisect.bisect_right(range(1200), b) - exact_rank) <= tol
    # a table that never opted in: None, nothing scanned
    w2 = _table(tmp_path, [{"v": 1, "k": 1}], name="never")
    assert refresh_quantile_statistics(w2, spark) is None


def test_refresh_quantiles_delete_dirty_leg(spark, tmp_path):
    """A delete makes its file's raw-content partial untrustworthy:
    the refresh re-reads DIRTY files delete-aware (exact live
    row/non-null censuses) while clean files stay metadata-only."""
    from daskberg_spark.iceberg.quantiles import (
        refresh_quantile_statistics,
    )

    w = _table(tmp_path, [{"v": i, "k": i} for i in range(300)])
    w.append([{"v": 300 + i, "k": 300 + i} for i in range(300)])
    rep = refresh_quantile_statistics(w, spark, ["v"])
    assert rep["partials_computed"] == 2
    # kill the top 100 values via eq-delete (applies to older files)
    w.delete_rows_equality([{"k": 500 + i} for i in range(100)])
    rep = refresh_quantile_statistics(w, spark)
    # eq deletes scope-match both files here: all dirty, none re-partialed
    assert rep["dirty_files"] >= 1 and rep["partials_computed"] == 0, rep
    hist = IcebergTable(w.path).column_quantiles("v")
    assert hist["rows"] == hist["nonnull"] == 500
    assert hist["bounds"][-1] == 499.0
    # compaction rewrites to clean files: partials for the new files,
    # dirty leg gone
    from daskberg_spark.iceberg.writer import compact_files_spark

    compact_files_spark(w, spark, min_file_bytes=1 << 20)
    rep = refresh_quantile_statistics(w, spark)
    assert rep["dirty_files"] == 0 and rep["partials_computed"] >= 1, rep
    hist = IcebergTable(w.path).column_quantiles("v")
    assert hist["rows"] == 500 and hist["bounds"][-1] == 499.0


def test_maintain_uses_incremental_quantile_refresh(spark, tmp_path):
    """maintain() routes opted-in tables with partials through the
    incremental refresh (merged blob on the new head); legacy tables
    without partials keep the full re-run (unmerged blob)."""
    from daskberg_spark.iceberg.quantiles import (
        refresh_quantile_statistics,
    )
    from daskberg_spark.iceberg.writer import maintain

    w = _table(tmp_path, [{"v": i, "k": i} for i in range(200)])
    refresh_quantile_statistics(w, spark, ["v"])
    w.append([{"v": 200 + i, "k": i} for i in range(200)])
    rep = maintain(w, spark, min_file_bytes=0)
    assert rep["refresh_quantiles"] == ["v"]
    hist = IcebergTable(w.path).column_quantiles("v")
    assert hist.get("merged") is True and hist["rows"] == 400
    # legacy (no partials): full re-run, unmerged
    w2 = _table(tmp_path, [{"v": i, "k": i} for i in range(100)], name="lg")
    write_quantile_statistics(w2, spark, ["v"])
    w2.append([{"v": 100 + i, "k": i} for i in range(100)])
    rep2 = maintain(w2, spark, min_file_bytes=0)
    assert rep2["refresh_quantiles"] == ["v"]
    hist2 = IcebergTable(w2.path).column_quantiles("v")
    assert "merged" not in hist2 and hist2["rows"] == 200


def test_refresh_grouped_quantiles_identity_partitioned(spark, tmp_path):
    """Under identity partitioning a file belongs to one group, so the
    grouped refresh reuses the per-file partials: an append refreshes
    by reading ONLY the new files, and percentile_groupby keeps
    serving metadata-only from the merged blob."""
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from daskberg_spark.iceberg.quantiles import (
        refresh_grouped_quantile_statistics,
        write_grouped_quantile_statistics,
    )

    w = IcebergWriter(
        str(tmp_path / "gp"),
        [
            {"id": 1, "name": "seg", "type": "string", "required": False},
            {"id": 2, "name": "v", "type": "long", "required": False},
        ],
        [{"name": "seg", "transform": "identity", "source": "seg"}],
    )
    w.append(
        [{"seg": "ab"[i % 2], "v": i} for i in range(400)]
    )  # 2 files (one per partition)
    write_grouped_quantile_statistics(w, spark, ["seg"], ["v"])
    # first refresh bootstraps the per-file partials (2 of 2)
    rep = refresh_grouped_quantile_statistics(w, spark)
    assert rep["mode"] == "incremental" and rep["partials_computed"] == 2
    # append a third partition: refresh reads ONLY its file(s)
    w.append([{"seg": "c", "v": 10_000 + i} for i in range(100)])
    rep = refresh_grouped_quantile_statistics(w, spark)
    assert rep["mode"] == "incremental", rep
    assert rep["partials_computed"] == 1, rep
    assert rep["files_total"] == 3 and rep["groups"] == 3, rep
    t = IcebergTable(w.path)
    out = t.percentile_groupby(spark, [("v", 0.5, "p50")], ["seg"])
    assert t.last_percentile_groupby["route"] == "stats"
    got = {r.seg: r.p50 for r in out.collect()}
    # per-group single-file exact-mode partials invert to the exact
    # medians (each group is one file, knots are order statistics)
    assert got["c"] == 10_049 or abs(got["c"] - 10_049) <= 2, got
    # group a = evens 0..398 (median ~198), b = odds 1..399 (~199)
    assert abs(got["a"] - 198) <= 7 and abs(got["b"] - 199) <= 7, got
    # a delete dirties one partition: its group recomputes delete-aware
    w.delete_rows_equality([{"v": 10_000 + i} for i in range(50)])
    rep = refresh_grouped_quantile_statistics(w, spark)
    assert rep["mode"] == "incremental" and rep["dirty_files"] >= 1, rep
    t = IcebergTable(w.path)
    h = t.grouped_column_quantiles("v", ["seg"])
    by_key = {tuple(g["key"]): g for g in h["groups"]}
    assert by_key[("c",)]["rows"] == 50, by_key[("c",)]
    assert by_key[("a",)]["rows"] == 200 and by_key[("b",)]["rows"] == 200


def test_refresh_grouped_quantiles_nonidentity_incremental(spark, tmp_path):
    """A grouping that is NOT the identity partitioning refreshes
    incrementally too (r13): per-(file × group) partials carry the
    group key explicitly, so after the bootstrap an append reads ONLY
    the new file — the r12 full-re-run degrade is gone."""
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from daskberg_spark.iceberg.quantiles import (
        refresh_grouped_quantile_statistics,
        write_grouped_quantile_statistics,
    )

    w = _table(tmp_path, [{"v": i, "k": i % 3} for i in range(150)])
    write_grouped_quantile_statistics(w, spark, ["k"], ["v"])
    w.append([{"v": 150 + i, "k": i % 3} for i in range(150)])
    rep = refresh_grouped_quantile_statistics(w, spark)
    assert rep["mode"] == "incremental", rep
    assert rep["strategy"] == "file-grouped-partials", rep
    assert rep["partials_computed"] == 2, rep  # bootstrap: both files
    t = IcebergTable(w.path)
    h = t.grouped_column_quantiles("v", ["k"])
    assert h["merged"] is True
    assert sum(g["rows"] for g in h["groups"]) == 300
    assert {tuple(g["key"]) for g in h["groups"]} == {(0,), (1,), (2,)}
    # a second append partial-scans ONLY the new file
    w.append([{"v": 300 + i, "k": i % 3} for i in range(150)])
    rep = refresh_grouped_quantile_statistics(w, spark)
    assert rep["partials_computed"] == 1 and rep["files_total"] == 3, rep
    t = IcebergTable(w.path)
    h = t.grouped_column_quantiles("v", ["k"])
    assert sum(g["rows"] for g in h["groups"]) == 450
    # the consumer keeps serving metadata-only from the merged blob
    out = t.percentile_groupby(spark, [("v", 0.5, "p50")], ["k"])
    assert t.last_percentile_groupby["route"] == "stats"
    got = {r.k: r.p50 for r in out.collect()}
    # group g holds {g, g+3, ...} ∩ [0, 450): median ≈ 224 ± merge tol
    for g in (0, 1, 2):
        assert abs(got[g] - 224) <= 450 / 64 * 3 + 3, got
    # a delete dirties the older files: exact re-scan, counts track
    w.delete_rows_equality([{"v": i} for i in range(30)])
    rep = refresh_grouped_quantile_statistics(w, spark)
    assert rep["dirty_files"] >= 1 and rep["partials_computed"] == 0, rep
    h = IcebergTable(w.path).grouped_column_quantiles("v", ["k"])
    assert sum(g["rows"] for g in h["groups"]) == 420
    # never opted in: None
    w2 = _table(tmp_path, [{"v": 1, "k": 1}], name="gnone")
    assert refresh_grouped_quantile_statistics(w2, spark) is None


def test_refresh_grouped_quantiles_date_keys_incremental(spark, tmp_path):
    """Date group keys — excluded from the identity strategy because
    manifest partition encodings differ from the blob's ISO keys —
    refresh incrementally through the file-grouped partials, whose
    keys are ISO-encoded at scan time on both the partial and dirty
    legs."""
    import datetime as dt

    from daskberg_spark.iceberg.quantiles import (
        refresh_grouped_quantile_statistics,
        write_grouped_quantile_statistics,
    )

    w = IcebergWriter(
        str(tmp_path / "gdate"),
        [
            {"id": 1, "name": "d", "type": "date", "required": False},
            {"id": 2, "name": "v", "type": "long", "required": False},
        ],
    )
    base = dt.date(2024, 1, 1)
    w.append(
        [
            {"d": base + dt.timedelta(days=i % 2), "v": i}
            for i in range(200)
        ]
    )
    write_grouped_quantile_statistics(w, spark, ["d"], ["v"])
    w.append(
        [{"d": base + dt.timedelta(days=2), "v": 1000 + i} for i in range(100)]
    )
    rep = refresh_grouped_quantile_statistics(w, spark)
    assert rep["mode"] == "incremental", rep
    assert rep["strategy"] == "file-grouped-partials", rep
    assert rep["groups"] == 3, rep
    h = IcebergTable(w.path).grouped_column_quantiles("v", ["d"])
    by_key = {tuple(g["key"]): g for g in h["groups"]}
    assert by_key[("2024-01-03",)]["rows"] == 100, by_key
    assert by_key[("2024-01-01",)]["rows"] == 100
    assert by_key[("2024-01-02",)]["rows"] == 100


def test_maintain_refreshes_grouped_quantiles(spark, tmp_path):
    from daskberg_spark.iceberg.quantiles import (
        write_grouped_quantile_statistics,
    )
    from daskberg_spark.iceberg.writer import maintain

    w = IcebergWriter(
        str(tmp_path / "gm"),
        [
            {"id": 1, "name": "seg", "type": "string", "required": False},
            {"id": 2, "name": "v", "type": "long", "required": False},
        ],
        [{"name": "seg", "transform": "identity", "source": "seg"}],
    )
    w.append([{"seg": "ab"[i % 2], "v": i} for i in range(100)])
    write_grouped_quantile_statistics(w, spark, ["seg"], ["v"])
    w.append([{"seg": "c", "v": i} for i in range(50)])
    rep = maintain(w, spark, min_file_bytes=0)
    assert rep["refresh_grouped_quantiles"] == "incremental", rep
    rep2 = maintain(w, spark, min_file_bytes=0)
    assert rep2["refresh_grouped_quantiles"] is None


def test_expire_reattaches_raw_file_blobs(spark, tmp_path):
    """Raw-file-content blobs (per-file CDF partials, sum blobs) are
    keyed by data file, not snapshot state: expire_snapshots reattaches
    them to the surviving head — a refresh after expire computes ZERO
    new partials instead of silently re-scanning the table."""
    from daskberg_spark.iceberg.quantiles import (
        refresh_quantile_statistics,
    )
    from daskberg_spark.iceberg.writer import expire_snapshots

    w = _table(tmp_path, [{"v": i, "k": i} for i in range(200)])
    w.append([{"v": 200 + i, "k": i} for i in range(200)])
    rep = refresh_quantile_statistics(w, spark, ["v"])
    assert rep["partials_computed"] == 2
    w.append([{"v": 400 + i, "k": i} for i in range(200)])
    expire_snapshots(w, keep_last=1)
    rep = refresh_quantile_statistics(w, spark)
    # the two old files' partials survived the expire: only the new
    # file is read
    assert rep["partials_computed"] == 1, rep
    hist = IcebergTable(w.path).column_quantiles("v")
    assert hist["rows"] == 600 and hist["bounds"][-1] == 599.0


def test_file_partials_entries_consolidate(spark, tmp_path):
    """Each refresh appends one partials entry; past the cap the next
    refresh rewrites ONE consolidated entry restricted to live files,
    so the statistics list stays O(live files), not O(refreshes)."""
    from daskberg_spark.iceberg.quantiles import (
        FILE_QUANTILE_BLOB_TYPE,
        refresh_quantile_statistics,
    )

    w = _table(tmp_path, [{"v": i, "k": i} for i in range(50)])
    refresh_quantile_statistics(w, spark, ["v"])
    for r in range(10):
        w.append([{"v": 50 + 10 * r + i, "k": i} for i in range(10)])
        refresh_quantile_statistics(w, spark)

    def n_entries():
        return sum(
            1
            for e in w.statistics
            if any(
                b.get("type") == FILE_QUANTILE_BLOB_TYPE
                for b in e.get("blob-metadata", [])
            )
        )

    assert n_entries() <= 9, n_entries()
    # coverage intact after consolidation: a refresh computes nothing
    rep = refresh_quantile_statistics(w, spark)
    assert rep["partials_computed"] == 0, rep
    hist = IcebergTable(w.path).column_quantiles("v")
    assert hist["rows"] == 150 and hist["bounds"][-1] == 149.0


def test_consolidated_partials_survive_orphan_sweep(spark, tmp_path):
    """Consolidation supersedes old partials puffins; the orphan sweep
    reclaims them from disk, and coverage (the consolidated entry)
    still answers — the full blob-lifecycle composition."""
    import os

    from daskberg_spark.iceberg.quantiles import (
        refresh_quantile_statistics,
    )
    from daskberg_spark.iceberg.writer import remove_orphan_files

    w = _table(tmp_path, [{"v": i, "k": i} for i in range(50)])
    refresh_quantile_statistics(w, spark, ["v"])
    for r in range(10):
        w.append([{"v": 50 + 10 * r + i, "k": i} for i in range(10)])
        refresh_quantile_statistics(w, spark)
    removed = remove_orphan_files(w.path)
    assert any(p.endswith(".puffin") for p in removed), removed
    # every still-referenced statistics file exists and coverage holds
    t = IcebergTable(w.path)
    for e in t.table_statistics():
        assert os.path.exists(e["statistics-path"]), e["statistics-path"]
    rep = refresh_quantile_statistics(w, spark)
    assert rep["partials_computed"] == 0, rep
    hist = IcebergTable(w.path).column_quantiles("v")
    assert hist["rows"] == 150 and hist["bounds"][-1] == 149.0


def test_grouped_histogram_conditional_selectivity(spark, tmp_path):
    """With per-group value ranges DISJOINT (group 'a' in [0,1000),
    'b' in [10k,20k)), the marginal histogram scores `g='a' AND
    v >= 10000` at ~NDV×50%, while the grouped blob measures the
    CONDITIONAL P(v >= 10000 | g='a') = 0 — no independence
    assumption."""
    from daskberg_spark.iceberg.cbo import estimated_rows
    from daskberg_spark.iceberg.quantiles import (
        write_grouped_quantile_statistics,
    )
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        write_table_statistics,
    )

    w = IcebergWriter(
        str(tmp_path / "cg"),
        [
            {"id": 1, "name": "g", "type": "string", "required": False},
            {"id": 2, "name": "v", "type": "long", "required": False},
        ],
    )
    w.append(
        [{"g": "a", "v": i} for i in range(1000)]
        + [{"g": "b", "v": 10_000 + 10 * i} for i in range(1000)]
    )
    write_table_statistics(w, spark)  # NDVs for the equality clause
    write_quantile_statistics(w, spark, ["v"])  # marginal CDF
    t = IcebergTable(w.path)
    marginal = estimated_rows(t, [("g", "==", "a"), ("v", ">=", 10_000)])
    # marginal model: 1/2 (NDV) × ~1/2 (global CDF) ≈ 500 rows — wrong
    assert marginal > 100, marginal
    write_grouped_quantile_statistics(w, spark, ["g"], ["v"])
    t = IcebergTable(w.path)
    conditional = estimated_rows(
        t, [("g", "==", "a"), ("v", ">=", 10_000)]
    )
    assert conditional <= 2.0, conditional  # floored at 1 row
    # and the matching side stays sane: all of 'b' passes the range
    est_b = estimated_rows(t, [("g", "==", "b"), ("v", ">=", 10_000)])
    assert 800 <= est_b <= 1200, est_b
    # a pinned group that does not exist: provably ~nothing
    est_missing = estimated_rows(
        t, [("g", "==", "zzz"), ("v", ">=", 0)]
    )
    assert est_missing <= marginal, est_missing


def test_maintain_kitchen_sink_statistics_lifecycle(spark, tmp_path):
    """One table opted into EVERY statistics family (theta NDVs,
    marginal + grouped quantiles with per-file partials, colsum blobs,
    value + token blooms, a registered rollup) through repeated
    commits, a delete, compaction, and maintain() after each step:
    every consumer keeps answering correctly and no family's entry
    list grows unboundedly."""
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from daskberg_spark.iceberg.bloomindex import (
        write_file_blooms,
        write_token_blooms,
    )
    from daskberg_spark.iceberg.quantiles import (
        refresh_quantile_statistics,
        write_grouped_quantile_statistics,
    )
    from daskberg_spark.iceberg.rollup import create_rollup
    from daskberg_spark.iceberg.sumstats import write_sum_statistics
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        maintain,
        write_table_statistics,
    )

    w = IcebergWriter(
        str(tmp_path / "ks"),
        [
            {"id": 1, "name": "k", "type": "long", "required": False},
            {"id": 2, "name": "seg", "type": "string", "required": False},
            {"id": 3, "name": "v", "type": "long", "required": False},
            {"id": 4, "name": "txt", "type": "string", "required": False},
        ],
        [{"name": "seg", "transform": "identity", "source": "seg"}],
    )

    def batch(lo, n):
        return [
            {
                "k": i,
                "seg": "ab"[i % 2],
                "v": (i * 13) % 500,
                "txt": f"tok{i % 7} common",
            }
            for i in range(lo, lo + n)
        ]

    from daskberg_spark.iceberg.theta import write_grouped_theta_statistics

    w.append(batch(0, 100))
    write_table_statistics(w, spark)
    refresh_quantile_statistics(w, spark, ["v"])
    write_grouped_quantile_statistics(w, spark, ["seg"], ["v"])
    write_grouped_theta_statistics(w, spark, ["seg"], ["v"])
    write_sum_statistics(w, spark, ["v"])
    write_file_blooms(w, spark, ["k"])
    write_token_blooms(w, spark, ["txt"])
    create_rollup(
        spark,
        IcebergTable(w.path),
        str(tmp_path / "ksru"),
        ["seg"],
        ["v"],
        source_writer=w,
    )
    lo = 100
    for step in range(4):
        w.append(batch(lo, 50))
        lo += 50
        if step == 2:
            w.delete_rows_equality([{"k": 5}, {"k": 105}])
        rep = maintain(w, spark, min_file_bytes=0 if step != 3 else 1 << 20)
        assert rep["refresh_quantiles"] == ["v"], rep
        assert rep["refresh_grouped_quantiles"] is not None, rep
        assert rep["refresh_grouped_ndv"] is not None, rep
    t = IcebergTable(w.path)
    live_rows = lo - 2
    # every family answers, consistently
    hist = t.column_quantiles("v")
    assert hist["rows"] == live_rows and hist.get("merged") is True
    out = t.percentile_groupby(spark, [("v", 0.5, "p50")], ["seg"])
    assert t.last_percentile_groupby["route"] == "stats"
    assert {r.seg for r in out.collect()} == {"a", "b"}
    ndv_out = t.ndv_groupby(spark, "v", ["seg"])
    assert t.last_ndv_groupby["route"] == "stats"
    ndv_got = {r.seg: r.ndv for r in ndv_out.collect()}
    ndv_truth = {
        r.seg: r.ndv
        for r in t.to_df(spark)
        .groupBy("seg")
        .agg(
            __import__("pyspark.sql.functions", fromlist=["x"])
            .count_distinct("v")
            .alias("ndv")
        )
        .collect()
    }
    assert ndv_got == ndv_truth, (ndv_got, ndv_truth)
    agg = t.agg_auto(
        spark, [("count", "*", "n"), ("sum", "v", "s")], group_by=["seg"]
    )
    got = {r.seg: (r.n, int(r.s)) for r in agg.collect()}
    truth = {
        r.seg: (r.n, int(r.s))
        for r in t.to_df(spark)
        .groupBy("seg")
        .agg(
            __import__("pyspark.sql.functions", fromlist=["x"])
            .count("*")
            .alias("n"),
            __import__("pyspark.sql.functions", fromlist=["x"])
            .sum("v")
            .alias("s"),
        )
        .collect()
    }
    assert got == truth
    files = t.plan_files([("k", "==", 130)])
    assert len(files) < len(t.plan_files(None)), "value bloom stopped pruning"
    df = t.to_df(spark, token_filters=[("txt", "tok3")])
    assert df.count() == sum(1 for i in range(lo) if i % 7 == 3 and i not in (5, 105))


def test_consolidation_preserves_sibling_column_coverage(spark, tmp_path):
    """A grouped refresh consolidating with a COLUMN SUBSET must not
    drop the other columns' partials: the rewrite covers the union of
    indexed columns (the r12 coverage-loss fix)."""
    from daskberg_spark.iceberg.quantiles import (
        refresh_grouped_quantile_statistics,
        refresh_quantile_statistics,
        write_grouped_quantile_statistics,
    )

    w = IcebergWriter(
        str(tmp_path / "sib"),
        [
            {"id": 1, "name": "seg", "type": "string", "required": False},
            {"id": 2, "name": "v", "type": "long", "required": False},
            {"id": 3, "name": "u", "type": "long", "required": False},
        ],
        [{"name": "seg", "transform": "identity", "source": "seg"}],
    )
    w.append(
        [{"seg": "ab"[i % 2], "v": i, "u": -i} for i in range(100)]
    )
    # global partials over BOTH value columns; grouped blob over v only
    refresh_quantile_statistics(w, spark, ["v", "u"])
    write_grouped_quantile_statistics(w, spark, ["seg"], ["v"])
    for r in range(10):
        w.append(
            [
                {"seg": "ab"[i % 2], "v": 100 + i, "u": -(100 + i)}
                for i in range(10 * r, 10 * r + 10)
            ]
        )
        # the GROUPED refresh (columns = [v]) drives consolidation
        refresh_grouped_quantile_statistics(w, spark)
    # u's ORIGINAL coverage survived the v-driven consolidations: the
    # global refresh reads only the files appended since (20 of 22) —
    # pre-fix, consolidation dropped u entirely and this would be 22
    rep = refresh_quantile_statistics(w, spark)
    assert rep["files_total"] == 22, rep
    assert rep["partials_computed"] == 20, rep
    hist = IcebergTable(w.path).column_quantiles("u")
    assert hist["rows"] == 200 and hist["bounds"][0] == -199.0


def test_range_pin_conditional_selectivity(spark, tmp_path):
    """r13 CBO rung (3): a RANGE pin on the group column weights the
    per-group conditionals by group row counts — `g >= 5 AND v >= 10k`
    on data where v-bands follow g scores ~the true half, not the
    independence model's quarter."""
    from daskberg_spark.iceberg.cbo import estimated_rows
    from daskberg_spark.iceberg.quantiles import (
        write_grouped_quantile_statistics,
    )
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        write_table_statistics,
    )

    w = IcebergWriter(
        str(tmp_path / "rp"),
        [
            {"id": 1, "name": "g", "type": "long", "required": False},
            {"id": 2, "name": "v", "type": "long", "required": False},
        ],
    )
    w.append(
        [
            {"g": i % 10, "v": (i if i % 10 < 5 else 10_000 + i) % 20_000}
            for i in range(2000)
        ]
    )
    write_table_statistics(w, spark)
    write_quantile_statistics(w, spark)  # marginal CDFs for g and v
    write_grouped_quantile_statistics(w, spark, ["g"], ["v"])
    t = IcebergTable(w.path)
    # truth: ALL g>=5 rows pass v>=10k → ~1000; independence ≈ 500
    est_hi = estimated_rows(t, [("g", ">=", 5), ("v", ">=", 10_000)])
    assert 800 <= est_hi <= 1200, est_hi
    # truth: NO g<5 row passes → ~0; independence ≈ 500
    est_lo = estimated_rows(t, [("g", "<", 5), ("v", ">=", 10_000)])
    assert est_lo <= 5, est_lo


def test_two_column_pin_conditional_and_order_flip(spark, tmp_path):
    """r13 CBO rung (1): a blob keyed on BOTH pinned columns measures
    P(range | g1, g2).  The fixture's av-band fires only on the
    (1,1) quadrant, so the joint conditional is 1.0 where the r12
    single-pin model (no ["g1"] blob exists) falls to the marginal
    ~0.25 — and the star ordering provably flips: only the joint model
    scores dim 'a' ABOVE dim 'zb'."""
    from daskberg_spark.iceberg.cbo import (
        JoinDim,
        estimated_rows,
        plan_star_join,
    )
    from daskberg_spark.iceberg.quantiles import (
        write_grouped_quantile_statistics,
    )
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        write_table_statistics,
    )

    dima = IcebergWriter(
        str(tmp_path / "dima"),
        [
            {"id": 1, "name": "aid", "type": "long", "required": False},
            {"id": 2, "name": "g1", "type": "long", "required": False},
            {"id": 3, "name": "g2", "type": "long", "required": False},
            {"id": 4, "name": "av", "type": "long", "required": False},
        ],
    )
    dima.append(
        [
            {
                "aid": i,
                "g1": i % 2,
                "g2": (i // 2) % 2,
                # av >= 990 exactly on the (1,1) quadrant
                "av": 990 + i if (i % 2 == 1 and (i // 2) % 2 == 1) else i % 990,
            }
            for i in range(1000)
        ]
    )
    write_table_statistics(dima, spark)  # NDVs for the eq clauses
    write_quantile_statistics(dima, spark, ["av"])  # marginal CDF
    write_grouped_quantile_statistics(dima, spark, ["g1", "g2"], ["av"])
    t = IcebergTable(dima.path)
    filt = [("g1", "==", 1), ("g2", "==", 1), ("av", ">=", 990)]
    est = estimated_rows(t, filt)
    # joint conditional 1.0 → 1000 · 1/2 · 1/2 ≈ 250; the marginal
    # model gives ~62 and the single-pin model CANNOT apply (no ["g1"]
    # blob exists at this snapshot)
    assert 200 <= est <= 300, est
    # the (1,0) quadrant: joint conditional 0 → floored at ~1 row
    est0 = estimated_rows(t, [("g1", "==", 1), ("g2", "==", 0), ("av", ">=", 990)])
    assert est0 <= 5, est0

    # star order flip: dimb's honest growth (~0.12) sits strictly
    # between the joint model's 0.25 and the marginal model's ~0.06 —
    # only the joint conditional puts 'zb' first
    dimb = IcebergWriter(
        str(tmp_path / "dimb"),
        [
            {"id": 1, "name": "bid", "type": "long", "required": False},
            {"id": 2, "name": "bv", "type": "long", "required": False},
        ],
    )
    dimb.append([{"bid": i, "bv": i} for i in range(1000)])
    write_table_statistics(dimb, spark)
    write_quantile_statistics(dimb, spark, ["bv"])
    fact = IcebergWriter(
        str(tmp_path / "factab"),
        [
            {"id": 1, "name": "fk_a", "type": "long", "required": False},
            {"id": 2, "name": "fk_b", "type": "long", "required": False},
        ],
    )
    fact.append([{"fk_a": i % 1000, "fk_b": (i * 7) % 1000} for i in range(4000)])
    tf = IcebergTable(fact.path)
    plan = plan_star_join(
        tf,
        [
            JoinDim(IcebergTable(dima.path), "fk_a", "aid", filters=filt, name="a"),
            JoinDim(
                IcebergTable(dimb.path),
                "fk_b",
                "bid",
                filters=[("bv", ">=", 880)],
                name="zb",
            ),
        ],
    )
    assert plan.order == ["zb", "a"], (plan.order, plan.estimates)
    assert 0.2 <= plan.estimates["a"] <= 0.3, plan.estimates
    assert 0.10 <= plan.estimates["zb"] <= 0.14, plan.estimates


def test_grouped_rows_exact_eq_selectivity(spark, tmp_path):
    """r13 CBO rung: an equality pin on a column a grouped blob keys on
    reads the EXACT per-group row census — skew-proof where uniform
    1/ndv is worst (90/10 split scores 0.9/0.1, not 0.5/0.5)."""
    from daskberg_spark.iceberg.cbo import estimated_rows
    from daskberg_spark.iceberg.quantiles import (
        write_grouped_quantile_statistics,
    )
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        write_table_statistics,
    )

    w = IcebergWriter(
        str(tmp_path / "sk"),
        [
            {"id": 1, "name": "g", "type": "string", "required": False},
            {"id": 2, "name": "v", "type": "long", "required": False},
        ],
    )
    w.append(
        [{"g": "big" if i % 10 else "small", "v": i} for i in range(1000)]
    )
    write_table_statistics(w, spark)
    t = IcebergTable(w.path)
    # NDV model: 1/2 each — 500/500
    assert 400 <= estimated_rows(t, [("g", "==", "small")]) <= 600
    write_grouped_quantile_statistics(w, spark, ["g"], ["v"])
    t = IcebergTable(w.path)
    assert abs(estimated_rows(t, [("g", "==", "small")]) - 100) <= 1
    assert abs(estimated_rows(t, [("g", "==", "big")]) - 900) <= 1
    # "zzz" is outside the file's min/max: the PLANNER proves emptiness
    # before any census lookup (0 = proved-empty); a key INSIDE the
    # bounds but absent from the blob falls to the NDV model
    assert estimated_rows(t, [("g", "==", "zzz")]) == 0.0
    est = estimated_rows(t, [("g", "==", "c")])  # between "big"/"small"
    assert est >= 1.0, est


def test_grouped_quantile_refresh_randomized_differential(spark, tmp_path):
    """Seeded lifecycle differential for the NON-IDENTITY grouped
    refresh: after every commit window (appends, eq-deletes, a
    compaction) the merged blob's per-group row/non-null censuses and
    extreme knots equal the exact relational truth, and the partial
    pass never reads more than the files the window introduced."""
    import random

    from daskberg_spark.iceberg.quantiles import (
        refresh_grouped_quantile_statistics,
        write_grouped_quantile_statistics,
    )
    from daskberg_spark.iceberg.writer import compact_files_spark

    rng = random.Random(29)
    w = _table(
        tmp_path,
        [{"v": rng.randrange(1000), "k": i % 3} for i in range(200)],
        name="rdq",
    )
    write_grouped_quantile_statistics(w, spark, ["k"], ["v"])
    refresh_grouped_quantile_statistics(w, spark)  # bootstrap

    def live_paths():
        return {
            f["file_path"]
            for f in IcebergTable(w.path).plan_files(None)
        }

    def truth():
        from pyspark.sql import functions as F

        t = IcebergTable(w.path)
        return {
            r.k: (r.n, r.nn, r.vmin, r.vmax)
            for r in t.to_df(spark)
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count("v").alias("nn"),
                F.min("v").alias("vmin"),
                F.max("v").alias("vmax"),
            )
            .collect()
        }

    files_before = live_paths()
    for step in range(6):
        action = rng.choice(["append", "append", "delete", "compact"])
        if action == "append":
            w.append(
                [
                    {"v": rng.randrange(1000), "k": rng.randrange(3)}
                    for _ in range(rng.randrange(40, 90))
                ]
            )
        elif action == "delete":
            w.delete_rows_equality(
                [{"v": rng.randrange(1000)} for _ in range(8)]
            )
        else:
            compact_files_spark(w, spark, min_file_bytes=1 << 20)
        files_now = live_paths()
        rep = refresh_grouped_quantile_statistics(w, spark)
        assert rep["mode"] == "incremental", (step, action, rep)
        assert rep["strategy"] == "file-grouped-partials", (step, rep)
        assert rep["partials_computed"] <= len(files_now - files_before), (
            step, action, rep,
        )
        files_before = files_now
        h = IcebergTable(w.path).grouped_column_quantiles("v", ["k"])
        got = {
            g["key"][0]: (
                g["rows"],
                g["nonnull"],
                int(round(g["bounds"][0])),
                int(round(g["bounds"][-1])),
            )
            for g in h["groups"]
        }
        assert got == truth(), (step, action, got)


def test_grouped_refresh_dirty_scan_guard(spark, tmp_path, monkeypatch):
    """r13 verdict nit #2: the dirty-file scan of the grouped refresh
    carries the same ``limit(max_groups+1)`` + loud refusal as the
    build and partials paths.  The bound is transitive today (deletes
    cannot ADD groups; new files take the guarded partials path), so
    the guard is defense-in-depth: a future refresh path classifying
    over-limit appends as "dirty" must refuse, never silently lift the
    blob's group bound."""
    import pytest

    import daskberg_spark.iceberg.quantiles as q
    from daskberg_spark.iceberg.quantiles import (
        refresh_grouped_quantile_statistics,
        write_grouped_quantile_statistics,
    )

    w = IcebergWriter(
        str(tmp_path / "dg"),
        [
            {"id": 1, "name": "seg", "type": "string", "required": False},
            {"id": 2, "name": "v", "type": "long", "required": False},
        ],
    )
    # 6 groups in one file
    w.append([{"seg": f"s{i % 6}", "v": i} for i in range(120)])
    write_grouped_quantile_statistics(w, spark, ["seg"], ["v"])
    refresh_grouped_quantile_statistics(w, spark)
    # dirty the file (an eq-delete) and shrink the cap below the dirty
    # scan's 6 groups — the module constant is read at call time
    w.delete_rows_equality([{"v": 5}])
    monkeypatch.setattr(q, "MAX_BLOB_GROUPS", 4)
    with pytest.raises(ValueError, match="dirty-file scan"):
        refresh_grouped_quantile_statistics(w, spark)


def test_grouped_quantiles_derived_day_key(spark, tmp_path):
    """r14: 'p50 by DAY' on a timestamp column via the derived
    ``day(ts)`` spec — the blob stores the spec verbatim,
    ``percentile_groupby`` matches it metadata-only and decodes keys
    to dates, the incremental refresh partial-scans only new files,
    and the scan fallback understands specs too."""
    import datetime as dt

    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from daskberg_spark.iceberg.quantiles import (
        refresh_grouped_quantile_statistics,
        write_grouped_quantile_statistics,
    )

    w = IcebergWriter(
        str(tmp_path / "dk"),
        [
            {"id": 1, "name": "ts", "type": "timestamp", "required": False},
            {"id": 2, "name": "v", "type": "long", "required": False},
        ],
    )
    base = dt.datetime(2024, 3, 1)

    def rows(lo, hi):
        return [
            {"ts": base + dt.timedelta(days=i % 3, minutes=i), "v": i}
            for i in range(lo, hi)
        ]

    w.append(rows(0, 300))
    write_grouped_quantile_statistics(w, spark, ["day(ts)"], ["v"])
    rep = refresh_grouped_quantile_statistics(w, spark)
    assert rep["strategy"] == "file-grouped-partials", rep
    w.append(rows(300, 400))
    rep = refresh_grouped_quantile_statistics(w, spark)
    assert rep["files_total"] == 2 and rep["partials_computed"] == 1, rep
    t = IcebergTable(w.path)
    out = t.percentile_groupby(spark, [("v", 0.0, "vmin"), ("v", 1.0, "vmax")], ["day(ts)"])
    assert t.last_percentile_groupby["route"] == "stats"
    got = {r["day(ts)"]: (r["vmin"], r["vmax"]) for r in out.collect()}
    assert all(isinstance(k, dt.date) for k in got), got
    from pyspark.sql import functions as F

    truth = {
        r["d"]: (r["lo"], r["hi"])
        for r in t.to_df(spark)
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    }
    assert got == truth, (got, truth)
    # scan fallback with a spec grouping no blob covers
    out2 = t.percentile_groupby(spark, [("v", 1.0, "vmax")], ["hour(ts)"])
    assert t.last_percentile_groupby["route"] == "scan"
    assert out2.count() == len(
        t.to_df(spark).select(F.date_trunc("hour", "ts")).distinct().collect()
    )


def test_grouped_quantiles_multi_config(spark, tmp_path):
    """r14: MULTIPLE quantile groupings coexist and refresh together —
    "p50 by seg" AND "p50 by src" on one table.  Config-scoped
    replacement, one refresh advances both incrementally, both serve
    metadata-only, dropping one leaves the other."""
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from pyspark.sql import functions as F

    from daskberg_spark.iceberg.quantiles import (
        drop_grouped_quantile_statistics,
        refresh_grouped_quantile_statistics,
        write_grouped_quantile_statistics,
    )

    w = IcebergWriter(
        str(tmp_path / "mcq"),
        [
            {"id": 1, "name": "seg", "type": "string", "required": False},
            {"id": 2, "name": "src", "type": "string", "required": False},
            {"id": 3, "name": "v", "type": "long", "required": False},
        ],
    )

    def rows(lo, hi):
        return [
            {"seg": f"s{i % 3}", "src": f"w{i % 4}", "v": i}
            for i in range(lo, hi)
        ]

    w.append(rows(0, 300))
    write_grouped_quantile_statistics(w, spark, ["seg"], ["v"])
    write_grouped_quantile_statistics(w, spark, ["src"], ["v"])
    t = IcebergTable(w.path)
    assert t.grouped_column_quantiles("v", ["seg"]) is not None
    assert t.grouped_column_quantiles("v", ["src"]) is not None
    w.append(rows(300, 400))
    rep = refresh_grouped_quantile_statistics(w, spark)
    assert len(rep["configs"]) == 2, rep
    w.append(rows(400, 450))
    rep = refresh_grouped_quantile_statistics(w, spark)
    assert all(r["partials_computed"] == 1 for r in rep["configs"]), rep
    t = IcebergTable(w.path)
    truth_df = t.to_df(spark)
    for gcol in ("seg", "src"):
        out = t.percentile_groupby(
            spark, [("v", 0.0, "lo"), ("v", 1.0, "hi")], [gcol]
        )
        assert t.last_percentile_groupby["route"] == "stats", gcol
        got = {r[gcol]: (r["lo"], r["hi"]) for r in out.collect()}
        truth = {
            r[gcol]: (r["lo"], r["hi"])
            for r in truth_df.groupBy(gcol)
            .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
            .collect()
        }
        assert got == truth, (gcol, got, truth)
    dropped = drop_grouped_quantile_statistics(w, ["src"])
    assert dropped >= 1
    rep = refresh_grouped_quantile_statistics(w, spark)
    assert "configs" not in rep and rep["group_cols"] == ["seg"], rep
    t = IcebergTable(w.path)
    assert t.grouped_column_quantiles("v", ["src"]) is None
    assert t.grouped_column_quantiles("v", ["seg"]) is not None


def test_grouped_quantile_head_gate_is_per_config(spark, tmp_path):
    """r15 (advisor twin of the theta test): a manual head-covering
    write of one grouping must not starve the other's gated refresh."""
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.quantiles import (
        drop_grouped_quantile_statistics,
        refresh_grouped_quantile_statistics,
        write_grouped_quantile_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "qpc"),
        [
            {"id": 1, "name": "seg", "type": "string", "required": False},
            {"id": 2, "name": "src", "type": "string", "required": False},
            {"id": 3, "name": "v", "type": "long", "required": False},
        ],
    )

    def rows(lo, hi):
        return [
            {"seg": f"s{i % 3}", "src": f"w{i % 4}", "v": i}
            for i in range(lo, hi)
        ]

    w.append(rows(0, 200))
    write_grouped_quantile_statistics(w, spark, ["seg"], ["v"])
    write_grouped_quantile_statistics(w, spark, ["src"], ["v"])
    refresh_grouped_quantile_statistics(w, spark)  # bootstrap partials
    w.append(rows(200, 300))
    write_grouped_quantile_statistics(w, spark, ["seg"], ["v"])
    rep = refresh_grouped_quantile_statistics(
        w, spark, skip_head_covered=True
    )
    assert rep is not None and "configs" not in rep, rep
    t = IcebergTable(w.path)
    assert t.grouped_column_quantiles("v", ["src"]) is not None
    assert (
        refresh_grouped_quantile_statistics(
            w, spark, skip_head_covered=True
        )
        is None
    )
    # drop keeps unreadable entries of other groupings (r15)
    import os

    seg_path = w.statistics[0]["statistics-path"]
    os.rename(seg_path, seg_path + ".offline")
    try:
        drop_grouped_quantile_statistics(w, ["src"])
    finally:
        os.rename(seg_path + ".offline", seg_path)
    assert any(
        e["statistics-path"] == seg_path for e in w.statistics
    ), "unreadable entry must survive a drop of a different grouping"
