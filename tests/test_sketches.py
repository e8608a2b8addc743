"""Deterministic sketch operators: KMV distinct, hash sampling, corr."""

from __future__ import annotations

import math

from tests.conftest import SF_SMALL

SF = SF_SMALL


def _q(name):
    import __spark_entry__ as e

    return e.queries()[name]


def test_kmv_estimate_within_error_bound(spark):
    from daskberg_spark.operators.sketches import KMV_K

    row = _q("distinct_kmv_estimate")(spark, SF).first()
    assert row.k_seen <= KMV_K
    if row.k_seen < KMV_K:
        # fewer distincts than k → sketch degenerates to the exact count
        assert row.est_distinct == float(row.exact_distinct)
    else:
        # KMV standard error ~ 1/sqrt(k-2); allow 5 sigma
        rel = abs(row.est_distinct - row.exact_distinct) / row.exact_distinct
        assert rel < 5.0 / math.sqrt(KMV_K - 2)


def test_kmv_partition_invariant(spark):
    a = _q("distinct_kmv_estimate")(spark, SF).first()
    orders = spark.read.parquet(f"{SF}/orders.parquet").repartition(17)
    orders.createOrReplaceTempView("_kmv_orders")
    # same computation over a different physical layout
    from daskberg_spark.operators.sketches import _h48_spark

    h = orders.select(_h48_spark("o_custkey").alias("h")).distinct()
    kth = h.orderBy("h").limit(64).agg({"h": "max"}).first()[0]
    assert kth == a.kth_min


def test_sampled_agg_deterministic_is_replayable(spark):
    df1 = _q("sampled_agg_deterministic")(spark, SF)
    df2 = _q("sampled_agg_deterministic")(spark, SF)
    assert sorted(map(tuple, df1.collect())) == sorted(map(tuple, df2.collect()))
    # the sample is a fixed subset: est = sample_revenue * 8 exactly
    for r in df1.collect():
        assert abs(r.est_total_revenue - r.sample_revenue * 8) < 1e-6


def test_corr_matrix_bounds_and_groups(spark):
    rows = _q("events_corr_matrix")(spark, SF).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r.n > 0
        assert math.isnan(r.corr_value_hour) or -1.0 <= r.corr_value_hour <= 1.0


def test_embedding_dim_stats_shape_and_positive_variance(spark):
    rows = _q("embedding_dim_stats")(spark, SF).collect()
    assert len(rows) == 64
    assert [r.dim for r in rows] == list(range(1, 65))
    assert all(r.variance >= 0 for r in rows)


def test_winsorized_mean_is_tighter_than_raw(spark):
    rows = _q("winsorized_stats")(spark, SF).collect()
    assert rows
    for r in rows:
        # clipping can only pull the sum toward the median band
        assert r.n > 0
        lo_effect = abs(r.sum_winsor) <= abs(r.sum_raw) * 1.5 + 1e9
        assert lo_effect


def test_hll_estimate_accuracy_and_determinism(spark):
    from daskberg_spark.operators.sketches import HLL_M

    row = _q("approx_distinct_hll")(spark, SF).first()
    assert 0 <= row.n_empty <= HLL_M
    # caller-side small-range correction (ln is libm-specific, so the
    # query emits n_empty instead of applying it — see docstring)
    est = row.est_distinct
    if est <= 2.5 * HLL_M and row.n_empty > 0:
        est = HLL_M * math.log(HLL_M / row.n_empty)
    # HLL standard error = 1.04/sqrt(m) = 6.5% at m=256; allow 4 sigma
    rel = abs(est - row.exact_distinct) / row.exact_distinct
    assert rel < 4 * 1.04 / (HLL_M ** 0.5)
    # replay-stable: a second run returns the identical sketch
    again = _q("approx_distinct_hll")(spark, SF).first()
    assert (row.t_sum, row.est_distinct) == (again.t_sum, again.est_distinct)


def test_hll_register_merge_is_partition_invariant(spark):
    # the per-partition MAX combine IS the HLL merge: a different
    # physical layout must produce the same registers, hence same t_sum
    from daskberg_spark.operators.sketches import (
        HLL_REM_BITS,
        _h48_spark,
        _sql_rho,
    )
    from pyspark.sql import functions as F

    base = _q("approx_distinct_hll")(spark, SF).first()
    orders = spark.read.parquet(f"{SF}/orders.parquet").repartition(23)
    h = _h48_spark("o_custkey")
    parts = orders.select(
        F.shiftright(h, HLL_REM_BITS).alias("idx"),
        h.bitwiseAND(F.lit((1 << HLL_REM_BITS) - 1)).alias("rem"),
    )
    t = (
        parts.groupBy("idx")
        .agg(F.max(F.expr(_sql_rho("rem"))).alias("r"))
        .agg(
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_REM_BITS + 1} - r)")
            ).alias("t"),
            F.count("*").alias("np"),
        )
        .first()
    )
    t_sum = t.t + (256 - t.np) * (1 << (HLL_REM_BITS + 1))
    assert t_sum == base.t_sum


def test_histogram_quantile_error_bounded_by_bin_width(spark):
    from daskberg_spark.operators.sketches import HIST_BINS

    rows = _q("approx_quantiles_histogram")(spark, SF).collect()
    assert [r.qi for r in rows] == [1, 2, 3]
    lo = min(r.est_value for r in rows)
    hi = max(r.interp_value for r in rows)
    assert hi > lo > 0
    # readout is the bin's lower edge; the interpolated refinement lands
    # inside the same bin: est <= interp <= est + width
    spark_df = _q("approx_quantiles_histogram")(spark, SF)
    mn_mx = (
        spark_df.sparkSession.read.parquet(f"{SF}/lineitem.parquet")
        .selectExpr("min(l_extendedprice) mn", "max(l_extendedprice) mx")
        .first()
    )
    width = (mn_mx.mx - mn_mx.mn) / HIST_BINS
    for r in rows:
        assert r.est_value <= r.interp_value <= r.est_value + width + 1e-9


def test_countmin_overestimates_and_ranks(spark):
    """Count-min guarantee: est >= exact for every probed term; the top-K
    list is exact-count ranked and deterministic."""
    rows = _q("approx_topk_countmin")(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.est_n >= r.exact_n > 0
    counts = [r.exact_n for r in rows]
    assert counts == sorted(counts, reverse=True)
    again = [(r.term, r.est_n) for r in _q("approx_topk_countmin")(spark, SF).collect()]
    assert again == [(r.term, r.est_n) for r in rows]


def test_literal_df_generic_types_and_nulls(spark):
    """literal_df must split schemas on TOP-LEVEL commas only (decimal
    parens and map/struct angle brackets nest commas) and coerce NULL
    fields across struct literals."""
    from daskberg_spark.operators.registry import literal_df

    df = literal_df(
        spark,
        [(1, {"a": 2}, None), (2, {"b": 3}, 0.5)],
        "k long, m map<string,int>, q double",
    )
    rows = {r["k"]: (r["m"], r["q"]) for r in df.collect()}
    assert rows == {1: ({"a": 2}, None), 2: ({"b": 3}, 0.5)}
    assert dict(df.dtypes) == {"k": "bigint", "m": "map<string,int>", "q": "double"}
