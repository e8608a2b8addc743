"""Structured Streaming queries drained on the batch fixture must equal
their batch formulations exactly (micro-batch slicing must not matter)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_streaming_dedup_equals_batch_distinct(spark):
    from daskberg_spark.operators.registry import table
    from daskberg_spark.streaming.events import streaming_dedup

    got = {
        r["event_type"]: r["n_first_events"]
        for r in streaming_dedup(spark, SF).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_stream_join_equals_batch_range_join(spark):
    from daskberg_spark.operators.registry import table
    from daskberg_spark.streaming.events import streaming_stream_join

    got = {
        r["user_id"]: r["n_attributed"]
        for r in streaming_stream_join(spark, SF).collect()
    }
    ev = table(spark, SF, "events")
    c = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("u"), F.col("ts").alias("c_ts")
    )
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("p_ts")
    )
    want = {
        r["u"]: r["n"]
        for r in c.join(
            p,
            (F.col("u") == F.col("pu"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_hll_equals_batch_sketch(spark):
    """The streaming register table must equal the batch sketch exactly —
    MAX-merge determinism is what makes restart/replay safe."""
    import __spark_entry__ as e

    row = e.queries()["streaming_distinct_hll"](spark, SF).first()
    # batch twin over the same fixture, same hash/rho machinery
    from daskberg_spark.operators.registry import table
    from daskberg_spark.operators.sketches import (
        HLL_M,
        HLL_REM_BITS,
        _h48_spark,
        _sql_rho,
    )
    from pyspark.sql import functions as F

    ev = table(spark, SF, "events")
    h = _h48_spark("user_id")
    t = (
        ev.select(
            F.shiftright(h, HLL_REM_BITS).alias("idx"),
            h.bitwiseAND(F.lit((1 << HLL_REM_BITS) - 1)).alias("rem"),
        )
        .groupBy("idx")
        .agg(F.max(F.expr(_sql_rho("rem"))).alias("r"))
        .agg(
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_REM_BITS + 1} - r)")
            ).alias("t"),
            F.count("*").alias("np"),
        )
        .first()
    )
    assert row.t_sum == t.t + (HLL_M - t.np) * (1 << (HLL_REM_BITS + 1))
    assert row.n_empty == HLL_M - t.np


def test_streaming_countmin_overestimates_and_is_deterministic(spark):
    """The streamed count-min grid is a pure function of the data: est >=
    exact for every probed user, and a re-run (different micro-batch
    interleavings) returns identical estimates."""
    from daskberg_spark.streaming.events import streaming_topk_countmin

    rows = streaming_topk_countmin(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.est_n >= r.exact_n > 0
    again = streaming_topk_countmin(spark, SF).collect()
    assert [(r.user_id, r.est_n) for r in rows] == [
        (r.user_id, r.est_n) for r in again
    ]
