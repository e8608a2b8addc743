"""Advanced / composite operators (SURVEY §2 B8-B12 extensions).

Operators Spark has no single primitive for, each expressed as a
composition that keeps the 100 TB cost model sane:

- as-of join: union-tag + running ``last(ignorenulls)`` window — one
  shuffle on the key, O(n log n), no pairwise inequality join at all.
- merge/SCD2 upsert: union + row_number latest-wins — the MERGE INTO
  emulation when no lakehouse ACID layer is present.
- band join: bucketize-the-range-key trick that turns an interval join
  into an equi-join.
- explicit-moment statistics: variance/correlation from decimal-exact
  power sums (bit-reproducible across engines, unlike streaming Welford).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daskberg_spark.operators.registry import (
    DEC,
    query,
    register_views,
    sql_dsum,
    table,
)


@query(
    "asof_join",
    """
    SELECT p.event_id, p.user_id, p.ts, v.ts AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's most recent view at or
    before it.

    Implementation is the scale-safe union trick: tag both sides, sort
    within user by time, carry the last view timestamp forward with
    ``last(ignorenulls)`` — a single shuffle on user_id, no range join.
    DuckDB's native ASOF JOIN is the oracle."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    views = ev.filter(F.col("event_type") == "view")
    tagged = purchases.select(
        "event_id", "user_id", "ts", F.lit(None).cast("timestamp_ntz").alias("vts"),
        F.lit(1).alias("is_p"),
    ).unionByName(
        views.select(
            "event_id", "user_id", "ts", F.col("ts").alias("vts"), F.lit(0).alias("is_p")
        )
    )
    # views sort before purchases at identical ts (is_p ascending) so a
    # same-instant view is visible to the purchase, matching ASOF `<=`.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn("view_ts", F.last("vts", ignorenulls=True).over(w))
    return carried.filter(F.col("is_p") == 1).select(
        "event_id", "user_id", "ts", "view_ts"
    )


@query(
    "merge_upsert",
    """
    WITH unioned AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS src
      FROM orders WHERE o_orderkey % 10 < 8          -- "current" snapshot
      UNION ALL
      SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice * 1.1, 2 AS src
      FROM orders WHERE o_orderkey % 10 >= 5          -- "updates" batch
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY src DESC) AS rn
      FROM unioned) t
    WHERE rn = 1
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation (no Delta/Iceberg-ACID jar in this env):
    union current + updates, latest-wins via row_number — the SCD1 upsert
    at one shuffle.  Updates win on key collision; unmatched keys insert.
    """
    orders = table(spark, sf_dir, "orders")
    current = orders.filter(F.col("o_orderkey") % 10 < 8).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", F.lit(1).alias("src")
    )
    updates = orders.filter(F.col("o_orderkey") % 10 >= 5).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
        F.lit(2).alias("src"),
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.col("src").desc())
    return (
        current.unionByName(updates)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


@query(
    "band_join",
    f"""
    SELECT CASE WHEN value < 25 THEN 'low' WHEN value < 75 THEN 'mid'
                ELSE 'high' END AS band,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('value', 'sum_value')}
    FROM events GROUP BY 1
    """,
)
def band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval→equi-join: compute the band key with a broadcast-free
    expression instead of a BETWEEN join against a bands table — the
    standard rewrite that keeps range semantics shuffle-free."""
    ev = table(spark, sf_dir, "events")
    band = (
        F.when(F.col("value") < 25, "low")
        .when(F.col("value") < 75, "mid")
        .otherwise("high")
    )
    from daskberg_spark.operators.registry import dsum

    return ev.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n"), dsum("value", "sum_value")
    )


@query(
    "explode_tokens",
    """
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents) t
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: explode (generator) + count — the inverted-index/vocabulary
    shape; partial agg keeps the shuffle at vocabulary size."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(F.lower(F.trim("text")), "[ \\t\\n\\f\\r]+")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


@query(
    "unpivot_stack",
    f"""
    WITH pivoted AS (
      SELECT l_returnflag,
             {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 'F')},
             {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 'O')}
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, status, qty FROM (
      SELECT l_returnflag, 'F' AS status, F AS qty FROM pivoted
      UNION ALL
      SELECT l_returnflag, 'O' AS status, O AS qty FROM pivoted) u
    WHERE qty IS NOT NULL
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: unpivot via stack() — wide→long without a join."""
    pivoted = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double"))
    )
    return pivoted.selectExpr(
        "l_returnflag", "stack(2, 'F', F, 'O', O) AS (status, qty)"
    ).filter("qty IS NOT NULL")


@query(
    "stats_moments",
    f"""
    WITH s AS (
      SELECT c_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS sxx
      FROM customer GROUP BY c_nationkey
    )
    SELECT c_nationkey, n,
           sx / n AS mean_bal,
           CASE WHEN n > 1 THEN (sxx - sx * sx / n) / (n - 1) END AS var_bal
    FROM s
    """,
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: variance from decimal-exact power sums — bit-reproducible
    across engines (built-in stddev uses streaming updates whose float
    error depends on partitioning; fine in practice, unverifiable
    bit-exactly)."""
    cust = table(spark, sf_dir, "customer")
    x = F.col("c_acctbal")
    agg = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(DEC)).cast("double").alias("sx"),
        F.sum((x * x).cast(DEC)).cast("double").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    return agg.select(
        "c_nationkey",
        "n",
        (sx / n).alias("mean_bal"),
        F.when(n > 1, (sxx - sx * sx / n) / (n - 1)).alias("var_bal"),
    )


@query(
    "correlated_subquery",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 2 * (
        SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
               / COUNT(*)
        FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
)
def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join (no per-row re-execution, unlike the naive reading).
    """
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > 2 * (
        SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
               / COUNT(*)
        FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        """
    )


@query(
    "in_subquery",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: IN subquery → left-semi join after decorrelation."""
    register_views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        """
    )


@query("sampled_agg")  # engine-specific sampling → rows-only determinism check
def sampled_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: seeded Bernoulli sample + aggregate — the profile-a-subset
    pattern; sampling is engine-specific so the check is rows-only."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.sample(fraction=0.1, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query("approx_quantiles")  # sketch internals differ per engine → rows-only
def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: approx_percentile sketch — the 100 TB quantile path.

    Result is flattened to scalar double columns (p50/p90/p99) rather than
    one array column: the driver's pandas canonicalizer cannot hash
    list-valued cells (CORRECTNESS_r01 ``unhashable type: 'list'``).
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99))"
            ).alias("qs")
        )
        .select(
            "l_returnflag",
            F.col("qs")[0].alias("p50"),
            F.col("qs")[1].alias("p90"),
            F.col("qs")[2].alias("p99"),
        )
    )


@query(
    "events_funnel",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.v_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after_view,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_after_click
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel analysis: view → first click AFTER that view →
    first purchase AFTER that click, per user (strict event-time order,
    not mere per-type presence).

    ONE shuffle on user_id: three chained whole-partition windows derive
    each stage's conditional min (click > first view, purchase > first
    click) with plain min aggregates — WindowExec buffers a partition and
    spills to disk under pressure, unlike a collect_list agg state (the
    formulation this replaced), which grows per-group memory with user
    activity and cannot spill mid-group.  The per-user groupBy after the
    windows reuses the same partitioning, so no further data shuffle."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    typ = F.col("event_type")
    # only the three funnel stages matter: the IN filter pushes to the
    # scan and skips every other event type's IO
    ev = ev.filter(typ.isin("view", "click", "purchase")).select(
        "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id")
    d = ev.withColumn("v", F.min(F.when(typ == "view", F.col("ts"))).over(w))
    d = d.withColumn(
        "c",
        F.min(
            F.when((typ == "click") & (F.col("ts") > F.col("v")), F.col("ts"))
        ).over(w),
    )
    d = d.withColumn(
        "p",
        F.min(
            F.when((typ == "purchase") & (F.col("ts") > F.col("c")), F.col("ts"))
        ).over(w),
    )
    per_user = d.groupBy("user_id").agg(
        F.max("v").alias("v"), F.max("c").alias("c"), F.max("p").alias("p")
    )
    return per_user.agg(
        F.count("v").alias("n_viewed"),
        F.count("c").alias("n_clicked_after_view"),
        F.count("p").alias("n_purchased_after_click"),
    )


@query(
    "events_retention_cohorts",
    """
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
           CAST(day - cohort_day AS BIGINT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM activity JOIN firsts USING (user_id)
    GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-cohort matrix — the classic product-analytics composite:
    users bucketed by first-seen day, counted on each subsequent active
    day offset.  Two aggregations + one equi-join on user_id; at 100 TB
    the firsts frame is user-cardinality (shuffle-bounded), the activity
    frame is distinct (user, day) pairs — both partial-aggregated before
    their shuffles."""
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    activity = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "events_user_value_buckets",
    """
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    thr AS (
      SELECT quantile_cont(total, 0.25) AS q1,
             quantile_cont(total, 0.50) AS q2,
             quantile_cont(total, 0.75) AS q3
      FROM per_user
    )
    SELECT CASE WHEN total <= q1 THEN 'p00_25'
                WHEN total <= q2 THEN 'p25_50'
                WHEN total <= q3 THEN 'p50_75'
                ELSE 'p75_100' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CAST(total AS DECIMAL(25,6))) AS DOUBLE) AS bucket_value
    FROM per_user, thr
    GROUP BY 1
    """,
)
def events_user_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile segmentation at scale: per-user purchase totals bucketed
    by exact quartile thresholds.  The naive formulation — a GLOBAL
    ntile()/percent_rank() window — funnels the whole frame through ONE
    partition (the classic window-at-scale hazard); instead the three
    thresholds are computed on the already-aggregated user frame and
    broadcast, so bucketing is a per-row expression.  Threshold
    comparisons are engine-stable: an interpolated quantile lies strictly
    between two user totals, so last-ulp interpolation differences can
    never flip a bucket."""
    ev = table(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.col("value").cast(DEC)).cast("double").alias("total"))
    )
    thr = per_user.agg(
        F.expr("percentile(total, 0.25D)").alias("q1"),
        F.expr("percentile(total, 0.50D)").alias("q2"),
        F.expr("percentile(total, 0.75D)").alias("q3"),
    )
    bucket = (
        F.when(F.col("total") <= F.col("q1"), "p00_25")
        .when(F.col("total") <= F.col("q2"), "p25_50")
        .when(F.col("total") <= F.col("q3"), "p50_75")
        .otherwise("p75_100")
    )
    return (
        per_user.crossJoin(F.broadcast(thr))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.col("total").cast(DEC)).cast("double").alias("bucket_value"),
        )
    )


RESAMPLE_USERS = 20


@query(
    "resample_gapfill",
    f"""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             {sql_dsum('value', 'hour_value')}
      FROM events WHERE user_id < {RESAMPLE_USERS}
      GROUP BY user_id, date_trunc('hour', ts)
    ), bounds AS (
      SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1
      FROM hourly GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
               AS hour
      FROM bounds
    )
    SELECT g.user_id, g.hour,
           COALESCE(last_value(h.hour_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)
             AS filled_value,
           CAST(CASE WHEN h.hour_value IS NULL THEN 1 ELSE 0 END
                AS INTEGER) AS is_gap
    FROM grid g LEFT JOIN hourly h USING (user_id, hour)
    """,
)
def resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward fill (the hypertable/"gap fill"
    operator): aggregate events to an hourly grid per user, materialize
    the *complete* hour range between each user's first and last event,
    and carry the last observed value across empty hours (leading gaps
    fill with 0.0).  ``is_gap`` marks synthesized rows.

    Scale: the hourly rollup is one shuffle with partial aggregation;
    the dense grid is generated per user key (sequence + explode — a
    narrow 1→N fan-out, never a driver loop); the fill is a running
    ``last(ignorenulls)`` window per user.  Grid size is
    users × span_hours — linear in keys, independent of event count, so
    a 100 TB event table resamples to a grid sized by its key space."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id") < RESAMPLE_USERS
    )
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.sum(F.col("value").cast(DEC)).cast("double").alias("hour_value")
        )
        .localCheckpoint()  # feeds both the bounds agg and the grid join
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    joined = grid.join(hourly, ["user_id", "hour"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "hour",
        F.coalesce(
            F.last("hour_value", ignorenulls=True).over(w), F.lit(0.0)
        ).alias("filled_value"),
        F.col("hour_value").isNull().cast("int").alias("is_gap"),
    )


@query(
    "events_anomaly_hours",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(n_events) AS BIGINT) AS s,
             CAST(SUM(n_events * n_events) AS BIGINT) AS ss
      FROM hourly GROUP BY event_type
    )
    SELECT h.event_type, CAST(h.hour AS TIMESTAMP) AS hour, h.n_events
    FROM hourly h JOIN stats t ON h.event_type = t.event_type
    WHERE t.n_hours > 1
      AND (h.n_events * t.n_hours - t.s) * (h.n_events * t.n_hours - t.s)
          > 9 * (t.n_hours * t.ss - t.s * t.s)
    ORDER BY h.event_type, hour
    """,
)
def events_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-level volume anomaly detection per event type — the
    monitoring query a streaming ingest runs to flag traffic spikes:
    hours whose count deviates from the type's mean by more than 3
    standard deviations.  The z-test is algebraically cleared of
    division and square roots — ``(c·n − S)² > 9·(n·SS − S²)`` over
    exact integer sums — so results are engine-exact (no float
    round-trip can flip a boundary hour) and the whole plan is two
    shuffles: hourly counts, then per-type moment sums broadcast back.
    """
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("ss"),
    )
    j = hourly.join(F.broadcast(stats), "event_type")
    dev = F.col("n_events") * F.col("n_hours") - F.col("s")
    var9 = 9 * (
        F.col("n_hours") * F.col("ss") - F.col("s") * F.col("s")
    )
    return (
        j.filter((F.col("n_hours") > 1) & (dev * dev > var9))
        .select("event_type", "hour", "n_events")
        .orderBy("event_type", "hour")
    )
