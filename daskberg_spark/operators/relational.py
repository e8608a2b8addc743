"""Tier-B relational operators (SURVEY.md §2 B1-B14) over the star schema.

The reference delegates this entire surface to the Dask DataFrame returned
by ``read()`` (``/root/reference/daskberg/ice.py:240-264``); here each
capability is expressed declaratively so Catalyst owns the physical plan
(partial aggregation, broadcast-vs-shuffle join choice, AQE).

Scale notes (100 TB design):
- Joins against genuinely-small dimensions (region, nation, supplier)
  carry explicit ``F.broadcast`` hints; fact-to-fact joins shuffle on
  their keys and rely on AQE skew handling.
- Aggregations are all map-side-combinable hash aggregates.
- No ``collect()``/driver-side state anywhere; every query is one lazy
  plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daskberg_spark.operators.registry import (
    DEC,
    davg,
    dsum,
    query,
    register_views,
    sql_davg,
    sql_dsum,
    table,
)

# ---------------------------------------------------------------------------
# B3/B4 — aggregation


@query(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter → 2-key hash agg with 8 aggregates.

    At scale: partial aggregation runs map-side (6 groups total), so the
    shuffle carries only #partitions × 6 rows.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_discount > 0.05 AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1/A2: predicate + projection — both must reach the parquet scan
    (PushedFilters / ReadSchema in .explain)."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_discount") > 0.05)
            & (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@query(
    "distinct_values",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: distinct = hash agg without aggregates; map-side combine."""
    return table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "group_count",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: value_counts (the reference's test exercises this via Dask,
    tests/test_basic.py:19)."""
    return table(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "count_distinct",
    """
    SELECT c_nationkey,
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer GROUP BY c_nationkey
    """,
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: exact distinct aggregation (expands + two-phase agg in Spark)."""
    return table(spark, sf_dir, "customer").groupBy("c_nationkey").agg(
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@query("approx_count_distinct")  # HLL sketches differ per engine: rows-only check
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: HyperLogLog++ distinct — the 100 TB path where exact distinct
    would shuffle every key."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        )
    )


@query(
    "rollup_agg",
    f"""
    SELECT n_name, c_mktsegment,
           {sql_dsum('c_acctbal', 'sum_bal')},
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP(n_name, c_mktsegment)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: rollup grouping sets (nation → nation+segment → grand total).

    Two-phase like ``cube_agg``: collapse to one plain (nation,
    segment) aggregate first, then ROLLUP's Expand runs over those few
    rows instead of tripling every joined input row.  SUM re-sums the
    exact decimal sub-sums; COUNT(*) rolls up as SUM of sub-counts."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    pre = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(
            F.sum(F.col("c_acctbal").cast(DEC)).alias("__db"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    return pre.rollup("n_name", "c_mktsegment").agg(
        F.sum("__db").cast("double").alias("sum_bal"),
        F.sum("__n").alias("n"),
    )


@query(
    "cube_agg",
    f"""
    SELECT l_returnflag, l_linestatus, {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: cube — all 4 grouping sets.

    Two-phase: SUM is decomposable, so the corpus first collapses to
    one plain (flag, status) aggregate (a handful of rows) and the
    CUBE's Expand runs over THAT — a direct ``.cube()`` would expand
    every input row 4x before partial aggregation (4x the scan's rows
    through the hash aggregate).  Identical results: CUBE of SUM over
    rows == CUBE of SUM over per-(flag,status) sub-sums."""
    pre = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        # keep the exact DECIMAL sub-sums; the double cast happens only
        # after the cube's re-sum, so the result is bit-identical to a
        # single decimal sum over all rows
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("__dq"))
    )
    return pre.cube("l_returnflag", "l_linestatus").agg(
        F.sum("__dq").cast("double").alias("sum_qty")
    )


@query(
    "grouping_sets",
    f"""
    SELECT o_orderstatus, o_orderpriority, {sql_dsum('o_totalprice', 'sum_price')}
    FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: explicit GROUPING SETS via Spark SQL on a temp view.

    Two-phase like ``cube_agg``/``rollup_agg``: the corpus first
    collapses to one plain (status, priority) aggregate (a handful of
    rows) and GROUPING SETS' Expand runs over THAT — a direct grouping
    set doubles every input row through the first hash aggregate.
    Bit-identical: the exact DECIMAL sub-sums re-sum losslessly and the
    double cast happens only after the re-sum."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(SUM(__dp) AS DOUBLE) AS sum_price
        FROM (
            SELECT o_orderstatus, o_orderpriority,
                   SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS __dp
            FROM orders GROUP BY o_orderstatus, o_orderpriority
        )
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# ---------------------------------------------------------------------------
# B7/B8 — joins


@query(
    "join_multi",
    f"""
    SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join.

    At scale: region/nation/supplier broadcast (collectively tiny);
    customer⋈orders⋈lineitem shuffle on their keys — Catalyst reorders,
    AQE re-plans sizes at runtime.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@query(
    "join_left",
    f"""
    SELECT c_mktsegment,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_dsum('COALESCE(o_totalprice, 0)', 'sum_price')}
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: left outer join preserving customers without orders."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)), "sum_price"),
        )
    )


@query(
    "join_semi",
    """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    GROUP BY c_mktsegment
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: left-semi join (EXISTS) — no row multiplication, early-out probe."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "join_anti",
    """
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: left-anti join (NOT EXISTS)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "join_full_outer",
    f"""
    SELECT COALESCE(a.k, b.k) AS k,
           CAST(COUNT(a.k) AS BIGINT) AS n_cust,
           CAST(COUNT(b.k) AS BIGINT) AS n_supp
    FROM (SELECT c_nationkey AS k FROM customer) a
    FULL OUTER JOIN (SELECT s_nationkey AS k FROM supplier) b ON a.k = b.k
    GROUP BY COALESCE(a.k, b.k)
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: full outer join keeping unmatched keys from both sides."""
    a = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    b = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    joined = a.alias("a").join(b.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer")
    return joined.groupBy(
        F.coalesce(F.col("a.k"), F.col("b.k")).alias("k")
    ).agg(
        F.count(F.col("a.k")).alias("n_cust"),
        F.count(F.col("b.k")).alias("n_supp"),
    )


@query(
    "join_theta",
    """
    SELECT n1.n_regionkey AS region, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM nation n1 JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    GROUP BY n1.n_regionkey
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: non-equi (theta) join; the equi part keys the shuffle, the
    inequality stays as residual — never a full cross product."""
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    return (
        n1.join(
            n2,
            (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
            & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
        )
        .groupBy(F.col("n1.n_regionkey").alias("region"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "join_range",
    """
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderstatus
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: equi-join + range residual (late-shipment analysis)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_late"))
    )


# ---------------------------------------------------------------------------
# B9/B10 — sort / top-k / window


@query(
    "topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: global top-k → TakeOrderedAndProject (per-partition top-k then
    driver merge of k·partitions rows, never a global sort)."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "window_rank",
    """
    SELECT o_custkey, o_orderkey, rn FROM (
      SELECT o_custkey, o_orderkey,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey) AS INT) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: top-N per group via row_number window (deterministic tiebreak)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


@query(
    "window_running",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_total
    FROM orders
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: running aggregate frame (decimal-exact so engine-internal
    summation trees can't perturb the result)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@query(
    "window_lag",
    """
    SELECT o_custkey, o_orderkey,
           o_totalprice - LAG(o_totalprice) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS delta_prev
    FROM orders
    """,
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: analytic lag — per-row double subtraction is bit-exact."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("delta_prev"),
    )


# ---------------------------------------------------------------------------
# B11 — set operations


@query(
    "set_union",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    return a.unionByName(b).distinct()


@query(
    "set_intersect",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select("c_custkey")
    )
    b = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.intersect(b)


@query(
    "set_except",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = table(spark, sf_dir, "customer").select("c_custkey")
    b = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    # subtract == SQL EXCEPT (distinct; removes a key entirely when present
    # on the right) — exceptAll().distinct() would keep left-heavy keys
    return a.subtract(b)


# ---------------------------------------------------------------------------
# B12 — scalar functions


@query(
    "scalar_functions",
    """
    SELECT o_orderkey,
           upper(substring(o_orderpriority, 1, 3)) AS prio3,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           round(o_totalprice, 0) AS price_rounded,
           concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
           CAST(length(o_orderpriority) AS INT) AS prio_len
    FROM orders
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: string/date/math scalar functions — all JVM-side codegen."""
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("prio3"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.round("o_totalprice", 0).alias("price_rounded"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.length("o_orderpriority").cast("int").alias("prio_len"),
    )


@query(
    "date_functions",
    f"""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('o_totalprice', 'sum_price')}
    FROM orders GROUP BY date_trunc('month', o_orderdate)
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: temporal bucketing (the batch analogue of a tumbling window)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "sum_price"))
    )


@query(
    "case_when_agg",
    f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_discount > 0.05 THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 'discounted_rev')},
           {sql_dsum("CASE WHEN l_discount <= 0.05 THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 'full_rev')}
    FROM lineitem GROUP BY l_returnflag
    """,
)
def case_when_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: conditional aggregation."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    hi = F.when(F.col("l_discount") > 0.05, rev).otherwise(F.lit(0.0))
    lo = F.when(F.col("l_discount") <= 0.05, rev).otherwise(F.lit(0.0))
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(dsum(hi, "discounted_rev"), dsum(lo, "full_rev"))
    )


@query(
    "pivot_agg",
    f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 'F')},
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 'O')}
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: pivot with explicit value list (never let pivot scan for
    distinct values at scale)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double"))
    )


@query(
    "median_quantile",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.9) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def median_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: exact interpolated quantiles (Spark `percentile`); the 100 TB
    path would use approx_percentile — kept exact here for the oracle."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90_price"),
        )
    )


# ---------------------------------------------------------------------------
# events: JSON + sessionization + temporal windows


@query(
    "json_functions",
    f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_davg("CAST(json_extract_string(props, '$.k') AS BIGINT)", 'avg_k')}
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    GROUP BY event_type
    """,
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: JSON extraction from a string column."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), davg("k", "avg_k"))
    )


@query(
    "events_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(SUM(is_new) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute inactivity gap via lag window (the batch
    twin of streaming session_window)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = table(spark, sf_dir, "events")
    # epoch MICROseconds via pure NTZ arithmetic — tz-independent, and
    # exact integers on both engines (whole-second truncation vs DuckDB's
    # fractional epoch() disagrees for gaps inside (1800, 1801))
    us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    return (
        ev.withColumn("is_new", is_new)
        .groupBy("user_id")
        .agg(
            F.sum("is_new").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "events_hourly",
    f"""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('value', 'sum_value')}
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation, batch form (streaming twin lives in
    daskberg_spark.streaming)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
    )


# ---------------------------------------------------------------------------
# B13 — vectorized Python UDF


@query(
    "pandas_udf_score",
    """
    SELECT c_custkey,
           round(c_acctbal * 0.8 + length(c_name) * 1.5, 6) AS score
    FROM customer
    """,
)
def pandas_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13: Arrow-vectorized pandas UDF (deterministic arithmetic so the
    oracle can mirror it in SQL)."""
    # NB: no type hints — `from __future__ import annotations` stringifies
    # them, which pandas_udf's signature inference rejects.
    def _score(bal, name_len):
        return (bal * 0.8 + name_len * 1.5).round(6)

    score = F.pandas_udf(_score, "double")

    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        score(F.col("c_acctbal"), F.length("c_name").cast("double")).alias("score"),
    )


# ---------------------------------------------------------------------------
# B14 — write/sink (the reference is read-only; README.md:92-94)


@query(
    "write_roundtrip",
    """
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem WHERE l_discount > 0.07 GROUP BY l_returnflag
    """,
)
def write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14: parquet sink → re-read → aggregate.  Snappy parquet,
    partition-parallel write; the reference lists writing as missing."""
    import tempfile

    out = tempfile.mkdtemp(prefix="daskberg_spark_write_")
    (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_discount") > 0.07)
        .write.mode("overwrite")
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
