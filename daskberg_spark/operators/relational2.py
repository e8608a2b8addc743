"""Tier-B surface, second pack: grouped-map UDFs, richer window frames,
ordered-set / positional aggregates, array aggregation (SURVEY §2
B10/B12/B13 depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from daskberg_spark.operators.registry import query, table


@query(
    "grouped_map_scale",
    """
    SELECT c_custkey, c_mktsegment,
           CASE WHEN mx = mn THEN 0.0
                ELSE (c_acctbal - mn) / (mx - mn) END AS bal_scaled
    FROM (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             MIN(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mn,
             MAX(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mx
      FROM customer) t
    """,
)
def grouped_map_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13: applyInPandas grouped-map — per-segment min-max scaling.

    min/max are exact and the per-row arithmetic is identical IEEE ops, so
    a window-function oracle matches the pandas path bit-for-bit.  The
    grouped-map shape is the per-entity normalize/featurize pattern; each
    group becomes one Arrow batch on one executor."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_mktsegment", T.StringType()),
            T.StructField("bal_scaled", T.DoubleType()),
        ]
    )

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["c_acctbal"].min(), pdf["c_acctbal"].max()
        if mx != mn:
            scaled = (pdf["c_acctbal"] - mn) / (mx - mn)
        else:
            # literal zeros: multiplying negative balances by 0.0 yields
            # -0.0, which bit-mismatches the oracle's CASE 0.0
            scaled = pd.Series(0.0, index=pdf.index)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "bal_scaled": scaled,
            }
        )

    cust = table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").applyInPandas(scale, schema)


@query(
    "window_range_frame",
    """
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
              PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
              RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS rolling_30d
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: RANGE frame — trailing-30-day revenue per customer, keyed on
    epoch seconds (Spark rangeBetween needs a numeric ordering key)."""
    # tz-independent epoch seconds (see events_sessionize note)
    secs = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)"
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(secs)
        .rangeBetween(-30 * 86400, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("rolling_30d"),
    )


@query(
    "window_distribution",
    """
    SELECT o_orderkey,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST() OVER w AS cd
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: distribution functions (ntile / percent_rank / cume_dist) —
    global ordering demo; deterministic tiebreak on the unique key.

    Scale note: a single unpartitioned window is a one-reducer sort; at
    100 TB this shape needs a partition key or a two-pass quantile
    approach — ``window_distribution_partitioned`` is the registered
    scale-safe sibling (and see approx_quantiles)."""
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "window_distribution_partitioned",
    """
    SELECT o_orderkey,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST() OVER w AS cd
    FROM orders
    WINDOW w AS (PARTITION BY date_trunc('month', o_orderdate)
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: the scale-safe sibling of ``window_distribution`` — identical
    distribution functions but PARTITIONED BY order month, so the sort
    shards across reducers instead of collapsing to one (a global
    ``Window.orderBy`` is a single-reducer sort; this shape survives
    100 TB as long as the partition key bounds per-group row counts).
    Deterministic tiebreak on the unique key as before."""
    w = Window.partitionBy(F.date_trunc("month", "o_orderdate")).orderBy(
        "o_totalprice", "o_orderkey"
    )
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "agg_argminmax",
    """
    SELECT c_nationkey,
           CAST(arg_max(c_custkey, c_acctbal) AS BIGINT) AS richest_cust,
           CAST(arg_min(c_custkey, c_acctbal) AS BIGINT) AS poorest_cust,
           max(c_acctbal) AS max_bal
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: positional aggregates max_by/min_by (arg_max/arg_min) — top-1
    per group without a window."""
    cust = table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.expr("max_by(c_custkey, c_acctbal)").alias("richest_cust"),
        F.expr("min_by(c_custkey, c_acctbal)").alias("poorest_cust"),
        F.max("c_acctbal").alias("max_bal"),
    )


@query(
    "agg_collect_sorted",
    """
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), '|') AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: collect_list + array_sort — deterministic array aggregation
    (unsorted collect_list is partition-order-dependent and unverifiable).

    The sorted array is serialized with ``concat_ws('|')`` to one scalar
    string column (mirrored as ``array_to_string`` in the oracle): the
    driver's pandas canonicalizer cannot hash list-valued cells.
    """
    nation = table(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.concat_ws("|", F.array_sort(F.collect_list("n_name"))).alias("nations")
    )


@query(
    "string_functions2",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           replace(p_brand, '#', '-') AS brand_clean,
           CAST(length(translate(p_type, 'aeiou', '')) AS BIGINT) AS consonants,
           reverse(p_brand) AS brand_rev
    FROM part
    """,
)
def string_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: regexp_extract / lpad / replace / translate / reverse."""
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_replace("p_brand", "#", "-").alias("brand_clean"),
        F.length(F.translate("p_type", "aeiou", "")).cast("long").alias("consonants"),
        F.reverse("p_brand").alias("brand_rev"),
    )


@query(
    "map_functions",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k
    FROM events GROUP BY event_type
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: from_json → MapType → map access — the semi-structured
    column pattern (vs per-field get_json_object in json_functions)."""
    ev = table(spark, sf_dir, "events")
    props = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return (
        ev.select("event_type", props.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.element_at("m", "k")).cast("long").alias("sum_k"),
        )
    )


@query(
    "partitioned_write",
    """
    SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem WHERE l_quantity > 40
    GROUP BY l_returnflag, l_linestatus
    """,
)
def partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14: hive-partitioned parquet sink (partitionBy) → re-read with
    partition discovery → agg; the layout every downstream consumer of a
    100 TB corpus expects."""
    import tempfile

    out = tempfile.mkdtemp(prefix="daskberg_part_write_")
    (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 40)
        .write.mode("overwrite")
        .partitionBy("l_returnflag")
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "array_functions",
    """
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                t -> len(t) > 4)) AS INT) AS n_long_tokens,
           CAST(list_aggregate(list_transform(
                  string_split_regex(lower(trim(text)), '\\s+'),
                  t -> len(t)), 'sum') AS BIGINT) AS total_len,
           array_to_string(list_sort(list_distinct(list_transform(
               string_split_regex(lower(trim(text)), '\\s+'),
               t -> t[1:1]))), '') AS initials
    FROM documents
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12 depth: higher-order array functions — filter / transform /
    aggregate / array_distinct / array_sort — all JVM-side lambdas inside
    whole-stage codegen (zero Python), mirrored by DuckDB list lambdas."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), "[ \\t\\n\\f\\r]+")
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long_tokens"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_len"),
        F.concat_ws(
            "",
            F.array_sort(
                F.array_distinct(F.transform(toks, lambda t: F.substring(t, 1, 1)))
            ),
        ).alias("initials"),
    )
