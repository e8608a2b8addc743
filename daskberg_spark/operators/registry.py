"""Registration + shared helpers for the query/operator inventory.

The driver compares each registered query against its DuckDB oracle by
row-count, schema, and order-insensitive value hash.  Two conventions keep
the comparison deterministic:

- **Exact aggregation of doubles.**  ``SUM(double)`` is order-dependent in
  the last ulp (Spark sums per-partition, DuckDB sequentially).  Both
  sides therefore cast the (identically-computed, bit-exact) per-row
  double to ``DECIMAL(25,6)``, aggregate exactly, and cast the result
  back to double: same bits on both engines regardless of execution
  order.  See ``dsum``/``davg`` and the matching SQL shapes.
- **Explicit result types.**  DuckDB widens integer sums to HUGEINT and
  ``year()`` to BIGINT; every oracle aggregate is wrapped in a CAST so
  both sides agree (long for counts/sums, double for money).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

DEC = "decimal(25,6)"


def query(name: str, oracle: str | None = None) -> Callable:
    """Register a query implementation and (optionally) its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def literal_df(
    spark: SparkSession, rows: list[tuple], schema: str
) -> DataFrame:
    """Small constant DataFrame as a pure-Catalyst literal relation:
    ``inline(array(struct(...)))`` over ``spark.range(1)``.  Unlike
    ``spark.createDataFrame`` on a driver list — which builds its RDD
    through Python workers (applySchemaToPythonRDD, a fixed ~0.3-0.5 s
    per query) — this stays JVM-side and folds at plan time.  Meant for
    planning-state-sized frames (quantile targets, seed tables); large
    lists should use createDataFrame, whose cost amortizes."""
    if not rows:
        return spark.createDataFrame([], schema)
    # split on top-level commas only: both decimal(p,s) parens and
    # map<string,int>/struct<...> angle brackets nest commas
    cols, depth, cur = [], 0, []
    for ch in schema:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            cols.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    cols.append("".join(cur))
    names = [c.split()[0] for c in cols]

    def _lit(v):
        # F.lit covers scalars and (Spark 4) flat lists; dict values
        # need an explicit map constructor
        if isinstance(v, dict):
            return F.create_map(
                *[x for k, u in v.items() for x in (F.lit(k), _lit(u))]
            )
        return F.lit(v)

    structs = [
        F.struct(*[_lit(v).alias(n) for v, n in zip(r, names)]) for r in rows
    ]
    out = spark.range(1).select(F.inline(F.array(*structs)))
    # apply declared types (lit() infers e.g. int where long is declared)
    return out.select(
        *[
            F.col(c.split()[0]).cast(" ".join(c.split()[1:])).alias(c.split()[0])
            for c in cols
        ]
    )


# Inferred schema per fixture path (r16): schema inference on a parquet
# read is a JVM round-trip of file listing + footer decode (~0.1 s
# measured) paid by EVERY table() call; the fixture files are immutable
# inputs, so the FIRST inference's StructType is memoized and passed
# explicitly afterwards — identical schema by construction (it IS the
# inference result), zero result caching.  A real deployment gets the
# same effect from its catalog's table metadata.
_SCHEMA_MEMO: dict[str, Any] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return events_table(spark, sf_dir)
    path = f"{sf_dir}/{name}.parquet"
    s = _SCHEMA_MEMO.get(path)
    if s is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[path] = df.schema
        return df
    return spark.read.schema(s).parquet(path)


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events fixture reader.  Some driver generations emit ``ts`` as
    parquet TIMESTAMP(NANOS), which Spark's vectorized reader rejects
    outright: for those, read nanos as longs
    (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild a
    µs-precision TIMESTAMP_NTZ column — distributed, no driver
    materialization.  The legacy conf is SESSION-wide, so it is only
    flipped when the footer actually declares nanos (the current
    fixtures are timestamp[us]) — blanket-setting it silently turned
    every later nanos-parquet read in the session into bigints."""
    import pyarrow.parquet as _pq

    try:
        ts_type = str(
            _pq.ParquetFile(f"{sf_dir}/events.parquet").schema_arrow.field("ts").type
        )
    except Exception:
        ts_type = ""
    if ts_type == "timestamp[ns]":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes)["ts"] == "bigint":
        # integer DIV, not `/`: ns epochs exceed double's 2^53 mantissa and
        # float division lands ±1µs off DuckDB's truncation.  NTZ built by
        # pure arithmetic from the epoch (timestampadd on an NTZ base) so
        # the result is identical under ANY session timezone — a
        # timestamp_micros→cast route would shift off-UTC sessions.
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts DIV 1000,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return df


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent exact sum of a double expression → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Exact-sum average: cast-to-decimal sum / count, division in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(DEC)).cast("double") / F.count(c)
    ).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def iceberg_golden_table() -> Any:
    """The reference's checked-in golden table, relocated."""
    from daskberg_spark.iceberg.metadata import IcebergTable

    return IcebergTable(
        "/root/reference/test-data/my_table",
        original_url="/Users/mdurant/temp/warehouse/db/my_table",
    )
