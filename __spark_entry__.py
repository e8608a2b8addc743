"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``daskberg_spark``; this module only
aggregates the registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _load_registry():
    # Import for registration side effects.
    import daskberg_spark.operators.relational  # noqa: F401

    for optional in (
        "daskberg_spark.operators.advanced",
        "daskberg_spark.operators.relational2",
        "daskberg_spark.operators.tpch",
        "daskberg_spark.operators.dedup",
        "daskberg_spark.operators.similarity",
        "daskberg_spark.operators.text",
        "daskberg_spark.operators.multimodal",
        "daskberg_spark.operators.iceberg_queries",
        "daskberg_spark.streaming.events",
    ):
        try:
            __import__(optional)
        except Exception:
            # an optional module must never take the whole registry down
            # (fixture-build IO errors included)
            pass
    from daskberg_spark.operators.registry import ORACLES, QUERIES

    return QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    queries, _ = _load_registry()
    return queries["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q, _ = _load_registry()
    return dict(q)


def oracle_sql() -> dict[str, str]:
    _, o = _load_registry()
    try:
        # oracles over local Iceberg fixtures need them on disk
        from daskberg_spark.operators.iceberg_queries import prepare_fixtures

        prepare_fixtures()
    except Exception:
        pass
    return dict(o)
