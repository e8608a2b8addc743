"""Query/operator surface of the engine.

Tier B (SURVEY.md §2): the relational algebra the reference delegates to
Dask — here expressed directly on Spark DataFrames so Catalyst plans it.
Tier C: large-scale training-data-pipeline operators (dedup, similarity,
text analysis, multimodal) with the same registration contract.

Every operator registers a ``(spark, sf_dir) -> DataFrame`` callable and
(when SQL-expressible) a DuckDB oracle SQL string; ``__spark_entry__``
aggregates these for the driver's correctness harness.
"""

from daskberg_spark.operators.registry import ORACLES, QUERIES, query

__all__ = ["QUERIES", "ORACLES", "query"]
