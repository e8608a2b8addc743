"""daskberg_spark — a PySpark-native analytics engine with the capabilities
of martindurant/daskberg (an Iceberg-v1 table client), rebuilt Spark-first.

Layers
------
- ``daskberg_spark.iceberg``   — pure-Python Iceberg v1 metadata layer
  (Avro manifest decoding, snapshot time travel, partition/stat pruning,
  partition-transform-aware predicate rewrite) feeding a stock
  ``spark.read.parquet`` scan.  Reference semantics: daskberg ``ice.py`` /
  ``conversions.py`` / ``rest_client.py``; implementation is new and
  spec-correct where the reference deviates.
- ``daskberg_spark.operators`` — the relational query surface the reference
  delegates to Dask (here: Catalyst built-ins), plus large-scale
  training-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal columns).
- ``daskberg_spark.streaming`` — Structured Streaming variants over the
  events table.
"""

from daskberg_spark.iceberg.metadata import IcebergTable
from daskberg_spark.iceberg.rest import IceRestClient
from daskberg_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["IcebergTable", "IceRestClient", "get_spark", "__version__"]
