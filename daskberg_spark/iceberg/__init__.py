"""Pure-Python Iceberg v1 connector: metadata, pruning, Spark scan.

The reference (daskberg) reads Iceberg metadata with fastavro and hands
files to Dask (``/root/reference/daskberg/ice.py``).  Here the metadata
layer is self-contained pure Python (no fastavro / iceberg-runtime jars in
the environment) and the compute hand-off is ``spark.read.parquet`` over
the pruned file list — Catalyst then adds row-group pushdown, column
pruning and whole-stage codegen on top.
"""

from daskberg_spark.iceberg.metadata import IcebergTable

__all__ = ["IcebergTable"]
