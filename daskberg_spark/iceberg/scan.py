"""Iceberg table → Spark DataFrame: the compute hand-off.

Reference counterpart: ``/root/reference/daskberg/ice.py:220-264`` (hand-off
to ``dask.dataframe.read_parquet``).  Here the pruned file list feeds
``spark.read.schema(st).parquet(*files)``:

- The explicit snapshot-pinned schema makes schema evolution work: older
  files missing newer columns resolve by name and null-fill (reference
  forces dtypes into fastparquet, ``ice.py:252-254``).
- The *full* predicate is always re-applied as a Spark ``filter`` so
  metadata pruning is pure IO-elision — correctness never depends on
  stats (SURVEY.md §4 delta 2).  Catalyst then pushes the residual down
  to parquet row-group skipping for free.
- Empty survivor set → empty DataFrame with the right schema (the
  reference raises ValueError, ``ice.py:248-249``; Spark semantics favor
  the empty relation — SURVEY.md §4 delta 1).
"""

from __future__ import annotations

import datetime
from decimal import Decimal
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from daskberg_spark.iceberg.conversions import schema_to_struct
from daskberg_spark.iceberg.metadata import IcebergTable
from daskberg_spark.iceberg.planner import is_dnf


def _lit(value: Any) -> Column:
    if isinstance(value, (datetime.datetime, datetime.date, Decimal)):
        return F.lit(value)
    return F.lit(value)


def filters_to_column(filters: Any) -> Column | None:
    """DNF filter tuples → a single Spark boolean Column."""
    if not filters:
        return None

    def pred(p: tuple[str, str, Any]) -> Column:
        col, op, val = p
        c = F.col(col)
        if op in ("==", "="):
            return c == _lit(val)
        if op == "!=":
            return c != _lit(val)
        if op == "<":
            return c < _lit(val)
        if op == "<=":
            return c <= _lit(val)
        if op == ">":
            return c > _lit(val)
        if op == ">=":
            return c >= _lit(val)
        if op == "in":
            return c.isin(list(val))
        raise ValueError(f"unknown op {op!r}")

    def conj(preds: list[tuple[str, str, Any]]) -> Column:
        out = pred(preds[0])
        for p in preds[1:]:
            out = out & pred(p)
        return out

    if is_dnf(filters):
        out = conj(filters[0])
        for c in filters[1:]:
            out = out | conj(c)
        return out
    return conj(filters)


def to_df(
    table: IcebergTable,
    spark: SparkSession,
    filters: Any = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Materialize the table's current snapshot as a (lazy) DataFrame."""
    struct = schema_to_struct(table.schema)
    files = table.plan_files(filters)
    if not files:
        df = spark.createDataFrame([], struct)
    else:
        df = _read_file_groups(table, spark, files, struct)
        df = _apply_delete_files(table, spark, df)
    residual = filters_to_column(filters)
    if residual is not None:
        df = df.filter(residual)
    if columns:
        df = df.select(*columns)
    return df


def _read_file_groups(
    table: IcebergTable,
    spark: SparkSession,
    files: list[dict[str, Any]],
    struct,
) -> DataFrame:
    """Read data files grouped by the schema they were written under,
    resolving columns by **field id** (SURVEY §1.4): a renamed column's
    old files read under the old name, then rename to the current one —
    naive by-name reading would silently null-fill renamed columns.

    The common case (every file on the current schema) stays a single
    multi-path scan.
    """
    current_fields = table.schema["fields"]
    current_ids = {f.get("id", f.get("field-id")): f["name"] for f in current_fields}

    def schema_key(f: dict[str, Any]):
        s = table.schema_for_snapshot(f.get("_snapshot_id"))
        return s.get("schema-id", 0), s

    groups: dict[int, tuple[dict[str, Any], list[str]]] = {}
    for f in files:
        sid, schema = schema_key(f)
        groups.setdefault(sid, (schema, []))[1].append(f["file_path"])

    current_sid = table.schema.get("schema-id", 0)
    if set(groups) <= {current_sid}:
        return spark.read.schema(struct).parquet(*[f["file_path"] for f in files])

    parts = []
    for sid, (schema, paths) in sorted(groups.items()):
        gstruct = schema_to_struct(schema)
        gdf = spark.read.schema(gstruct).parquet(*paths)
        renames = {}
        for fld in schema["fields"]:
            fid = fld.get("id", fld.get("field-id"))
            if fid in current_ids and current_ids[fid] != fld["name"]:
                renames[fld["name"]] = current_ids[fid]
            elif fid not in current_ids:
                gdf = gdf.drop(fld["name"])  # column dropped since
        if renames:
            gdf = gdf.withColumnsRenamed(renames)
        parts.append(gdf)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    # columns added after a file was written surface as nulls; project to
    # the current schema's order
    for fld in current_fields:
        if fld["name"] not in out.columns:
            out = out.withColumn(
                fld["name"],
                F.lit(None).cast(schema_to_struct({"fields": [fld]})[0].dataType),
            )
    return out.select(*[f["name"] for f in current_fields])


def _apply_delete_files(
    table: IcebergTable, spark: SparkSession, df: DataFrame
) -> DataFrame:
    """Apply v2 position/equality delete files as anti-joins.

    - equality deletes: left-anti join on the delete file's key columns
      (grouped by equality-id set so one join serves many files);
    - position deletes: tag rows with ``_metadata`` file path + row
      index, anti-join against the (file_path, pos) set.

    Delete sets are small relative to data (broadcast hint); simplified
    v2 applicability (no sequence-number ordering — deletes apply to all
    live data files), documented in writer.delete_rows_equality.
    """
    deletes = table.plan_deletes()
    if not deletes:
        return df
    id_to_name = {
        f.field_id: name for name, f in table.fields.items()
    }
    # group equality deletes by their key-column set
    eq_groups: dict[tuple[str, ...], list[str]] = {}
    pos_paths: list[str] = []
    for d in deletes:
        if d.get("content") == 2:
            cols = tuple(sorted(id_to_name[i] for i in d["equality_ids"]))
            eq_groups.setdefault(cols, []).append(d["file_path"])
        else:
            pos_paths.append(d["file_path"])

    if pos_paths:
        # `_metadata` resolves only on the scan relation itself — capture
        # file/row identity BEFORE any join touches the plan.
        df = df.withColumns(
            {
                "__file": F.regexp_replace(
                    F.col("_metadata.file_path"), "^file:/*", "/"
                ),
                "__pos": F.col("_metadata.row_index"),
            }
        )

    for cols, paths in sorted(eq_groups.items()):
        keys = spark.read.parquet(*paths).select(*cols).distinct()
        df = df.join(F.broadcast(keys), on=list(cols), how="left_anti")

    if pos_paths:
        pos = (
            spark.read.parquet(*pos_paths)
            .select(
                F.regexp_replace("file_path", "^file:/*", "/").alias("__del_file"),
                F.col("pos").alias("__del_pos"),
            )
            .distinct()
        )
        df = (
            df.join(
                F.broadcast(pos),
                (df["__file"] == pos["__del_file"])
                & (df["__pos"] == pos["__del_pos"]),
                "left_anti",
            )
            .drop("__file", "__pos")
        )
    return df


# Convenience: method-style API mirroring the reference's read()
def read(
    table: IcebergTable,
    spark: SparkSession,
    filters: Any = None,
    columns: list[str] | None = None,
) -> DataFrame:
    return to_df(table, spark, filters=filters, columns=columns)


IcebergTable.to_df = to_df  # type: ignore[attr-defined]
IcebergTable.read = read  # type: ignore[attr-defined]


def diff_df(
    table: IcebergTable,
    spark: SparkSession,
    from_rel: int = -1,
    filters: Any = None,
) -> DataFrame:
    """Incremental read: rows in data files that are live in the current
    snapshot but were not live ``from_rel`` snapshots ago (append-only
    changelog; reference's snapshot log is exactly this history,
    SURVEY §1.5).  File-level diff — Iceberg appends are whole files, so
    added rows == rows of added files; pruning filters apply on top."""
    current = table.current_snapshot
    files_now = {f["file_path"] for f in table.plan_files(filters)}
    table.open_snapshot(rel=from_rel)
    files_then = {f["file_path"] for f in table.plan_files()}
    # restore the caller-visible snapshot
    table.open_snapshot(snapshot_id=current["snapshot-id"])
    added = sorted(files_now - files_then)
    struct = schema_to_struct(table.schema)
    if not added:
        df = spark.createDataFrame([], struct)
    else:
        df = spark.read.schema(struct).parquet(*added)
    residual = filters_to_column(filters)
    if residual is not None:
        df = df.filter(residual)
    return df


IcebergTable.diff_df = diff_df  # type: ignore[attr-defined]
