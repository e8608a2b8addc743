"""Per-file column SUM statistics as engine-extension Puffin blobs —
the additive third leg of the statistics family (theta = NDV,
quantiles = ranks, this = totals).

Iceberg manifests carry per-file counts and bounds but no sums, so a
``SUM(col)`` / ``AVG(col)`` is a full scan even on a table whose every
other aggregate answers from metadata (``agg.py``).  This module
stores, per indexed column, the EXACT per-file sum and non-null count
of every data file's RAW contents in a ``daskberg-colsum-v1`` blob,
and ``agg_pushdown`` gains ``sum`` on top of it: a clean (delete-free)
whole-matching file contributes its stored sum, everything else joins
the one residual scan.  On a 100 TB table ``SUM(qty) GROUP BY day``
becomes a blob read — per-file sums ARE per-group sums under identity
partitioning, the same argument the grouped count/min/max pushdown
makes.

Soundness is exactness, not estimation:

- **Integral and decimal columns only.**  Sums accumulate as
  ``decimal(38, s)`` inside Spark (a single file cannot overflow it:
  |sum| ≤ 2³¹ rows × 2⁶³ < 10³⁸) and as arbitrary-precision Python
  ints across files — never a silent wrap.  float/double are REFUSED:
  their sums are order-dependent in IEEE arithmetic, so no stored
  per-file value could promise bit-exact equality with a direct scan.
- **Raw-file semantics** (same design as the Bloom index): a blob
  describes the immutable file's FULL contents, so it stays valid at
  every snapshot — time travel and rollback included — and any file
  with a possibly-applicable delete simply falls back to the scan
  (a DV's exact cardinality helps ``count(*)`` but says nothing about
  WHICH values died, so sums always need clean files).
- **Missing coverage degrades, never lies**: a file absent from every
  blob (appended after the last refresh) routes to the residual scan;
  ``refresh_sum_statistics`` indexes only the uncovered files and
  ``maintain()`` runs it for opted-in tables.

Engine extension: foreign readers skip unknown Puffin blob types per
the spec, exactly like the bloom/quantile blobs.

Reference parity: the reference (daskberg) has no statistics writing
at all (``/root/reference/README.md`` "Missing": any writing); sums
are its full-scan path like every aggregate.
"""

from __future__ import annotations

import decimal
import json
import os
import uuid
from typing import Any

SUM_BLOB_TYPE = "daskberg-colsum-v1"

_INT64_MAX = (1 << 63) - 1


def is_summable(type_str: str) -> bool:
    return type_str in ("int", "long") or type_str.startswith("decimal")


def type_scale(type_str: str) -> int:
    """Decimal scale of the column (0 for int/long)."""
    if type_str.startswith("decimal"):
        return int(type_str.rstrip(")").split(",")[1])
    return 0


def _norm(p: str) -> str:
    from daskberg_spark.iceberg.scan import _norm_scan_path

    return _norm_scan_path(p)


def write_sum_statistics(
    writer,
    spark,
    columns: list[str] | None = None,
    file_subset: dict[str, set] | None = None,
    scan_source=None,
) -> str | None:
    """Build per-(file, column) exact sums in ONE distributed pass and
    commit them as a Puffin statistics file on the current snapshot.
    Returns the statistics file path (None when nothing qualifies).

    The pass reads RAW file contents (``_read_file_groups``, no delete
    application) grouped by ``__file``: one ``decimal(38, s)`` sum and
    one non-null count per (file, column) reach the driver — O(files),
    never values or rows.  Zero-row and all-NULL files are recorded
    explicitly (sum NULL, count 0) so the probe can SKIP them instead
    of scanning.

    ``file_subset`` (per-column sets of file paths) restricts the build
    to those files — the incremental ``refresh_sum_statistics`` path —
    and the entry is APPENDED (prior blobs stay live, later entries
    win per file) instead of replacing the snapshot's colsum entry.
    """
    import daskberg_spark.iceberg.scan  # noqa: F401  (attaches .to_df)
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from daskberg_spark.iceberg.conversions import schema_to_struct
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.puffin import write_puffin
    from daskberg_spark.iceberg.scan import _read_file_groups

    if not writer.snapshots:
        raise ValueError("table has no snapshots")
    types = dict(writer.types)
    if columns is None:
        columns = sorted(c for c, t in types.items() if is_summable(t))
    else:
        for c in columns:
            if c not in types:
                raise ValueError(f"unknown column {c!r}")
            if not is_summable(types[c]):
                raise ValueError(
                    f"column {c!r} has type {types[c]!r} — exact sum "
                    "statistics cover int/long/decimal only (float "
                    "sums are order-dependent)"
                )
    if not columns:
        return None
    snapshot_id = writer.head_snapshot["snapshot-id"]
    t = IcebergTable(writer.path)
    live = t.plan_files(None)
    targets: dict[str, set[str]] = {}
    for c in columns:
        if file_subset is None:
            targets[c] = {_norm(f["file_path"]) for f in live}
        else:
            targets[c] = {_norm(p) for p in file_subset.get(c, ())}
    scan_paths = set().union(*targets.values())
    if not scan_paths:
        return None
    scan_files = [f for f in live if _norm(f["file_path"]) in scan_paths]
    # one-scan maintenance (r14): a SharedStatsScan serves the already-
    # read cached frame; None falls back to a direct read
    df = (
        scan_source.raw_frame(scan_files, set(columns))
        if scan_source is not None
        else None
    )
    if df is None:
        scan_struct = T.StructType(
            [
                f
                for f in schema_to_struct(t.schema).fields
                if f.name in columns
            ]
        )
        df = _read_file_groups(
            t,
            spark,
            scan_files,
            scan_struct,
            tag_position=False,
            tag_file=True,
        )
    scales = {c: type_scale(types[c]) for c in columns}
    aggs = []
    for c in columns:
        aggs.append(
            F.sum(F.col(c).cast(f"decimal(38,{scales[c]})")).alias(f"s {c}")
        )
        aggs.append(F.count(F.col(c)).alias(f"n {c}"))
    got = {r["__file"]: r for r in df.groupBy("__file").agg(*aggs).collect()}

    per_col: dict[str, dict[str, list]] = {c: {} for c in columns}
    for f in scan_files:
        key = _norm(f["file_path"])
        r = got.get(key)
        for c in columns:
            if key not in targets[c]:
                continue
            if r is None:  # zero-row file: no group emitted
                per_col[c][key] = [None, 0]
                continue
            v = r[f"s {c}"]
            n = int(r[f"n {c}"])
            if v is None:
                per_col[c][key] = [None, n]
            else:
                unscaled = int(
                    v.scaleb(scales[c]).to_integral_value(
                        rounding=decimal.ROUND_HALF_EVEN
                    )
                )
                per_col[c][key] = [str(unscaled), n]

    seq = writer._last_sequence_number
    blobs = []
    for c in columns:
        if not per_col[c]:
            continue
        payload = {"scale": scales[c], "files": per_col[c]}
        blobs.append(
            {
                "type": SUM_BLOB_TYPE,
                "fields": [writer.ids[c]],
                "snapshot-id": snapshot_id,
                "sequence-number": seq,
                "properties": {"column": c, "encoding": "json"},
                "data": json.dumps(payload, sort_keys=True).encode(),
            }
        )
    if not blobs:
        return None
    name = (
        f"colsums-{snapshot_id}-"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'colsum{snapshot_id}{sorted(scan_paths)}{sorted(columns)}').hex[:8]}"
        ".puffin"
    )
    path = f"{writer.path}/metadata/{name}"
    metas = write_puffin(path, blobs)
    size = os.path.getsize(path)
    entry = {
        "snapshot-id": snapshot_id,
        "statistics-path": path,
        "file-size-in-bytes": size,
        "file-footer-size-in-bytes": size - 4 - sum(m["length"] for m in metas),
        "blob-metadata": metas,
    }
    from daskberg_spark.iceberg.statsblobs import STATS_COMMIT_LOCK

    with STATS_COMMIT_LOCK:
        keep = writer.statistics
        if file_subset is None:
            # full rebuild replaces the snapshot's colsum entry
            # (raw-file blobs on OTHER snapshots stay valid and live)
            keep = [
                e
                for e in keep
                if not (
                    e["snapshot-id"] == snapshot_id
                    and any(
                        b.get("type") == SUM_BLOB_TYPE
                        for b in e.get("blob-metadata", [])
                    )
                )
            ]
        writer.statistics = keep + [entry]
        writer.version += 1
        writer._write_metadata()
    return path


def column_filesums(table, name: str) -> dict[str, tuple[int | None, int]] | None:
    """Merged per-file sums for a column across EVERY statistics entry
    (raw-file blobs are snapshot-independent; later entries win per
    file): ``{normalized_path: (unscaled_sum | None, nonnull)}``, or
    None when no blob covers the column at all.  Unreadable blobs are
    skipped — a missing map entry only ever means "scan that file"."""
    from daskberg_spark.iceberg.puffin import read_blob

    fid = table.fields[name].field_id
    merged: dict[str, tuple[int | None, int]] = {}
    found = False
    for e in table.metadata.get("statistics", []):
        for b in e.get("blob-metadata", []):
            if b.get("type") != SUM_BLOB_TYPE or b.get("fields") != [fid]:
                continue
            try:
                payload = json.loads(
                    read_blob(table._relocate(e["statistics-path"]), b)
                )
            except (ValueError, OSError):
                continue
            found = True
            for p, (s, n) in (payload.get("files") or {}).items():
                merged[p] = (None if s is None else int(s), int(n))
    return merged if found else None


# a refresh appends one colsum entry per run; past this many the next
# refresh rewrites ONE consolidated entry restricted to live files —
# bounding the statistics list and the per-probe blob scan at O(live
# files) instead of O(all refreshes ever) (r12, mirroring the quantile
# partials' consolidation)
SUM_BLOB_CONSOLIDATE_AFTER = 8


def consolidate_sum_statistics(writer, t, cols: list[str]) -> bool:
    """Rewrite the accumulated colsum entries as ONE entry covering
    only LIVE files (``column_filesums`` applies later-entry-wins
    before the rewrite).  Returns True when a rewrite happened; the
    caller (or the next metadata commit) persists it."""
    from daskberg_spark.iceberg.statsblobs import consolidate_entries

    def build(snapshot_id: int, seq: int) -> list[dict]:
        live = {_norm(f["file_path"]) for f in t.plan_files(None)}
        types = dict(writer.types)
        blobs = []
        for c in cols:
            m = column_filesums(t, c) or {}
            files = {
                p: [None if s is None else str(s), n]
                for p, (s, n) in m.items()
                if p in live
            }
            payload = {"scale": type_scale(types[c]), "files": files}
            blobs.append(
                {
                    "type": SUM_BLOB_TYPE,
                    "fields": [writer.ids[c]],
                    "snapshot-id": snapshot_id,
                    "sequence-number": seq,
                    "properties": {"column": c, "encoding": "json"},
                    "data": json.dumps(payload, sort_keys=True).encode(),
                }
            )
        return blobs

    return consolidate_entries(
        writer,
        (SUM_BLOB_TYPE,),
        build,
        "colsums",
        salt=str(sorted(cols)),
        threshold=SUM_BLOB_CONSOLIDATE_AFTER,
    )


def refresh_sum_statistics(writer, spark, scan_source=None) -> str | None:
    """Incremental catch-up: index only the LIVE planned files not yet
    covered by any colsum blob, per already-indexed column.  A no-op
    (None) on tables that never ran ``write_sum_statistics`` — the
    ``maintain()`` opt-in shape shared with the Bloom index.  Past
    ``SUM_BLOB_CONSOLIDATE_AFTER`` accumulated entries the refresh
    first rewrites one consolidated live-files entry."""
    from daskberg_spark.iceberg.metadata import IcebergTable

    cols = sorted(
        {
            (b.get("properties") or {}).get("column")
            for e in writer.statistics
            for b in e.get("blob-metadata", [])
            if b.get("type") == SUM_BLOB_TYPE
        }
        - {None}
    )
    # a column dropped or retyped since the last run stops refreshing
    cols = [c for c in cols if is_summable(writer.types.get(c, ""))]
    if not cols:
        return None
    t = IcebergTable(writer.path)
    consolidate_sum_statistics(writer, t, cols)
    live = {_norm(f["file_path"]) for f in t.plan_files(None)}
    subset: dict[str, set] = {}
    for c in cols:
        covered = set(column_filesums(t, c) or {})
        missing = live - covered
        if missing:
            subset[c] = missing
    if not subset:
        return None
    return write_sum_statistics(
        writer, spark, sorted(subset), file_subset=subset,
        scan_source=scan_source,
    )


def plan_sum_refresh_scan(writer, t):
    """Metadata-only scan plan for the NEXT ``refresh_sum_statistics``:
    ``(raw_norm_paths, raw_columns, dirty_columns)`` — the colsum half
    of ``maintain()``'s one-scan statistics pass (r14,
    ``onepass.plan_shared_stats_scan``).  Sum blobs describe RAW file
    contents, so the dirty set is always empty.  Advisory only."""
    cols = sorted(
        {
            (b.get("properties") or {}).get("column")
            for e in writer.statistics
            for b in e.get("blob-metadata", [])
            if b.get("type") == SUM_BLOB_TYPE
        }
        - {None}
    )
    cols = [c for c in cols if is_summable(writer.types.get(c, ""))]
    if not cols:
        return set(), set(), set()
    live = {_norm(f["file_path"]) for f in t.plan_files(None)}
    paths: set[str] = set()
    need: set[str] = set()
    for c in cols:
        missing = live - set(column_filesums(t, c) or {})
        if missing:
            paths |= missing
            need.add(c)
    # the builder scans every requested column over the union subset,
    # so the plan carries ALL indexed columns once anything is missing
    return paths, (set(cols) if need else set()), set()
