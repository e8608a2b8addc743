"""Equi-depth quantile histograms as engine-extension table statistics
— the range-selectivity half of the cost model.

Theta NDV blobs (``theta.py``) answer "how selective is ``col == v``";
they say nothing about ``col >= v``.  The textbook fallback — 1/3 per
range predicate (System R) — is off by orders of magnitude on skewed
or time-ordered data: ``ts >= now() - 1 day`` on a year of logs is
~0.3% selective, not 33%.  This module stores, per numeric/temporal
column, the ``B+1`` equi-depth bucket boundaries of the CURRENT
snapshot (one distributed ``percentile_approx`` aggregate — Spark's
mergeable Greenwald-Khanna sketch, bounded executor state, exact below
the accuracy parameter) as a ``daskberg-quantiles-v1`` Puffin blob in
the spec ``statistics`` list, and ``range_selectivity`` interpolates a
CDF from them at plan time.  ``cbo.estimated_rows`` consults the
histogram before falling back to 1/3, so star-join ordering reacts to
WHERE-clause ranges the way it already reacts to equality NDVs.

Engine extension: foreign readers skip unknown Puffin blob types per
the spec, exactly like the bloom-index blobs.  Estimates only — plan
choice, never results; every consumer re-applies exact predicates.

Exact equi-depth boundaries are not mergeable (they need the raw
ranks), but a PER-FILE compressed CDF is (r12): each data file's
``K+1`` equi-depth knots with its row/non-null census define a
piecewise-linear rank function whose sum across files approximates the
global CDF within ``Σ n_f/K = N/K`` ranks — the same error class as
the one-pass GK sketch at ε = 1/K.  ``write_file_quantile_partials``
stores those per-file CDFs as raw-file-content
``daskberg-quantiles-files-v1`` blobs (snapshot-independent, like the
sum blobs), and ``refresh_quantile_statistics`` advances the global
histogram by reading ONLY files no partial covers plus files with
possibly-applicable deletes (one delete-aware restricted scan), then
merging driver-side — refresh cost O(new + dirty files), not
O(table).  Merged blobs carry ``"merged": true``: estimates-grade
(CBO, range selectivity) and the documented-approximate
``percentile_pushdown`` both serve them; only the write-time
exact-mode knot guarantee is specific to the one-pass
``write_quantile_statistics``.
"""

from __future__ import annotations

import datetime
import json
import os
import uuid
from typing import Any

QUANTILE_BLOB_TYPE = "daskberg-quantiles-v1"
GROUPED_QUANTILE_BLOB_TYPE = "daskberg-quantiles-grouped-v1"
FILE_QUANTILE_BLOB_TYPE = "daskberg-quantiles-files-v1"
# per-(file × group) CDF partials (r13): the mergeable substrate that
# makes the GROUPED refresh O(new + dirty files) for ANY grouping —
# identity partitioning stops being a requirement because the partials
# carry the group key explicitly instead of inferring it from the
# file's partition tuple.  RAW file content, snapshot-independent,
# later-entries-win per file, exactly like the global partials.
GROUPED_FILE_QUANTILE_BLOB_TYPE = "daskberg-quantiles-files-grouped-v1"
DEFAULT_BUCKETS = 64
# grouped blobs refuse above this many groups: a blob is metadata, not
# a second copy of the table (per group ≈ (buckets+1) doubles/column)
MAX_BLOB_GROUPS = 10_000
# GK accuracy: exact histograms below this many non-null values — keeps
# small-table tests deterministic while bounding executor state
DEFAULT_ACCURACY = 10000

# column types a histogram covers, with their numeric encodings
_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_DT = datetime.datetime(1970, 1, 1)
_NUMERIC_TYPES = {
    "int",
    "long",
    "float",
    "double",
    "date",
    "timestamp",
    "timestamptz",
    "timestampz",
}


def _numeric_expr(name: str, ice_type: str):
    """The column as a DOUBLE rank domain: dates → epoch days,
    timestamps → epoch micros (matching ``value_to_number``)."""
    from pyspark.sql import functions as F

    c = F.col(name)
    if ice_type == "date":
        return F.unix_date(c).cast("double")
    if ice_type in ("timestamp", "timestamptz", "timestampz"):
        return F.unix_micros(c.cast("timestamp")).cast("double")
    return c.cast("double")


def value_to_number(value: Any, ice_type: str) -> float | None:
    """A normalized predicate value on the histogram's rank domain, or
    None when it can't be placed (→ caller falls back to 1/3)."""
    from daskberg_spark.iceberg.planner import normalize_value

    v = normalize_value(value, ice_type)
    if v is None:
        return None
    if isinstance(v, bool):
        return None
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return (v - _EPOCH_DT).total_seconds() * 1e6
    if isinstance(v, datetime.date):
        return float((v - _EPOCH_DATE).days)
    if isinstance(v, (int, float)):
        return float(v)
    try:
        return float(v)  # Decimal and numeric strings
    except (TypeError, ValueError):
        return None


def write_quantile_statistics(
    writer,
    spark,
    columns: list[str] | None = None,
    buckets: int = DEFAULT_BUCKETS,
    accuracy: int = DEFAULT_ACCURACY,
) -> str | None:
    """ONE distributed aggregate over the delete-aware read computes
    every column's ``buckets+1`` boundaries plus row/non-null censuses;
    the driver packs one JSON blob per column into a Puffin statistics
    file on the current snapshot.  Re-running for a snapshot replaces
    its quantile entry (other statistics coexist).  Returns the file
    path, or None when no column qualifies."""
    import daskberg_spark.iceberg.scan  # noqa: F401  (attaches .to_df)
    from pyspark.sql import functions as F

    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.puffin import write_puffin

    if not writer.snapshots:
        raise ValueError("table has no snapshots")
    types = dict(writer.types)
    if columns is None:
        columns = [c for c, t in types.items() if t in _NUMERIC_TYPES]
    else:
        for c in columns:
            if c not in types:
                raise ValueError(f"unknown column {c!r}")
            if types[c] not in _NUMERIC_TYPES:
                raise ValueError(
                    f"column {c!r} has type {types[c]!r} — histograms "
                    "cover numeric/temporal columns only"
                )
    if not columns:
        return None
    snapshot_id = writer.head_snapshot["snapshot-id"]
    t = IcebergTable(writer.path)
    df = t.to_df(spark, columns=list(columns))
    probs = [i / buckets for i in range(buckets + 1)]
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in columns:
        e = _numeric_expr(c, types[c])
        aggs.append(
            F.percentile_approx(
                e, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
            ).alias(f"q_{c}")
        )
        aggs.append(F.count(e).alias(f"n_{c}"))
    row = df.agg(*aggs).collect()[0]
    rows = int(row["__rows"])
    seq = writer._last_sequence_number
    blobs = []
    for c in columns:
        bounds = row[f"q_{c}"]
        payload = {
            "buckets": buckets,
            "rows": rows,
            "nonnull": int(row[f"n_{c}"]),
            "bounds": [float(b) for b in bounds] if bounds else [],
        }
        blobs.append(
            {
                "type": QUANTILE_BLOB_TYPE,
                "fields": [writer.ids[c]],
                "snapshot-id": snapshot_id,
                "sequence-number": seq,
                "properties": {"column": c, "encoding": "json"},
                "data": json.dumps(payload, sort_keys=True).encode(),
            }
        )
    name = (
        f"quantiles-{snapshot_id}-"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'quant{snapshot_id}{sorted(columns)}').hex[:8]}"
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
        writer.statistics = [
            e
            for e in writer.statistics
            if not (
                e["snapshot-id"] == snapshot_id
                and any(
                    b.get("type") == QUANTILE_BLOB_TYPE
                    for b in e.get("blob-metadata", [])
                )
            )
        ] + [entry]
        writer.version += 1
        writer._write_metadata()
    return path


def _norm(p: str) -> str:
    from daskberg_spark.iceberg.scan import _norm_scan_path

    return _norm_scan_path(p)


def _dirty_split(table) -> tuple[list[dict], set[str]]:
    """(live planned files, RELOCATED paths of files a delete might
    apply to) — the same over-approximate metadata-level classifier
    ``agg_pushdown`` uses: eq deletes hit strictly-older files in
    scope, path-free position deletes hit ≤-sequence files in scope,
    DV/position references name their file.  "Might apply" → dirty;
    a dirty file's stored raw-content CDF describes rows that may no
    longer be live, so the refresh re-reads it delete-aware."""
    from daskberg_spark.iceberg.scan import _norm_scan_path, _scope_tuple

    files = table.plan_files(None)
    deletes = table.plan_deletes()
    use_seq = table.metadata.get("format-version", 1) >= 2

    def okey(rec):
        if use_seq:
            seq = rec.get("_sequence_number")
            return 0 if seq is None else seq
        return rec.get("_snapshot_id") or 0

    eq_scopes, pos_scopes, refs = [], [], set()
    for d in deletes:
        if d.get("content") == 2:
            eq_scopes.append((okey(d), _scope_tuple(table, d)))
        elif d.get("content") == 1:
            ref = d.get("referenced_data_file")
            if ref:
                refs.add(_norm_scan_path(ref))
            else:
                pos_scopes.append((okey(d), _scope_tuple(table, d)))
    dirty: set[str] = set()
    for f in files:
        fkey, fscope = okey(f), _scope_tuple(table, f)
        if (
            _norm_scan_path(f["file_path"]) in refs
            or any(
                fkey < dk and (ds is None or ds == fscope)
                for dk, ds in eq_scopes
            )
            or any(
                fkey <= dk and (ds is None or ds == fscope)
                for dk, ds in pos_scopes
            )
        ):
            dirty.add(f["file_path"])
    return files, dirty


def column_filecdfs(table, name: str) -> dict[str, list] | None:
    """Merged per-file CDF partials for a column across every
    statistics entry (raw-file blobs are snapshot-independent; later
    entries win per file): ``{normalized_path: [rows, nonnull,
    bounds]}``, or None when no blob covers the column.  Unreadable
    blobs are skipped — a missing entry only ever means "re-read that
    file"."""
    from daskberg_spark.iceberg.puffin import read_blob

    fid = table.fields[name].field_id
    merged: dict[str, list] = {}
    found = False
    for e in table.metadata.get("statistics", []):
        for b in e.get("blob-metadata", []):
            if b.get("type") != FILE_QUANTILE_BLOB_TYPE or b.get(
                "fields"
            ) != [fid]:
                continue
            try:
                payload = json.loads(
                    read_blob(table._relocate(e["statistics-path"]), b)
                )
            except (ValueError, OSError):
                continue
            found = True
            for p, part in (payload.get("files") or {}).items():
                merged[p] = part
    return merged if found else None


def write_file_quantile_partials(
    writer,
    spark,
    columns: list[str],
    file_subset=None,
    buckets: int = DEFAULT_BUCKETS,
    accuracy: int = DEFAULT_ACCURACY,
    scan_source=None,
) -> str | None:
    """Per-(file, column) compressed CDFs in ONE distributed pass —
    the mergeable substrate of the quantile family (r12).  Reads RAW
    file contents (no delete application — the blob describes the
    immutable file, so it stays valid at every snapshot) grouped by
    ``__file``; per file only ``buckets+1`` doubles and two counts
    reach the driver.  ``file_subset`` (normalized paths) restricts
    the pass — the incremental refresh — and the entry APPENDS (later
    entries win per file); without it the snapshot's partials entry is
    replaced.  Returns the Puffin path or None when nothing scans."""
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
    for c in columns:
        if c not in types:
            raise ValueError(f"unknown column {c!r}")
        if types[c] not in _NUMERIC_TYPES:
            raise ValueError(
                f"column {c!r} has type {types[c]!r} — histograms "
                "cover numeric/temporal columns only"
            )
    if not columns:
        return None
    snapshot_id = writer.head_snapshot["snapshot-id"]
    t = IcebergTable(writer.path)
    live = t.plan_files(None)
    if file_subset is None:
        target = {_norm(f["file_path"]) for f in live}
    else:
        target = {_norm(p) for p in file_subset}
    scan_files = [f for f in live if _norm(f["file_path"]) in target]
    if not scan_files:
        return None
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
    probs = [i / buckets for i in range(buckets + 1)]
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in columns:
        e = _numeric_expr(c, types[c])
        aggs.append(
            F.percentile_approx(
                e, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
            ).alias(f"q {c}")
        )
        aggs.append(F.count(e).alias(f"n {c}"))
    got = {r["__file"]: r for r in df.groupBy("__file").agg(*aggs).collect()}

    per_col: dict[str, dict[str, list]] = {c: {} for c in columns}
    for f in scan_files:
        key = _norm(f["file_path"])
        r = got.get(key)
        for c in columns:
            if r is None:  # zero-row file: no group emitted
                per_col[c][key] = [0, 0, []]
                continue
            bounds = r[f"q {c}"]
            per_col[c][key] = [
                int(r["__rows"]),
                int(r[f"n {c}"]),
                [float(b) for b in bounds] if bounds else [],
            ]
    seq = writer._last_sequence_number
    blobs = []
    for c in columns:
        payload = {"buckets": buckets, "files": per_col[c]}
        blobs.append(
            {
                "type": FILE_QUANTILE_BLOB_TYPE,
                "fields": [writer.ids[c]],
                "snapshot-id": snapshot_id,
                "sequence-number": seq,
                "properties": {"column": c, "encoding": "json"},
                "data": json.dumps(payload, sort_keys=True).encode(),
            }
        )
    name = (
        f"quantiles-files-{snapshot_id}-"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'fquant{snapshot_id}{sorted(target)}{sorted(columns)}').hex[:8]}"
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
            keep = [
                e
                for e in keep
                if not (
                    e["snapshot-id"] == snapshot_id
                    and any(
                        b.get("type") == FILE_QUANTILE_BLOB_TYPE
                        for b in e.get("blob-metadata", [])
                    )
                )
            ]
        writer.statistics = keep + [entry]
        writer.version += 1
        writer._write_metadata()
    return path


# a refresh appends one partials entry per run; past this many the
# refresh rewrites ONE consolidated entry restricted to live files —
# bounding both the statistics list and the per-read blob scan at
# O(live files) instead of O(all refreshes ever)
FILE_BLOB_CONSOLIDATE_AFTER = 8


def _consolidate_file_partials(writer, t, columns: list[str]) -> bool:
    """Rewrite the accumulated ``daskberg-quantiles-files-v1`` entries
    as ONE entry covering only LIVE files (later-entry-wins semantics
    preserved by ``column_filecdfs`` doing the merge first).  The
    rewrite covers EVERY column any existing entry indexes — not just
    the caller's — so a grouped refresh consolidating a column subset
    never silently drops another column's coverage.  Returns True when
    a rewrite happened; the caller's final metadata write persists
    it."""
    from daskberg_spark.iceberg.statsblobs import consolidate_entries

    covered = sorted(
        {
            (b.get("properties") or {}).get("column")
            for e in writer.statistics
            for b in e.get("blob-metadata", [])
            if b.get("type") == FILE_QUANTILE_BLOB_TYPE
        }
        - {None}
    )
    cols = [
        c
        for c in sorted(set(columns) | set(covered))
        if c in writer.ids
    ]

    def build(snapshot_id: int, seq: int) -> list[dict]:
        live = {_norm(f["file_path"]) for f in t.plan_files(None)}
        blobs = []
        for c in cols:
            m = column_filecdfs(t, c) or {}
            payload = {
                "buckets": DEFAULT_BUCKETS,
                "files": {p: part for p, part in m.items() if p in live},
            }
            blobs.append(
                {
                    "type": FILE_QUANTILE_BLOB_TYPE,
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
        (FILE_QUANTILE_BLOB_TYPE,),
        build,
        "quantiles-files",
        salt=str(cols),
        threshold=FILE_BLOB_CONSOLIDATE_AFTER,
        commit=False,
    )


def write_file_grouped_quantile_partials(
    writer,
    spark,
    group_cols: list[str],
    columns: list[str],
    file_subset=None,
    buckets: int = DEFAULT_BUCKETS,
    accuracy: int = DEFAULT_ACCURACY,
    max_groups: int = MAX_BLOB_GROUPS,
    scan_source=None,
) -> str | None:
    """Per-(file, group, column) compressed CDFs in ONE distributed
    pass (r13) — the grouped twin of ``write_file_quantile_partials``.
    Reads RAW file contents (no delete application — the blob
    describes the immutable file, valid at every snapshot) grouped by
    (``__file``, group tuple); per (file, group) only ``buckets+1``
    doubles and two counts reach the driver.  ``file_subset``
    restricts the pass — the incremental refresh — and the entry
    APPENDS (later entries win per file); without it the snapshot's
    entry is replaced.  Returns the Puffin path or None when nothing
    scans."""
    import daskberg_spark.iceberg.scan  # noqa: F401  (attaches .to_df)
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from daskberg_spark.iceberg.conversions import schema_to_struct
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.puffin import write_puffin
    from daskberg_spark.iceberg.scan import _read_file_groups
    from daskberg_spark.iceberg.statsblobs import stats_entry

    if not writer.snapshots:
        raise ValueError("table has no snapshots")
    types = dict(writer.types)
    from daskberg_spark.iceberg.groupkeys import (
        apply_group_keys,
        gate_group_key,
        group_key_base,
        group_key_type,
    )

    for g in group_cols:
        gate_group_key(g, types, _GROUP_KEY_TYPES, "grouped histograms key")
    for c in columns:
        if types.get(c) not in _NUMERIC_TYPES:
            raise ValueError(
                f"column {c!r} has type {types.get(c)!r} — histograms "
                "cover numeric/temporal columns only"
            )
    if not columns:
        return None
    snapshot_id = writer.head_snapshot["snapshot-id"]
    t = IcebergTable(writer.path)
    live = t.plan_files(None)
    if file_subset is None:
        target = {_norm(f["file_path"]) for f in live}
    else:
        target = {_norm(p) for p in file_subset}
    scan_files = [f for f in live if _norm(f["file_path"]) in target]
    if not scan_files:
        return None
    wanted = {group_key_base(g, types) for g in group_cols} | set(columns)
    # one-scan maintenance (r14): serve from the shared cached frame
    # when a SharedStatsScan covers this subset; else direct read
    df = (
        scan_source.raw_frame(scan_files, wanted)
        if scan_source is not None
        else None
    )
    if df is None:
        scan_struct = T.StructType(
            [
                f
                for f in schema_to_struct(t.schema).fields
                if f.name in wanted
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
    df = apply_group_keys(df, group_cols, types)
    probs = [i / buckets for i in range(buckets + 1)]
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in columns:
        e = _numeric_expr(c, types[c])
        aggs.append(
            F.percentile_approx(
                e, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
            ).alias(f"q {c}")
        )
        aggs.append(F.count(e).alias(f"n {c}"))
    got = (
        df.groupBy("__file", *group_cols)
        .agg(*aggs)
        .limit(max_groups * len(scan_files) + 1)
        .collect()
    )
    if len({tuple(r[g] for g in group_cols) for r in got}) > max_groups:
        raise ValueError(
            f"more than {max_groups} distinct {group_cols} tuples — a "
            "grouped partials blob must stay metadata-sized"
        )
    per_col: dict[str, dict[str, dict[str, list]]] = {c: {} for c in columns}
    for f in scan_files:  # zero-row files record empty coverage too
        p = _norm(f["file_path"])
        for c in columns:
            per_col[c][p] = {}
    for r in got:
        gkey = json.dumps(
            [
                _encode_group_value(r[g], group_key_type(g, types))
                for g in group_cols
            ]
        )
        for c in columns:
            bounds = r[f"q {c}"]
            per_col[c][r["__file"]][gkey] = [
                int(r["__rows"]),
                int(r[f"n {c}"]),
                [float(b) for b in bounds] if bounds else [],
            ]
    seq = writer._last_sequence_number
    blobs = []
    for c in columns:
        payload = {
            "group_cols": list(group_cols),
            "buckets": buckets,
            "files": per_col[c],
        }
        blobs.append(
            {
                "type": GROUPED_FILE_QUANTILE_BLOB_TYPE,
                "fields": [writer.ids[c]],
                "snapshot-id": snapshot_id,
                "sequence-number": seq,
                "properties": {"column": c, "encoding": "json"},
                "data": json.dumps(payload, sort_keys=True).encode(),
            }
        )
    name = (
        f"quantiles-files-grouped-{snapshot_id}-"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'fgquant{snapshot_id}{sorted(target)}{sorted(columns)}{group_cols}').hex[:8]}"
        ".puffin"
    )
    path = f"{writer.path}/metadata/{name}"
    metas = write_puffin(path, blobs)
    from daskberg_spark.iceberg.statsblobs import STATS_COMMIT_LOCK

    with STATS_COMMIT_LOCK:
        keep = writer.statistics
        if file_subset is None:
            keep = [
                e
                for e in keep
                if not (
                    e["snapshot-id"] == snapshot_id
                    and any(
                        b.get("type") == GROUPED_FILE_QUANTILE_BLOB_TYPE
                        for b in e.get("blob-metadata", [])
                    )
                )
            ]
        writer.statistics = keep + [stats_entry(path, metas, snapshot_id)]
        writer.version += 1
        writer._write_metadata()
    return path


def grouped_column_filecdfs(
    table, name: str, group_cols: list[str]
) -> dict[str, dict[str, list]] | None:
    """Merged per-(file × group) CDF partials for a column across
    every statistics entry (later entries win per file):
    ``{normalized_path: {json_group_key: [rows, nonnull, bounds]}}``,
    or None when no blob covers the column with EXACTLY these group
    columns.  Unreadable blobs are skipped — a missing entry only
    ever means "re-scan that file"."""
    from daskberg_spark.iceberg.puffin import read_blob

    fid = table.fields[name].field_id
    merged: dict[str, dict[str, list]] = {}
    found = False
    for e in table.metadata.get("statistics", []):
        for b in e.get("blob-metadata", []):
            if b.get("type") != GROUPED_FILE_QUANTILE_BLOB_TYPE or b.get(
                "fields"
            ) != [fid]:
                continue
            try:
                payload = json.loads(
                    read_blob(table._relocate(e["statistics-path"]), b)
                )
            except (ValueError, OSError):
                continue
            if payload.get("group_cols") != list(group_cols):
                continue
            found = True
            for p, groups in (payload.get("files") or {}).items():
                merged[p] = groups
    return merged if found else None


def _consolidate_file_grouped_partials(writer, t, group_cols, columns) -> bool:
    """Repack accumulated per-(file × group) partials entries into ONE
    live-files-only entry covering EVERY (grouping, column) pair any
    existing entry indexes — not just the caller's — so a superseded
    grouping's coverage never silently drops (shared consolidation
    pass; the caller's final metadata write persists it)."""
    from daskberg_spark.iceberg.puffin import read_blob
    from daskberg_spark.iceberg.statsblobs import consolidate_entries

    fid_to_name = {i.field_id: n for n, i in t.fields.items()}
    pairs: list[tuple[tuple, str]] = []
    for e in writer.statistics:
        for b in e.get("blob-metadata", []):
            if b.get("type") != GROUPED_FILE_QUANTILE_BLOB_TYPE:
                continue
            col = fid_to_name.get((b.get("fields") or [None])[0])
            if col is None:
                continue
            try:
                payload = json.loads(
                    read_blob(t._relocate(e["statistics-path"]), b)
                )
            except (ValueError, OSError):
                continue
            gc = payload.get("group_cols")
            if gc is None:
                continue
            key = (tuple(gc), col)
            if key not in pairs:
                pairs.append(key)

    def build(snapshot_id: int, seq: int) -> list[dict]:
        live = {_norm(f["file_path"]) for f in t.plan_files(None)}
        blobs = []
        for gc, c in pairs:
            if c not in writer.ids:
                continue
            m = grouped_column_filecdfs(t, c, list(gc)) or {}
            payload = {
                "group_cols": list(gc),
                "buckets": DEFAULT_BUCKETS,
                "files": {p: g for p, g in m.items() if p in live},
            }
            blobs.append(
                {
                    "type": GROUPED_FILE_QUANTILE_BLOB_TYPE,
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
        (GROUPED_FILE_QUANTILE_BLOB_TYPE,),
        build,
        "quantiles-files-grouped",
        salt=str(sorted(columns)) + str(group_cols),
        threshold=FILE_BLOB_CONSOLIDATE_AFTER,
        commit=False,
    )


def merge_cdf_parts(
    parts: list[tuple[int, int, list[float]]], buckets: int
) -> tuple[int, int, list[float]]:
    """Combine per-part compressed CDFs into global ``buckets+1``
    equi-depth boundaries — EXACT over the piecewise-linear model, so
    total rank error ≤ Σ nonnull_p / K_p (up to 2× that under heavy
    duplicate values, where the per-part knot placement itself
    quantizes by a bucket — the property test pins the 2× envelope).

    Each part ``(rows, nonnull, bounds)`` contributes a
    piecewise-linear rank function (equi-depth knots: ``bounds[i]`` has
    rank ``i/K · nonnull``); duplicate/single knots contribute point
    masses.  A slope-event sweep accumulates the merged rank at every
    union knot in O(E log E), and the targets invert by linear
    interpolation (point masses clamp to their knot)."""
    rows = sum(int(p[0]) for p in parts)
    nn = sum(int(p[1]) for p in parts)
    if nn <= 0:
        return rows, 0, []
    slope_ev: dict[float, float] = {}
    jumps: dict[float, float] = {}
    for _r, nnp, b in parts:
        if not nnp or not b:
            continue
        if len(b) == 1:
            jumps[b[0]] = jumps.get(b[0], 0.0) + nnp
            continue
        k = len(b) - 1
        w = nnp / k
        for i in range(k):
            lo, hi = b[i], b[i + 1]
            if hi > lo:
                s = w / (hi - lo)
                slope_ev[lo] = slope_ev.get(lo, 0.0) + s
                slope_ev[hi] = slope_ev.get(hi, 0.0) - s
            else:
                jumps[lo] = jumps.get(lo, 0.0) + w
    knots = sorted(set(slope_ev) | set(jumps))
    if not knots:
        # nonnull > 0 but every part carries empty bounds — possible
        # only with a malformed/foreign-written partials blob; degrade
        # to "no boundaries" (callers treat it as unanswerable) instead
        # of crashing the refresh
        return rows, nn, []
    rb, ra = [], []  # merged rank just before / after each knot's mass
    acc = slope = 0.0
    prev = None
    for v in knots:
        if prev is not None:
            acc += slope * (v - prev)
        rb.append(acc)
        acc += jumps.get(v, 0.0)
        ra.append(acc)
        slope += slope_ev.get(v, 0.0)
        prev = v
    total = ra[-1]  # ≈ nn up to float rounding
    bounds: list[float] = []
    i = 0
    for j in range(buckets + 1):
        r = j / buckets * total
        while i < len(knots) - 1 and rb[i + 1] < r:
            i += 1
        if r <= ra[i] or i == len(knots) - 1:
            bounds.append(knots[i])
            continue
        lo_r, hi_r = ra[i], rb[i + 1]
        frac = (r - lo_r) / (hi_r - lo_r) if hi_r > lo_r else 1.0
        frac = min(max(frac, 0.0), 1.0)
        bounds.append(knots[i] + frac * (knots[i + 1] - knots[i]))
    return rows, nn, bounds


def refresh_quantile_statistics(
    writer,
    spark,
    columns: list[str] | None = None,
    buckets: int = DEFAULT_BUCKETS,
    accuracy: int = DEFAULT_ACCURACY,
    scan_source=None,
) -> dict[str, Any] | None:
    """Advance the global quantile histograms to the current snapshot
    at O(new + dirty files) cost (r12): per-file partials already on
    record are REUSED for clean files; only clean files no partial
    covers take the raw grouped pass, and files with
    possibly-applicable deletes take one delete-aware restricted scan
    (their raw-content partials can't be trusted).  The merged
    boundaries land as the snapshot's ``daskberg-quantiles-v1`` entry
    with ``"merged": true``, so every consumer (CBO range selectivity,
    ``percentile_pushdown``, ``analyze_table``) reads them unchanged.

    ``columns=None`` refreshes the columns existing partials cover —
    the ``maintain()`` opt-in shape shared with the sum blobs; None is
    returned for tables that never opted in.  Passing ``columns``
    bootstraps coverage (first call prices like the full one-pass
    build; every later call is incremental)."""
    import daskberg_spark.iceberg.scan  # noqa: F401  (attaches .to_df)
    from pyspark.sql import functions as F

    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.puffin import write_puffin
    from daskberg_spark.iceberg.scan import to_df

    if columns is None:
        columns = sorted(
            {
                (b.get("properties") or {}).get("column")
                for e in writer.statistics
                for b in e.get("blob-metadata", [])
                if b.get("type") == FILE_QUANTILE_BLOB_TYPE
            }
            - {None}
        )
        # a column dropped or retyped since the last run stops refreshing
        columns = [
            c for c in columns if writer.types.get(c) in _NUMERIC_TYPES
        ]
        if not columns:
            return None
    else:
        types = dict(writer.types)
        for c in columns:
            if types.get(c) not in _NUMERIC_TYPES:
                raise ValueError(
                    f"column {c!r} has type {types.get(c)!r} — histograms "
                    "cover numeric/temporal columns only"
                )
    snapshot_id = writer.head_snapshot["snapshot-id"]
    t = IcebergTable(writer.path)
    files, dirty = _dirty_split(t)
    clean_norm = {
        _norm(f["file_path"])
        for f in files
        if f["file_path"] not in dirty
    }
    maps = {c: (column_filecdfs(t, c) or {}) for c in columns}
    missing = set()
    for c in columns:
        missing |= clean_norm - set(maps[c])
    if missing:
        write_file_quantile_partials(
            writer,
            spark,
            columns,
            file_subset=missing,
            buckets=buckets,
            accuracy=accuracy,
            scan_source=scan_source,
        )
        t = IcebergTable(writer.path)
        maps = {c: (column_filecdfs(t, c) or {}) for c in columns}
    _consolidate_file_partials(writer, t, columns)
    parts = {
        c: [maps[c][p] for p in clean_norm if p in maps[c]]
        for c in columns
    }
    if dirty:
        probs = [i / buckets for i in range(buckets + 1)]
        ftypes = {n: i.type for n, i in t.fields.items()}
        df = (
            scan_source.dirty_frame(sorted(dirty), columns)
            if scan_source is not None
            else None
        )
        if df is None:
            df = to_df(
                t, spark, columns=list(columns), file_subset=sorted(dirty)
            )
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for c in columns:
            e = _numeric_expr(c, ftypes[c])
            aggs.append(
                F.percentile_approx(
                    e,
                    F.array(*[F.lit(p) for p in probs]),
                    F.lit(accuracy),
                ).alias(f"q {c}")
            )
            aggs.append(F.count(e).alias(f"n {c}"))
        r = df.agg(*aggs).collect()[0]
        for c in columns:
            bounds = r[f"q {c}"]
            parts[c].append(
                [
                    int(r["__rows"]),
                    int(r[f"n {c}"]),
                    [float(b) for b in bounds] if bounds else [],
                ]
            )
    blobs = []
    seq = writer._last_sequence_number
    for c in columns:
        rows, nonnull, bounds = merge_cdf_parts(parts[c], buckets)
        payload = {
            "buckets": buckets,
            "rows": rows,
            "nonnull": nonnull,
            "bounds": bounds,
            "merged": True,
        }
        blobs.append(
            {
                "type": QUANTILE_BLOB_TYPE,
                "fields": [writer.ids[c]],
                "snapshot-id": snapshot_id,
                "sequence-number": seq,
                "properties": {"column": c, "encoding": "json"},
                "data": json.dumps(payload, sort_keys=True).encode(),
            }
        )
    name = (
        f"quantiles-{snapshot_id}-"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'mquant{snapshot_id}{sorted(columns)}').hex[:8]}"
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
        writer.statistics = [
            e
            for e in writer.statistics
            if not (
                e["snapshot-id"] == snapshot_id
                and any(
                    b.get("type") == QUANTILE_BLOB_TYPE
                    for b in e.get("blob-metadata", [])
                )
            )
        ] + [entry]
        writer.version += 1
        writer._write_metadata()
    return {
        "path": path,
        "columns": list(columns),
        "files_total": len(files),
        "partials_computed": len(missing),
        "dirty_files": len(dirty),
    }


def grouped_quantile_covered_configs(writer, t) -> set[tuple]:
    """The groupings whose OWN statistics entry already covers the
    head snapshot (r15) — per-config head gate; see the theta twin."""
    head_id = writer.head_snapshot["snapshot-id"]
    covered: set[tuple] = set()
    for e in writer.statistics:
        if e["snapshot-id"] != head_id:
            continue
        gc = _entry_statistics_group_cols(t, e, GROUPED_QUANTILE_BLOB_TYPE)
        if isinstance(gc, list):
            covered.add(tuple(gc))
    return covered


def refresh_grouped_quantile_statistics(
    writer,
    spark,
    buckets: int = DEFAULT_BUCKETS,
    accuracy: int = DEFAULT_ACCURACY,
    scan_source=None,
    skip_head_covered: bool = False,
) -> dict[str, Any] | None:
    """Advance the GROUPED quantile blobs to the current snapshot at
    O(new + dirty files) cost for ANY grouping (r13; identity-only in
    r12).  Two incremental strategies, both reported in the result:

    - ``identity-partials``: when every group column is an identity
      partition source in every live file's spec (and none is a date —
      manifest partition encoding differs from the blob's ISO keys), a
      file belongs to exactly ONE group tuple, so the per-file CDF
      partials the GLOBAL refresh already maintains ARE per-group
      partials — zero extra storage, shared scan passes.
    - ``file-grouped-partials``: any other grouping (dates included)
      uses per-(file × group) CDF partials
      (``write_file_grouped_quantile_partials``) that carry the group
      key explicitly — the r12 full-re-run degrade is gone.

    Clean files stay metadata-only; new clean files take one raw
    grouped pass; delete-dirtied files take one delete-aware
    restricted scan grouped by the group columns.  Opt-in shape: the
    latest grouped blob defines (group_cols, value columns); None on
    tables that never wrote one.  Returns ``{"mode", "strategy",
    "files_total", "partials_computed", "dirty_files", "groups"}``."""
    from daskberg_spark.iceberg.metadata import IcebergTable

    t = IcebergTable(writer.path)
    # EVERY grouping any blob ever defined refreshes (multi-config,
    # r14, mirroring the grouped-NDV family): drop one deliberately
    # with ``drop_grouped_quantile_statistics``.
    configs = _grouped_quantile_configs(writer, t)
    # maintain() gates PER CONFIG (r15): a grouping whose own entry
    # already covers the head is skipped without starving the others
    covered = (
        grouped_quantile_covered_configs(writer, t)
        if skip_head_covered
        else set()
    )
    runnable: list[tuple[list, list]] = []
    for gc, cols in configs.items():
        if gc in covered:
            continue
        cols = [c for c in cols if writer.types.get(c) in _NUMERIC_TYPES]
        if gc and cols:
            runnable.append((list(gc), cols))
    if not runnable:
        return None
    reports = []
    for group_cols, columns in runnable:
        reports.append(
            _refresh_grouped_quantile_config(
                writer,
                spark,
                group_cols,
                columns,
                buckets,
                accuracy,
                scan_source,
            )
        )
    if len(reports) == 1:
        return reports[0]
    return {
        "configs": reports,
        "mode": "incremental",
        "strategy": "+".join(sorted({r["strategy"] for r in reports})),
        "files_total": reports[0]["files_total"],
        "partials_computed": sum(r["partials_computed"] for r in reports),
        "dirty_files": max(r["dirty_files"] for r in reports),
        "groups": max(r["groups"] for r in reports),
    }


def _grouped_quantile_configs(writer, t) -> dict[tuple, list]:
    """Every grouping any ``daskberg-quantiles-grouped-v1`` blob
    defines, with its value columns (later entries win per config) —
    the multi-config registry the refresh iterates (r14)."""
    from daskberg_spark.iceberg.puffin import read_blob

    fid_to_name = {i.field_id: n for n, i in t.fields.items()}
    configs: dict[tuple, list] = {}
    for e in writer.statistics:
        for b in e.get("blob-metadata", []):
            if b.get("type") != GROUPED_QUANTILE_BLOB_TYPE:
                continue
            col = fid_to_name.get((b.get("fields") or [None])[0])
            if col is None:
                continue
            try:
                payload = json.loads(
                    read_blob(t._relocate(e["statistics-path"]), b)
                )
            except (ValueError, OSError):
                continue
            gc = tuple(payload.get("group_cols") or ())
            cols = configs.setdefault(gc, [])
            if col not in cols:
                cols.append(col)
    return configs


def _entry_statistics_group_cols(t, e, blob_type):
    """The ``group_cols`` an entry's first matching blob carries;
    ``"__none__"`` when the entry has no such blob, None when
    unreadable (publish-time replacement then drops it)."""
    from daskberg_spark.iceberg.puffin import read_blob

    for b in e.get("blob-metadata", []):
        if b.get("type") != blob_type:
            continue
        try:
            payload = json.loads(
                read_blob(t._relocate(e["statistics-path"]), b)
            )
        except (ValueError, OSError):
            return None
        return payload.get("group_cols")
    return "__none__"


def _refresh_grouped_quantile_config(
    writer,
    spark,
    group_cols: list[str],
    columns: list[str],
    buckets: int,
    accuracy: int,
    scan_source,
) -> dict[str, Any]:
    """One grouping's incremental refresh — the r13 body, factored so
    the multi-config loop runs it per grouping."""
    import daskberg_spark.iceberg.scan  # noqa: F401  (attaches .to_df)
    from pyspark.sql import functions as F

    from daskberg_spark.iceberg.groupkeys import group_key_type
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.puffin import write_puffin
    from daskberg_spark.iceberg.scan import to_df

    t = IcebergTable(writer.path)
    types = dict(writer.types)
    snapshot_id = writer.head_snapshot["snapshot-id"]
    files, dirty = _dirty_split(t)

    def identity_part_names(f) -> list[str] | None:
        """Per-file spec field names for the group columns, or None
        when any group col isn't identity-partitioned in this spec."""
        sid = f.get("_spec_id", 0)
        by_source = {
            sf["source-id"]: sf
            for sf in t._spec_fields(sid)
            if sf.get("transform") == "identity"
        }
        names = []
        for g in group_cols:
            sf = by_source.get(t.fields[g].field_id)
            if sf is None:
                return None
            names.append(sf["name"])
        return names

    identity = all(
        writer.types.get(g) in ("int", "long", "string", "boolean")
        for g in group_cols
    )
    file_keys: dict[str, tuple] = {}
    if identity:
        for f in files:
            pnames = identity_part_names(f)
            if pnames is None:
                identity = False
                break
            part = f.get("partition") or {}
            file_keys[_norm(f["file_path"])] = tuple(
                part.get(n) for n in pnames
            )

    clean_norm = {
        _norm(f["file_path"])
        for f in files
        if f["file_path"] not in dirty
    }
    parts: dict[str, dict[tuple, list]] = {c: {} for c in columns}
    if identity:
        strategy = "identity-partials"
        maps = {c: (column_filecdfs(t, c) or {}) for c in columns}
        missing = set()
        for c in columns:
            missing |= clean_norm - set(maps[c])
        if missing:
            write_file_quantile_partials(
                writer,
                spark,
                columns,
                file_subset=missing,
                buckets=buckets,
                accuracy=accuracy,
                scan_source=scan_source,
            )
            t = IcebergTable(writer.path)
            maps = {c: (column_filecdfs(t, c) or {}) for c in columns}
        _consolidate_file_partials(writer, t, columns)
        # group the clean partials by each file's identity partition
        # tuple (its only group)
        for p in clean_norm:
            key = file_keys[p]
            for c in columns:
                if p in maps[c]:
                    parts[c].setdefault(key, []).append(maps[c][p])
    else:
        strategy = "file-grouped-partials"
        gmaps = {
            c: (grouped_column_filecdfs(t, c, group_cols) or {})
            for c in columns
        }
        missing = set()
        for c in columns:
            missing |= clean_norm - set(gmaps[c])
        if missing:
            write_file_grouped_quantile_partials(
                writer,
                spark,
                group_cols,
                columns,
                file_subset=missing,
                buckets=buckets,
                accuracy=accuracy,
                scan_source=scan_source,
            )
            t = IcebergTable(writer.path)
            gmaps = {
                c: (grouped_column_filecdfs(t, c, group_cols) or {})
                for c in columns
            }
        _consolidate_file_grouped_partials(writer, t, group_cols, columns)
        for p in clean_norm:
            for c in columns:
                for gkey, part in (gmaps[c].get(p) or {}).items():
                    parts[c].setdefault(tuple(json.loads(gkey)), []).append(
                        part
                    )
    if dirty:
        from daskberg_spark.iceberg.groupkeys import (
            apply_group_keys,
            group_key_base,
        )

        probs = [i / buckets for i in range(buckets + 1)]
        ftypes = {n: i.type for n, i in t.fields.items()}
        wtypes = dict(writer.types)
        dirty_cols = sorted(
            {group_key_base(g, wtypes) for g in group_cols} | set(columns)
        )
        df = (
            scan_source.dirty_frame(sorted(dirty), dirty_cols)
            if scan_source is not None
            else None
        )
        if df is None:
            df = to_df(
                t, spark, columns=dirty_cols, file_subset=sorted(dirty)
            )
        df = apply_group_keys(df, list(group_cols), wtypes)
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for c in columns:
            e2 = _numeric_expr(c, ftypes[c])
            aggs.append(
                F.percentile_approx(
                    e2,
                    F.array(*[F.lit(p) for p in probs]),
                    F.lit(accuracy),
                ).alias(f"q {c}")
            )
            aggs.append(F.count(e2).alias(f"n {c}"))
        # limit+check mirrors the build path (:1342) — bounded today
        # only transitively (deletes can't ADD groups; new files take
        # the guarded partials path), so guard here defensively: a
        # future refresh path classifying appends as "dirty" must
        # refuse rather than silently lift the blob's group bound
        dirty_rows = (
            df.groupBy(*group_cols)
            .agg(*aggs)
            .limit(MAX_BLOB_GROUPS + 1)
            .collect()
        )
        if len(dirty_rows) > MAX_BLOB_GROUPS:
            raise ValueError(
                f"more than {MAX_BLOB_GROUPS} distinct {group_cols} "
                "tuples in the dirty-file scan — a grouped quantile "
                "blob must stay metadata-sized"
            )
        for r in dirty_rows:
            # encode (dates → ISO) so dirty-scan keys collate with the
            # json-round-tripped partial keys; a no-op for the
            # identity strategy's int/long/string/boolean keys
            key = tuple(
                _encode_group_value(r[g], group_key_type(g, types))
                for g in group_cols
            )
            for c in columns:
                bounds = r[f"q {c}"]
                parts[c].setdefault(key, []).append(
                    [
                        int(r["__rows"]),
                        int(r[f"n {c}"]),
                        [float(b) for b in bounds] if bounds else [],
                    ]
                )
    blobs = []
    seq = writer._last_sequence_number
    n_groups = 0
    for c in columns:
        groups = []
        for key, plist in sorted(
            parts[c].items(),
            key=lambda kv: tuple((v is None, v) for v in kv[0]),
        ):
            rows, nonnull, bounds = merge_cdf_parts(plist, buckets)
            if rows == 0:
                continue
            groups.append(
                {
                    "key": [_encode_group_value(v) for v in key],
                    "rows": rows,
                    "nonnull": nonnull,
                    "bounds": bounds,
                }
            )
        n_groups = max(n_groups, len(groups))
        payload = {
            "group_cols": list(group_cols),
            "buckets": buckets,
            "groups": groups,
            "merged": True,
        }
        blobs.append(
            {
                "type": GROUPED_QUANTILE_BLOB_TYPE,
                "fields": [writer.ids[c]],
                "snapshot-id": snapshot_id,
                "sequence-number": seq,
                "properties": {"column": c, "encoding": "json"},
                "data": json.dumps(payload, sort_keys=True).encode(),
            }
        )
    name = (
        f"quantiles-grouped-{snapshot_id}-"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'mgquant{snapshot_id}{sorted(columns)}{group_cols}').hex[:8]}"
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
    # replacement is CONFIG-scoped (r14): a same-snapshot entry keyed
    # on a DIFFERENT grouping survives — multiple groupings coexist
    def _keep(e) -> bool:
        if e["snapshot-id"] != snapshot_id:
            return True
        gc = _entry_statistics_group_cols(t, e, GROUPED_QUANTILE_BLOB_TYPE)
        if gc == "__none__":
            return True
        return gc is not None and gc != list(group_cols)

    from daskberg_spark.iceberg.statsblobs import STATS_COMMIT_LOCK

    with STATS_COMMIT_LOCK:
        writer.statistics = [
            e for e in writer.statistics if _keep(e)
        ] + [entry]
        writer.version += 1
        writer._write_metadata()
    return {
        "mode": "incremental",
        "strategy": strategy,
        "group_cols": list(group_cols),
        "files_total": len(files),
        "partials_computed": len(missing),
        "dirty_files": len(dirty),
        "groups": n_groups,
    }


# group-key types a grouped blob can round-trip through JSON exactly
# + timestamps (r14): ISO-micros key codec, mirroring the theta side;
# raw timestamp keys usually trip max_groups first — the useful form is
# a derived day()/hour() key (groupkeys.py)
_GROUP_KEY_TYPES = {
    "int",
    "long",
    "string",
    "boolean",
    "date",
    "timestamp",
    "timestamptz",
    "timestampz",
}


def _encode_group_value(v: Any, ice_type: str | None = None) -> Any:
    # one codec for both families (r15) — see groupkeys.py; pass the
    # key's iceberg type so collect()-path LTZ instants (rendered
    # driver-system-local naive by PySpark) normalize to UTC while
    # NTZ walls encode verbatim
    from daskberg_spark.iceberg.groupkeys import encode_group_value

    return encode_group_value(v, ice_type)


def decode_group_value(v: Any, ice_type: str) -> Any:
    # kept as the historical import site; the implementation (and the
    # aware-UTC timestamp convention) lives in groupkeys.py (r15)
    from daskberg_spark.iceberg.groupkeys import (
        decode_group_value as _decode,
    )

    return _decode(v, ice_type)


def write_grouped_quantile_statistics(
    writer,
    spark,
    group_cols: list[str],
    columns: list[str] | None = None,
    buckets: int = DEFAULT_BUCKETS,
    accuracy: int = DEFAULT_ACCURACY,
    max_groups: int = MAX_BLOB_GROUPS,
    scan_source=None,
) -> str | None:
    """PER-GROUP equi-depth boundaries — the grouped twin of
    ``write_quantile_statistics`` (r12): ONE distributed grouped
    aggregate computes every value column's ``buckets+1`` boundaries
    plus row/non-null censuses for each distinct ``group_cols`` tuple
    (typically the table's identity partition columns — "p95 latency
    by day"), packed as one ``daskberg-quantiles-grouped-v1`` Puffin
    blob per value column on the current snapshot.
    ``agg.percentile_groupby`` then serves grouped percentile
    batteries metadata-only.  Refuses above ``max_groups`` distinct
    tuples — a statistics blob must stay metadata-sized — and
    restricts group columns to JSON-round-trippable types
    (int/long/string/boolean/date).  Returns the Puffin path, or None
    when no value column qualifies."""
    import daskberg_spark.iceberg.scan  # noqa: F401  (attaches .to_df)
    from pyspark.sql import functions as F

    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.puffin import write_puffin

    if not writer.snapshots:
        raise ValueError("table has no snapshots")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    from daskberg_spark.iceberg.groupkeys import (
        apply_group_keys,
        gate_group_key,
        group_key_base,
        group_key_type,
    )

    types = dict(writer.types)
    for g in group_cols:
        gate_group_key(g, types, _GROUP_KEY_TYPES, "grouped histograms key")
    if columns is None:
        columns = [
            c
            for c, t in types.items()
            if t in _NUMERIC_TYPES and c not in group_cols
        ]
    else:
        for c in columns:
            if c not in types:
                raise ValueError(f"unknown column {c!r}")
            if types[c] not in _NUMERIC_TYPES:
                raise ValueError(
                    f"column {c!r} has type {types[c]!r} — histograms "
                    "cover numeric/temporal columns only"
                )
    if not columns:
        return None
    snapshot_id = writer.head_snapshot["snapshot-id"]
    t = IcebergTable(writer.path)
    bases = {group_key_base(g, types) for g in group_cols}
    need = sorted(bases | set(columns))
    # one-scan bootstrap (r16): current content may serve from a shared
    # cache only through the delete-state gate (raw == current exactly
    # when no delete applies); else the delete-aware direct read
    src = (
        scan_source.current_frame(t.plan_files(None), need)
        if scan_source is not None
        else None
    )
    if src is None:
        src = t.to_df(spark, columns=need)
    df = apply_group_keys(src, group_cols, types)
    probs = [i / buckets for i in range(buckets + 1)]
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in columns:
        e = _numeric_expr(c, types[c])
        aggs.append(
            F.percentile_approx(
                e, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
            ).alias(f"q_{c}")
        )
        aggs.append(F.count(e).alias(f"n_{c}"))
    rows = (
        df.groupBy(*group_cols).agg(*aggs).limit(max_groups + 1).collect()
    )
    if len(rows) > max_groups:
        raise ValueError(
            f"more than {max_groups} distinct {group_cols} tuples — a "
            "grouped histogram blob must stay metadata-sized; roll the "
            "groups up or raise max_groups deliberately"
        )
    seq = writer._last_sequence_number
    blobs = []
    for c in columns:
        groups = []
        for r in rows:
            bounds = r[f"q_{c}"]
            groups.append(
                {
                    "key": [
                        _encode_group_value(r[g], group_key_type(g, types))
                        for g in group_cols
                    ],
                    "rows": int(r["__rows"]),
                    "nonnull": int(r[f"n_{c}"]),
                    "bounds": [float(b) for b in bounds] if bounds else [],
                }
            )
        payload = {
            "group_cols": list(group_cols),
            "buckets": buckets,
            "groups": groups,
        }
        blobs.append(
            {
                "type": GROUPED_QUANTILE_BLOB_TYPE,
                "fields": [writer.ids[c]],
                "snapshot-id": snapshot_id,
                "sequence-number": seq,
                "properties": {"column": c, "encoding": "json"},
                "data": json.dumps(payload, sort_keys=True).encode(),
            }
        )
    name = (
        f"quantiles-grouped-{snapshot_id}-"
        f"{uuid.uuid5(uuid.NAMESPACE_URL, f'gquant{snapshot_id}{sorted(columns)}{group_cols}').hex[:8]}"
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
    # replacement is CONFIG-scoped (r14): writing "p95 by source" no
    # longer clobbers a same-snapshot "p95 by day" entry
    def _keep(e) -> bool:
        if e["snapshot-id"] != snapshot_id:
            return True
        gc = _entry_statistics_group_cols(t, e, GROUPED_QUANTILE_BLOB_TYPE)
        if gc == "__none__":
            return True
        return gc is not None and gc != list(group_cols)

    from daskberg_spark.iceberg.statsblobs import STATS_COMMIT_LOCK

    with STATS_COMMIT_LOCK:
        writer.statistics = [
            e for e in writer.statistics if _keep(e)
        ] + [entry]
        writer.version += 1
        writer._write_metadata()
    return path


def drop_grouped_quantile_statistics(
    writer, group_cols: list[str], drop_unreadable: bool = False
) -> int:
    """Stop maintaining one grouping (r14 multi-config complement):
    removes every statistics entry whose grouped quantile blob keys on
    EXACTLY ``group_cols`` — at any snapshot, so the refresh registry
    forgets it — and returns the removed entry count.  Unreadable
    entries are KEPT unless ``drop_unreadable=True`` (r15): a
    transient IO error must not delete a different grouping."""
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.statsblobs import STATS_COMMIT_LOCK

    t = IcebergTable(writer.path)

    # classify OUTSIDE the lock — _entry_statistics_group_cols reads
    # puffin blobs (disk IO), and holding the process-global commit
    # lock across that blocks every other table's millisecond commits.
    # The keep list is still rebuilt UNDER the lock from the live
    # statistics (full replacement must not lose a concurrent family
    # commit); entries appended concurrently, unseen by the pre-pass,
    # classify there (normally zero).
    def _is_dropped(e: dict) -> bool:
        gc = _entry_statistics_group_cols(
            t, e, GROUPED_QUANTILE_BLOB_TYPE
        )
        return gc != "__none__" and (
            (gc is None and drop_unreadable) or gc == list(group_cols)
        )

    pre = {id(e): _is_dropped(e) for e in list(writer.statistics)}
    with STATS_COMMIT_LOCK:
        keep, dropped = [], 0
        for e in writer.statistics:
            hit = pre.get(id(e))
            if hit is None:
                hit = _is_dropped(e)
            if hit:
                dropped += 1
                continue
            keep.append(e)
        if dropped:
            writer.statistics = keep
            writer.version += 1
            writer._write_metadata()
    return dropped


def range_selectivity(hist: dict, op: str, value: float) -> float | None:
    """Fraction of the table's rows an ``<op> value`` range predicate
    keeps, from the equi-depth boundaries (linear interpolation within
    a bucket), scaled by the non-null fraction — NULLs never satisfy a
    range predicate.  None when the histogram can't answer (empty)."""
    bounds = hist.get("bounds") or []
    rows = int(hist.get("rows") or 0)
    nonnull = int(hist.get("nonnull") or 0)
    if len(bounds) < 2 or rows <= 0 or nonnull <= 0:
        return None

    def cdf(v: float) -> float:
        if v < bounds[0]:
            return 0.0
        if v >= bounds[-1]:
            return 1.0
        n = len(bounds) - 1
        # binary search for the bucket containing v
        lo, hi = 0, n - 1
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if bounds[mid] <= v:
                lo = mid
            else:
                hi = mid - 1
        b0, b1 = bounds[lo], bounds[lo + 1]
        frac = 0.0 if b1 <= b0 else (v - b0) / (b1 - b0)
        return (lo + min(max(frac, 0.0), 1.0)) / n

    if op in ("<", "<="):
        s = cdf(value)
    elif op in (">", ">="):
        s = 1.0 - cdf(value)
    else:
        return None
    return min(1.0, max(0.0, s)) * (nonnull / rows)


def plan_quantile_refresh_scan(writer, t):
    """Metadata-only scan plan for the NEXT global quantile refresh:
    ``(raw_norm_paths, raw_columns, dirty_columns)`` — the quantile
    half of ``maintain()``'s one-scan statistics pass (r14,
    ``onepass.plan_shared_stats_scan``).  Empty sets when the table
    never opted into per-file CDF partials.  Advisory only: a stale
    plan changes shared-cache membership, never answers — builders
    fall back to direct reads for anything the cache can't serve."""
    columns = sorted(
        {
            (b.get("properties") or {}).get("column")
            for e in writer.statistics
            for b in e.get("blob-metadata", [])
            if b.get("type") == FILE_QUANTILE_BLOB_TYPE
        }
        - {None}
    )
    columns = [c for c in columns if writer.types.get(c) in _NUMERIC_TYPES]
    if not columns:
        return set(), set(), set()
    files, dirty = _dirty_split(t)
    clean_norm = {
        _norm(f["file_path"]) for f in files if f["file_path"] not in dirty
    }
    missing: set[str] = set()
    for c in columns:
        missing |= clean_norm - set(column_filecdfs(t, c) or {})
    return missing, set(columns), (set(columns) if dirty else set())


def plan_grouped_quantile_refresh_scan(writer, t):
    """Metadata-only scan plan for the NEXT grouped quantile refresh:
    ``(raw_norm_paths, raw_columns, dirty_columns)`` (r14 one-scan
    maintenance).  Mirrors ``refresh_grouped_quantile_statistics``'s
    strategy split: identity groupings reuse the GLOBAL per-file CDF
    partials (value columns only), any other grouping uses the
    per-(file x group) partials and reads the group columns too."""
    files, dirty = _dirty_split(t)
    clean_norm = {
        _norm(f["file_path"]) for f in files if f["file_path"] not in dirty
    }
    from daskberg_spark.iceberg.groupkeys import group_key_base

    all_missing: set[str] = set()
    all_raw: set[str] = set()
    all_dirty_cols: set[str] = set()
    any_cfg = False
    covered = grouped_quantile_covered_configs(writer, t)
    for gc, cols in _grouped_quantile_configs(writer, t).items():
        if gc in covered:
            continue  # this grouping's entry already covers the head
        group_cols = list(gc)
        columns = [c for c in cols if writer.types.get(c) in _NUMERIC_TYPES]
        if not group_cols or not columns:
            continue
        any_cfg = True
        m, r, dc = _plan_one_grouped_quantile(
            writer, t, group_cols, columns, files, dirty, clean_norm
        )
        all_missing |= m
        all_raw |= r
        all_dirty_cols |= dc
    if not any_cfg:
        return set(), set(), set()
    return all_missing, all_raw, all_dirty_cols


def _plan_one_grouped_quantile(
    writer, t, group_cols, columns, files, dirty, clean_norm
):
    from daskberg_spark.iceberg.groupkeys import group_key_base

    def _is_identity() -> bool:
        # same test the refresh applies (dates excluded — manifest
        # partition encoding differs from the blob's ISO keys)
        if any(
            writer.types.get(g) not in ("int", "long", "string", "boolean")
            for g in group_cols
        ):
            return False
        for f in files:
            sid = f.get("_spec_id", 0)
            by_source = {
                sf["source-id"]: sf
                for sf in t._spec_fields(sid)
                if sf.get("transform") == "identity"
            }
            for g in group_cols:
                if by_source.get(t.fields[g].field_id) is None:
                    return False
        return True

    from daskberg_spark.iceberg.groupkeys import group_key_base

    bases = {group_key_base(g, dict(writer.types)) for g in group_cols}
    missing: set[str] = set()
    if _is_identity():
        # identity strategy reuses the GLOBAL per-file partials: the
        # raw pass reads value columns only (the group is the file's
        # partition tuple, no data column needed)
        for c in columns:
            missing |= clean_norm - set(column_filecdfs(t, c) or {})
        raw_cols = set(columns)
    else:
        for c in columns:
            missing |= clean_norm - set(
                grouped_column_filecdfs(t, c, group_cols) or {}
            )
        raw_cols = bases | set(columns)
    # the dirty scan ALWAYS groups by the group columns (both
    # strategies), so its frame needs the base columns too
    dirty_cols = (bases | set(columns)) if dirty else set()
    return missing, raw_cols, dirty_cols
