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

Histograms are NOT mergeable the way theta sketches are (equi-depth
boundaries can't union without the raw ranks), so there is no
incremental refresh: re-run ``write_quantile_statistics`` after bulk
ingest, or accept drift — a stale histogram mis-ranks a join order but
can never corrupt a result.
"""

from __future__ import annotations

import datetime
import json
import os
import uuid
from typing import Any

QUANTILE_BLOB_TYPE = "daskberg-quantiles-v1"
GROUPED_QUANTILE_BLOB_TYPE = "daskberg-quantiles-grouped-v1"
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


# group-key types a grouped blob can round-trip through JSON exactly
_GROUP_KEY_TYPES = {"int", "long", "string", "boolean", "date"}


def _encode_group_value(v: Any) -> Any:
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return v.isoformat()
    return v


def decode_group_value(v: Any, ice_type: str) -> Any:
    if v is None:
        return None
    if ice_type == "date":
        return datetime.date.fromisoformat(v)
    if ice_type in ("int", "long"):
        return int(v)
    return v


def write_grouped_quantile_statistics(
    writer,
    spark,
    group_cols: list[str],
    columns: list[str] | None = None,
    buckets: int = DEFAULT_BUCKETS,
    accuracy: int = DEFAULT_ACCURACY,
    max_groups: int = MAX_BLOB_GROUPS,
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
    types = dict(writer.types)
    for g in group_cols:
        if g not in types:
            raise ValueError(f"unknown group column {g!r}")
        if types[g] not in _GROUP_KEY_TYPES:
            raise ValueError(
                f"group column {g!r} has type {types[g]!r} — grouped "
                f"histograms key on {sorted(_GROUP_KEY_TYPES)} only"
            )
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
    df = t.to_df(spark, columns=sorted(set(group_cols) | set(columns)))
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
                    "key": [_encode_group_value(r[g]) for g in group_cols],
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
    writer.statistics = [
        e
        for e in writer.statistics
        if not (
            e["snapshot-id"] == snapshot_id
            and any(
                b.get("type") == GROUPED_QUANTILE_BLOB_TYPE
                for b in e.get("blob-metadata", [])
            )
        )
    ] + [entry]
    writer.version += 1
    writer._write_metadata()
    return path


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
