"""Derived group keys for grouped statistics (r14) and THE shared
group-key codec (r15).

Grouped theta/quantile blobs key on raw column values; for event
tables the grouping a pipeline actually wants is temporal — "distinct
users per DAY/HOUR", monthly/yearly rollup horizons — and a raw
``timestamp`` key usually trips ``max_groups`` long before it is
useful.  This module defines the shared spec syntax ``"year(col)"`` /
``"month(col)"`` / ``"day(col)"`` / ``"hour(col)"``: the writers
compute the derived key (codegen ``to_date`` / ``trunc`` /
``date_trunc``) under the SPEC STRING as its column name (PySpark
column names may contain parentheses), the blob payload stores the
spec verbatim in ``group_cols``, and every consumer (``ndv_groupby``,
``percentile_groupby``, the refresh planners) matches on the same
string — a derived key behaves exactly like a column from the blob's
point of view.

``day/month/year(col)`` yield DATE keys (the date / first of month /
Jan 1; ISO strings in the payload — the convention plain date keys
already use); ``hour(col)`` yields a TIMESTAMP truncated to the hour,
preserving the base's tz semantics.  Base columns may be
``timestamp`` / ``timestamptz`` or ``date`` (``hour`` needs a
timestamp).  ``encode_group_value`` / ``decode_group_value`` below
are the ONE key codec both statistics families use.
"""

from __future__ import annotations

import datetime
import re
from typing import Any

_SPEC_RE = re.compile(r"(year|month|day|hour)\((\w+)\)")

_LTZ_ICE_TYPES = ("timestamptz", "timestampz")


def encode_group_value(v: Any, ice_type: str | None = None) -> Any:
    """THE group-key codec — one encoding for BOTH statistics
    families (r15; the r14 split let the key spaces drift under
    non-UTC drivers).  Temporal keys ride the JSON payload as ISO
    strings with Iceberg's own semantics per type:

    - ``timestamp`` (Spark NTZ) keys are WALL CLOCKS — the collected
      naive value IS the key, encoded verbatim (TZ-free end to end);
    - ``timestamptz`` keys are INSTANTS, always stored UTC-naive.

    Producer paths frame values differently and this codec absorbs
    both: the Arrow builder (``theta.build_grouped_column_sketches``)
    sees NTZ columns naive and LTZ columns session-TZ-AWARE
    (``astimezone(utc)`` is exact); the ``collect()``-based quantile
    passes see LTZ instants as DRIVER-SYSTEM-local naive datetimes
    (PySpark's ``TimestampType.fromInternal`` converts through the
    process clock), which ``ice_type`` disambiguates from NTZ walls —
    attaching the system zone recovers the instant.  Under a UTC
    driver every branch is identity-preserving, so blobs written by
    earlier rounds keep decoding bit-equal."""
    if isinstance(v, datetime.datetime):
        if v.tzinfo is None and ice_type in _LTZ_ICE_TYPES:
            v = v.astimezone()  # collect(): instant shown system-local
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def decode_group_value(v: Any, ice_type: str) -> Any:
    """Inverse of ``encode_group_value``.  NTZ (``timestamp``) keys
    decode NAIVE — their Spark type is ``TimestampNTZType``, whose
    driver conversions are wall-clock-pure under any zone.  LTZ keys
    decode AWARE-UTC: ``TimestampType.toInternal`` converts aware
    values through their own offset, so the instant survives any
    driver system zone — a naive return would be re-interpreted
    driver-locally (the r14 asymmetry this codec closes)."""
    if v is None:
        return None
    if ice_type == "date":
        return datetime.date.fromisoformat(v)
    if ice_type == "timestamp":
        return datetime.datetime.fromisoformat(v)
    if ice_type in _LTZ_ICE_TYPES:
        return datetime.datetime.fromisoformat(v).replace(
            tzinfo=datetime.timezone.utc
        )
    if ice_type in ("int", "long"):
        return int(v)
    return v

_TS_TYPES = ("timestamp", "timestamptz", "timestampz")


def parse_group_key(
    spec: str, types: dict[str, str]
) -> tuple[str | None, str, str | None]:
    """``(transform | None, base_column, result_iceberg_type)`` for a
    group-key spec — plain column names pass through with their own
    type.  Raises on a derived spec over a non-temporal base."""
    m = _SPEC_RE.fullmatch(spec)
    if m is None:
        return None, spec, types.get(spec)
    tr, base = m.group(1), m.group(2)
    bt = types.get(base)
    if tr in ("year", "month", "day") and bt not in _TS_TYPES + ("date",):
        raise ValueError(
            f"{tr}() group keys need a timestamp/date base — {base!r} "
            f"is {bt!r}"
        )
    if tr == "hour" and bt not in _TS_TYPES:
        raise ValueError(
            f"hour() group keys need a timestamp base — {base!r} is {bt!r}"
        )
    if tr in ("year", "month", "day"):
        # DATE-typed results (ISO convention): day(ts) = the date,
        # month(ts) = its first day, year(ts) = Jan 1 — rollup
        # horizons share the date key codec end to end (r15)
        return tr, base, "date"
    # hour() preserves the base's timezone semantics: NTZ walls stay
    # NTZ, instants stay instants (r15 — the codec relies on this)
    return tr, base, ("timestamptz" if bt in _LTZ_ICE_TYPES else "timestamp")


def group_key_type(spec: str, types: dict[str, str]) -> str | None:
    return parse_group_key(spec, types)[2]


def group_key_base(spec: str, types: dict[str, str]) -> str:
    return parse_group_key(spec, types)[1]


def apply_group_keys(df: Any, specs: list[str], types: dict[str, str]):
    """Materialize every derived key as a column named by its spec;
    plain columns are left alone.  Codegen expressions only.

    ``hour()`` over an NTZ base truncates the WALL CLOCK and yields an
    NTZ column: the NTZ→LTZ→trunc→NTZ chain renders and re-renders
    through the same session zone, so the result is the wall clock
    with minutes zeroed under ANY session timezone — matching
    Iceberg's own hour transform on ``timestamp``.  ``hour()`` over a
    ``timestamptz`` base truncates the instant on session-zone hour
    boundaries (UTC in this engine's sessions) and stays LTZ."""
    from pyspark.sql import functions as F

    for s in specs:
        tr, base, rt = parse_group_key(s, types)
        if tr == "day":
            df = df.withColumn(s, F.to_date(F.col(base)))
        elif tr in ("month", "year"):
            df = df.withColumn(s, F.trunc(F.to_date(F.col(base)), tr))
        elif tr == "hour":
            e = F.date_trunc("hour", F.col(base).cast("timestamp"))
            if rt == "timestamp":
                e = e.cast("timestamp_ntz")
            df = df.withColumn(s, e)
    return df


def gate_group_key(
    spec: str, types: dict[str, str], allowed, kind: str
) -> str:
    """Validate a group-key spec against a writer's allowed result
    types; returns the key's result iceberg type."""
    tr, base, rt = parse_group_key(spec, types)
    if base not in types:
        raise ValueError(f"unknown group column {base!r}")
    if rt not in allowed:
        raise ValueError(
            f"group column {spec!r} has type {rt!r} — {kind} on "
            f"{sorted(allowed)} only"
        )
    return rt
