"""Derived group keys for grouped statistics (r14).

Grouped theta/quantile blobs key on raw column values; for event
tables the grouping a pipeline actually wants is temporal — "distinct
users per DAY/HOUR" — and a raw ``timestamp`` key usually trips
``max_groups`` long before it is useful.  This module defines the
shared spec syntax ``"day(col)"`` / ``"hour(col)"``: the writers
compute the derived key (codegen ``to_date`` / ``date_trunc``) under
the SPEC STRING as its column name (PySpark column names may contain
parentheses), the blob payload stores the spec verbatim in
``group_cols``, and every consumer (``ndv_groupby``,
``percentile_groupby``, the refresh planners) matches on the same
string — a derived key behaves exactly like a column from the blob's
point of view.

``day(col)`` yields a DATE key (ISO string in the payload — the
convention plain date keys already use); ``hour(col)`` yields a
TIMESTAMP truncated to the hour (ISO micros string in the payload —
the r14 timestamp-key codec).  Base columns may be ``timestamp`` /
``timestamptz`` or ``date`` (``day`` only).
"""

from __future__ import annotations

import re
from typing import Any

_SPEC_RE = re.compile(r"(day|hour)\((\w+)\)")

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
    if tr == "day" and bt not in _TS_TYPES + ("date",):
        raise ValueError(
            f"day() group keys need a timestamp/date base — {base!r} "
            f"is {bt!r}"
        )
    if tr == "hour" and bt not in _TS_TYPES:
        raise ValueError(
            f"hour() group keys need a timestamp base — {base!r} is {bt!r}"
        )
    return tr, base, ("date" if tr == "day" else "timestamp")


def group_key_type(spec: str, types: dict[str, str]) -> str | None:
    return parse_group_key(spec, types)[2]


def group_key_base(spec: str, types: dict[str, str]) -> str:
    return parse_group_key(spec, types)[1]


def apply_group_keys(df: Any, specs: list[str], types: dict[str, str]):
    """Materialize every derived key as a column named by its spec;
    plain columns are left alone.  Codegen expressions only."""
    from pyspark.sql import functions as F

    for s in specs:
        tr, base, _ = parse_group_key(s, types)
        if tr == "day":
            df = df.withColumn(s, F.to_date(F.col(base)))
        elif tr == "hour":
            df = df.withColumn(
                s, F.date_trunc("hour", F.col(base).cast("timestamp"))
            )
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
