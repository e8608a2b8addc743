"""Scan planning: DNF filters → manifest / file pruning decisions.

Reference counterpart: ``/root/reference/daskberg/ice.py:286-364``
(``apply_filters`` and friends).  Same filter language — a list of
``(column, op, value)`` tuples meaning a conjunction, or a list of such
lists meaning an OR of conjunctions; ops ``== = != < <= > >= in`` — but
with two deliberate fixes:

- The reference's OR branch (``ice.py:356-363``) transposes dicts via
  ``zip(*...)`` and returns garbage; here OR is a true union of the
  conjunctions' survivor sets (SURVEY.md §4 ⚠).
- Non-order-preserving transforms (``bucket``) only prune equality-shaped
  predicates; the reference rewrites the value through the transform and
  applies *any* op, which is wrong for ``<``/``>`` through a hash.

Pruning is strictly IO-elision: a kept file may still contain no matching
rows (bounds are inclusive approximations); correctness comes from Spark
re-applying the full predicate (``scan.py``).  A pruned file is *provably*
free of matches.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass
from decimal import Decimal
from typing import Any, Iterable

from daskberg_spark.iceberg.conversions import (
    decode_bound,
    partition_value_to_python,
)
from daskberg_spark.iceberg.transforms import get_transform

OPS = {"==", "=", "!=", "<", "<=", ">", ">=", "in"}

_TEMPORAL = {"date", "timestamp", "timestamptz", "timestampz"}


@dataclass(frozen=True)
class FieldInfo:
    """Resolved info for one schema column (``ice.py:206-218`` analogue)."""

    field_id: int
    type: str
    transform: str | None = None  # set iff the column is a partition source
    partition_name: str | None = None


import functools


@functools.lru_cache(maxsize=None)
def transform_result_type(transform: str, source_type: str) -> str:
    """Iceberg type of a transform's output (for decoding summary bounds)."""
    if transform == "identity":
        return source_type
    if transform.startswith("truncate"):
        return source_type
    if transform.startswith("bucket"):
        return "int"
    if transform == "day":
        # spec result type is date; manifests store epoch-day ints
        return "int"
    if transform in ("year", "month", "hour"):
        return "int"
    if transform == "void":
        return source_type
    raise NotImplementedError(transform)


def normalize_value(value: Any, type_str: str) -> Any:
    """Coerce a user-supplied predicate value to the column's domain."""
    if value is None:
        return None
    if type_str in _TEMPORAL and isinstance(value, str):
        if type_str == "date":
            return datetime.date.fromisoformat(value)
        value = datetime.datetime.fromisoformat(value)
    if type_str == "date" and isinstance(value, datetime.datetime):
        return value.date()
    if isinstance(value, datetime.datetime) and value.tzinfo is not None:
        # partition values and decoded bounds are NAIVE UTC; an aware
        # predicate value compares unequal (or raises) against them —
        # normalize to naive UTC so tz-suffixed timestamptz filters
        # prune correctly instead of silently dropping matching files
        value = value.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    if type_str.startswith("decimal") and isinstance(value, (int, float, str)):
        return Decimal(str(value))
    if type_str == "uuid":
        import uuid as _uuid

        if isinstance(value, _uuid.UUID):
            return str(value)
        if isinstance(value, str):
            # canonical lowercase STRING on both sides: partition values
            # and bounds canonicalize the same way (16-byte fixed or
            # text), so uuid filters compare exactly
            return str(_uuid.UUID(value))
    return value


def _comparable(a: Any, b: Any) -> tuple[Any, Any]:
    """Make two values comparable (date vs datetime, Decimal vs float)."""
    if isinstance(a, datetime.datetime) and type(b) is datetime.date:
        b = datetime.datetime(b.year, b.month, b.day)
    elif isinstance(b, datetime.datetime) and type(a) is datetime.date:
        a = datetime.datetime(a.year, a.month, a.day)
    if isinstance(a, Decimal) and isinstance(b, float):
        b = Decimal(str(b))
    elif isinstance(b, Decimal) and isinstance(a, float):
        a = Decimal(str(a))
    return a, b


def _le(a: Any, b: Any) -> bool:
    a, b = _comparable(a, b)
    return a <= b


def _lt(a: Any, b: Any) -> bool:
    a, b = _comparable(a, b)
    return a < b


def _eq(a: Any, b: Any) -> bool:
    a, b = _comparable(a, b)
    return a == b


def range_may_match(op: str, value: Any, lo: Any, hi: Any) -> bool:
    """Could any x with lo <= x <= hi satisfy ``x <op> value``?

    ``None`` bound → unknown → conservatively True on that side.  The
    ``!=`` rule keeps the range unless it is pinned to exactly ``value``
    (``ice.py:337-338`` semantics).
    """
    if isinstance(value, float) and value != value:
        # NaN predicate: bounds EXCLUDE NaN per spec, so no bound
        # comparison can disprove a match (Spark's NaN = NaN is true)
        return True
    if op in ("==", "="):
        return (lo is None or _le(lo, value)) and (hi is None or _le(value, hi))
    if op == "!=":
        if isinstance(lo, float) or isinstance(hi, float):
            # a float column may hold NaN rows OUTSIDE its bounds (the
            # spec excludes NaN from min/max) and NaN != v is true —
            # never prune notEq on floats (Java's
            # InclusiveMetricsEvaluator does the same)
            return True
        return not (lo is not None and hi is not None and _eq(lo, hi) and _eq(lo, value))
    if op == "<":
        return lo is None or _lt(lo, value)
    if op == "<=":
        return lo is None or _le(lo, value)
    if op == ">":
        return hi is None or _lt(value, hi)
    if op == ">=":
        return hi is None or _le(value, hi)
    if op == "in":
        return any(range_may_match("==", v, lo, hi) for v in value)
    raise ValueError(f"unknown op {op!r}")


def point_may_match(op: str, value: Any, point: Any, exact: bool) -> bool:
    """Could a partition whose (transformed) value is ``point`` hold a match?

    ``exact=True`` means every row in the partition has exactly this source
    value (identity transform) → ``!=`` may prune and range checks are
    strict.  ``exact=False`` (order-preserving derived transforms like
    truncate/day): monotonicity of t gives  row < v ⟹ t(row) <= t(v)  and
    row > v ⟹ t(row) >= t(v), so a partition with point p provably has no
    match for ``< v`` iff p > t(v), and none for ``> v`` iff p < t(v); the
    boundary partition p == t(v) must be kept (it mixes rows on both sides
    of v).
    """
    if point is None:
        return True  # null partition value: unknown → keep
    if op in ("==", "="):
        return _eq(point, value)
    if op == "in":
        return any(_eq(point, v) for v in value)
    if op == "!=":
        return not (exact and _eq(point, value))
    if op == "<":
        return _lt(point, value) if exact else _le(point, value)
    if op == "<=":
        return _le(point, value)
    if op == ">":
        return _lt(value, point) if exact else _le(value, point)
    if op == ">=":
        return _le(value, point)
    raise ValueError(f"unknown op {op!r}")


def _validate(pred: tuple[str, str, Any]) -> None:
    col, op, val = pred
    if op not in OPS:
        raise ValueError(f"unsupported op {op!r}")
    if op == "in" and not isinstance(val, (list, tuple, set, frozenset)):
        raise ValueError("'in' filter value must be list/tuple/set")


def is_dnf(filters: Any) -> bool:
    """True if ``filters`` is a list of conjunctions (OR form)."""
    return bool(filters) and isinstance(filters[0], (list, tuple)) and bool(
        filters[0]
    ) and isinstance(filters[0][0], (list, tuple))


def _file_passes_conjunction(
    data_file: dict[str, Any],
    conj: Iterable[tuple[str, str, Any]],
    fields: dict[str, FieldInfo],
    spec_by_source: dict[int, dict[str, Any]] | None = None,
) -> bool:
    resolved = []
    for pred in conj:
        _validate(pred)
        col, op, raw_value = pred
        info = fields.get(col)
        if info is None:
            continue
        if op == "in":
            value: Any = [normalize_value(v, info.type) for v in raw_value]
        else:
            value = normalize_value(raw_value, info.type)
        resolved.append((op, info, value))
    return _file_passes_resolved(data_file, resolved, spec_by_source)


def _file_passes_resolved(
    data_file: dict[str, Any],
    resolved: list[tuple[str, FieldInfo, Any]],
    spec_by_source: dict[int, dict[str, Any]] | None = None,
) -> bool:
    for op, info, value in resolved:
        # (a) partition-value check through the transform (ice.py:296-318).
        # The transform is resolved from THIS file's partition spec when
        # given (``spec_by_source``): on a spec-evolved table an older spec
        # may reuse a field name with a different transform (e.g. changed
        # bucket width), and checking through the default spec's transform
        # would prune with the wrong function → silently missing rows.
        if spec_by_source is not None:
            spec = spec_by_source.get(info.field_id)
            transform = spec["transform"] if spec else None
            partition_name = spec["name"] if spec else None
        else:
            transform, partition_name = info.transform, info.partition_name
        if transform and transform != "void":
            part = data_file.get("partition") or {}
            if partition_name in part:
                fn, ordered = get_transform(transform)
                pval = partition_value_to_python(
                    part[partition_name],
                    transform_result_type(transform, info.type),
                )
                if transform == "day" and pval is not None and not isinstance(pval, int):
                    pval = (pval - datetime.date(1970, 1, 1)).days
                exact = transform == "identity"
                if ordered:
                    tv = [fn(v) for v in value] if op == "in" else fn(value)
                    if not point_may_match(op, tv, pval, exact):
                        return False
                elif op in ("==", "=", "in"):
                    tv = [fn(v) for v in value] if op == "in" else fn(value)
                    if not point_may_match(op, tv, pval, exact=False):
                        return False

        # (b) column min/max bounds, field-id keyed (ice.py:320-332)
        lo = _bound_lookup(data_file.get("lower_bounds"), info.field_id, info.type)
        hi = _bound_lookup(data_file.get("upper_bounds"), info.field_id, info.type)
        if lo is not None or hi is not None:
            if not range_may_match(op, value, lo, hi):
                return False
    return True


def _bound_lookup(bounds: Any, field_id: int, type_str: str) -> Any:
    if not bounds:
        return None
    if isinstance(bounds, dict):  # already keyed
        raw = bounds.get(field_id)
    else:  # avro list of {key, value}
        raw = next((b["value"] for b in bounds if b["key"] == field_id), None)
    if raw is None:
        return None
    return decode_bound(raw, type_str)


def apply_filters(
    files: list[dict[str, Any]],
    filters: Any,
    fields: dict[str, FieldInfo],
    spec_fields_for: Any = None,
) -> list[dict[str, Any]]:
    """Return the subset of data files that may contain matching rows.

    OR-of-conjunctions → union of survivor sets (reference bug fixed).
    ``spec_fields_for(spec_id)`` (e.g. ``IcebergTable._spec_fields``)
    resolves each file's own partition spec so transform checks follow
    the spec the file was written under, not the table default.
    """
    if not filters:
        return files
    conjunctions = filters if is_dnf(filters) else [filters]
    # hoist the per-predicate invariants (validation, value parsing)
    # out of the file loop: on a 100k-file table a 3-predicate filter
    # would otherwise re-parse the same constants 300k times during
    # metadata planning
    resolved_conjunctions = []
    for conj in conjunctions:
        resolved = []
        for pred in conj:
            _validate(pred)
            col, op, raw_value = pred
            info = fields.get(col)
            if info is None:
                continue  # unknown column: cannot prune on it
            if op == "in":
                value: Any = [
                    normalize_value(v, info.type) for v in raw_value
                ]
            else:
                value = normalize_value(raw_value, info.type)
            resolved.append((op, info, value))
        resolved_conjunctions.append(resolved)
    spec_cache: dict[int, dict[int, dict[str, Any]]] = {}

    def spec_map(f: dict[str, Any]) -> dict[int, dict[str, Any]] | None:
        if spec_fields_for is None:
            return None
        sid = f.get("_spec_id", 0)
        if sid not in spec_cache:
            spec_cache[sid] = {
                sf["source-id"]: sf for sf in spec_fields_for(sid)
            }
        return spec_cache[sid]

    out: dict[str, dict[str, Any]] = {}
    for resolved in resolved_conjunctions:
        for data_file in files:
            path = data_file["file_path"]
            if path not in out and _file_passes_resolved(
                data_file, resolved, spec_map(data_file)
            ):
                out[path] = data_file
    return [f for f in files if f["file_path"] in out]


def check_summaries(
    summaries: list[dict[str, Any]],
    spec_fields: list[dict[str, Any]],
    fields: dict[str, FieldInfo],
    filters: Any,
) -> bool:
    """Manifest-list pruning: may this manifest contain matching rows?

    ``summaries[i]`` carries lower/upper bound bytes of partition field i
    *in transformed space* (``ice.py:165-182``).  Conservative: any doubt
    → True.
    """
    if not filters:
        return True
    conjunctions = filters if is_dnf(filters) else [filters]
    by_source: dict[int, tuple[dict[str, Any], dict[str, Any]]] = {}
    for summary, spec in zip(summaries, spec_fields):
        by_source[spec["source-id"]] = (summary, spec)
    name_to_info = fields

    def conj_may_match(conj: Iterable[tuple[str, str, Any]]) -> bool:
        for pred in conj:
            _validate(pred)
            col, op, raw_value = pred
            info = name_to_info.get(col)
            if info is None or info.field_id not in by_source:
                continue
            summary, spec = by_source[info.field_id]
            transform = spec["transform"]
            if transform == "void":
                continue
            fn, ordered = get_transform(transform)
            result_type = transform_result_type(transform, info.type)
            lo = decode_bound(summary.get("lower_bound"), result_type)
            hi = decode_bound(summary.get("upper_bound"), result_type)
            if lo is None and hi is None:
                continue
            value = normalize_value(raw_value, info.type)
            if op == "in":
                tv: Any = [fn(normalize_value(v, info.type)) for v in raw_value]
            else:
                tv = fn(value)
            if ordered:
                eff_op = op
                if transform != "identity":
                    # Transformed space: the boundary partition t(v) mixes
                    # rows on both sides of v, so strict ops relax to
                    # inclusive and != cannot prune at all.
                    if op == "<":
                        eff_op = "<="
                    elif op == ">":
                        eff_op = ">="
                    elif op == "!=":
                        continue
                if not range_may_match(eff_op, tv, lo, hi):
                    return False
            elif op in ("==", "=", "in"):
                # hash space is unordered, but equality still implies the
                # bucket value must fall inside the summary range
                if not range_may_match("in" if op == "in" else "==", tv, lo, hi):
                    return False
        return True

    return any(conj_may_match(c) for c in conjunctions)
