"""Metadata-only aggregate pushdown: COUNT/MIN/MAX answered from
manifest statistics, with a hybrid scan fallback for the files whose
stats cannot prove the answer.

Real Iceberg-Spark pushes ``count(*)``/``min``/``max`` into the scan but
REFUSES the whole pushdown when any row-level delete or non-trivial
filter is present.  This implementation is per-file instead of
per-table: every planned file independently either proves its
contribution from manifest stats or joins a residual Spark scan, and
the two partial answers combine exactly.  On a 100 TB table a
``count(*)`` or a ``min(ts)`` is then metadata-only (zero data IO), and
a filtered aggregate reads only the filter's boundary files — the same
whole-file-proof machinery ``delete_where_fast`` uses
(``planner.file_all_rows_match``).

Soundness gates, all conservative (fail → the file is scanned):

- **Deletes.**  A file with any possibly-applicable equality or
  position delete has unknown live stats.  Exception: a v3 deletion
  vector's ``record_count`` is its exact cardinality, so ``count(*)``
  stays metadata-only on DV-maintained tables (``rc - dv_count``);
  min/max still scan (the deleted row may be the extremum).
- **Filters.**  With a filter, a file contributes metadata only when
  ``file_all_rows_match`` PROVES every row satisfies it (stats cover
  the pre-delete superset, so the proof survives DV subtraction).
- **NaN.**  Iceberg float/double bounds exclude NaN while Spark and
  DuckDB order NaN greatest; metadata min/max on floats requires
  ``nan_value_counts == 0`` for the file.
- **Truncated bounds.**  Foreign writers may truncate string/binary
  bounds (spec ``write.metadata.metrics`` truncation), making them
  inexact; only fixed-width types (int/long/float/double/date/
  timestamp/decimal — never truncated per spec) answer min/max from
  bounds directly.  Strings still benefit: the *bounds refinement*
  below skips every file whose (possibly truncated) lower bound
  exceeds some other file's upper bound.

Bounds refinement (min; max is symmetric): the true minimum is ≤ the
smallest upper bound over clean, whole-matching, provably non-empty
files, so any clean whole-matching file whose lower bound exceeds that
cap cannot contain it and is dropped from the scan set.  Cap files must
be provably non-empty after deletes AND filters — a fully-deleted
file's stale upper bound would otherwise shrink the cap below the true
minimum and wrongly skip the file that holds it (regression-tested).

The residual scan is ONE job regardless of how many aggregates need
it: each scanned file carries a per-aggregate bitmask (broadcast
path→mask map) and every aggregate evaluates conditionally on its bit,
so a file scanned for ``min`` never double-counts into a ``count(*)``
already answered from metadata.

Reference parity: the reference (daskberg) has no aggregate pushdown at
all — every aggregate is a full Dask scan (``/root/reference/daskberg/
ice.py:220-264`` hands the file list to ``dask.dataframe``).
"""

from __future__ import annotations

import decimal
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from daskberg_spark.iceberg.conversions import schema_to_struct
from daskberg_spark.iceberg.metadata import IcebergTable
from daskberg_spark.iceberg.planner import (
    _bound_lookup,
    _count_lookup,
    _lt,
    file_all_rows_match,
)

# fixed-width types whose manifest bounds are EXACT per spec (metrics
# truncation applies only to string/binary); strings fall back to the
# bounds-refined scan path
_EXACT_BOUND_TYPES = {
    "int",
    "long",
    "float",
    "double",
    "date",
    "timestamp",
    "timestamptz",
    "timestampz",
}

_CLEAN, _DV_EXACT, _DIRTY = 0, 1, 2

_SENTINEL_SCAN = object()  # this file must be scanned for this aggregate
_SENTINEL_SKIP = object()  # this file provably contributes nothing


def _is_exact_bound_type(type_str: str) -> bool:
    return type_str in _EXACT_BOUND_TYPES or type_str.startswith("decimal")


def _is_nan(v: Any) -> bool:
    return isinstance(v, float) and v != v


def _combine(op: str, vals: list[Any]) -> Any:
    """min/max over mixed metadata + scanned partials with Spark's NaN
    ordering (NaN greater than every number, for BOTH min and max)."""
    vals = [v for v in vals if v is not None]
    if not vals:
        return None
    nans = [v for v in vals if _is_nan(v)]
    nums = [v for v in vals if not _is_nan(v)]
    if op == "max":
        return nans[0] if nans else max(nums)
    return min(nums) if nums else nans[0]


def _validate_aggs(aggs: list[tuple[str, str, str]], fields) -> None:
    if not aggs:
        # an empty battery would skip every per-file soundness gate and
        # emit groups from raw record counts — reject it
        raise ValueError("at least one aggregate is required")
    seen = set()
    for fn, col, alias in aggs:
        if alias.startswith("__"):
            raise ValueError(
                f"alias {alias!r} collides with internal columns"
            )
        if fn not in ("count", "min", "max", "sum", "approx_count_distinct"):
            raise ValueError(f"unsupported aggregate {fn!r}")
        if col == "*" and fn != "count":
            raise ValueError(f"{fn}(*) is not an aggregate")
        if col != "*" and col not in fields:
            raise ValueError(f"unknown column {col!r}")
        if col != "*" and "." in col:
            raise ValueError("nested columns are not supported")
        if fn == "sum":
            from daskberg_spark.iceberg.sumstats import is_summable

            if not is_summable(fields[col].type):
                # float/double sums are order-dependent in IEEE
                # arithmetic — no stored per-file value could promise
                # bit-exact equality with a direct scan, so refuse
                # loudly rather than push down an approximation
                raise ValueError(
                    f"sum({col}): type {fields[col].type!r} has no "
                    "exact decomposable sum (int/long/decimal only)"
                )
        if alias in seen:
            raise ValueError(f"duplicate alias {alias!r}")
        seen.add(alias)


def _record_zero_scan(table: IcebergTable, filters: Any) -> None:
    """Pure-metadata answer: record the zero-IO scan the way to_df
    would, so observability never shows a stale previous scan."""
    table.last_scan = {
        "files_scanned": 0,
        "files_live": len(table.scan_all()[0]),
        "bytes_scanned": 0,
        "records_in_scanned_files": 0,
        "formats": [],
        "delete_files": {},
        "projected_columns": [],
        "filters": filters,
    }


def _ndv_pushdown(
    table: IcebergTable,
    spark: SparkSession,
    aggs: list[tuple[str, str, str]],
    ndv_aggs: list[tuple[str, str, str]],
) -> DataFrame:
    """Whole-table answer for an agg battery containing
    ``approx_count_distinct``: NDVs decode from the CURRENT snapshot's
    theta blobs (zero IO; EXACT below the sketch's k=4096); columns
    without a covering blob share ONE HLL scan.  The count/min/max
    remainder recurses through the ordinary per-file pushdown and the
    two one-row answers merge in the caller's agg order."""
    ndv_vals: dict[str, int] = {}
    need_scan: list[tuple[str, str]] = []
    for _, col, alias in ndv_aggs:
        sk = table.column_theta(col)
        if sk is None:
            need_scan.append((col, alias))
        else:
            ndv_vals[alias] = int(round(sk.estimate()))
    if need_scan:
        # local import like agg_pushdown's (scan imports nothing from agg)
        from daskberg_spark.iceberg.scan import to_df

        # dedupe: two NDV aggs on ONE column must not project the
        # column twice (ambiguous-reference crash in the agg below)
        df = to_df(table, spark, columns=sorted({c for c, _ in need_scan}))
        row = df.agg(
            *[
                F.approx_count_distinct(c).alias(a)
                for c, a in need_scan
            ]
        ).collect()[0]
        for _, a in need_scan:
            ndv_vals[a] = int(row[a])
    rest = [a for a in aggs if a[0] != "approx_count_distinct"]
    if rest:
        out = agg_pushdown(table, spark, rest)
        rest_meta = dict(table.last_agg_pushdown["meta_files"])
        files_planned = table.last_agg_pushdown["files_planned"]
        files_scanned = table.last_agg_pushdown["files_scanned"]
    else:
        out = spark.range(1).select()
        rest_meta = {}
        files_planned = files_scanned = 0
        if not need_scan:
            # the whole battery answered from blobs: don't leave a
            # previous operation's last_scan lying around
            _record_zero_scan(table, None)
    # quote aliases for the reorder select — a dotted alias is a plain
    # name here, not a struct access (the count/min/max path treats it
    # as a literal name too)
    q = [F.col("`" + alias.replace("`", "``") + "`") for _, _, alias in aggs]
    for _, _, alias in ndv_aggs:
        out = out.withColumn(alias, F.lit(ndv_vals[alias]).cast("long"))
    out = out.select(*q)
    scanned_aliases = {a for _, a in need_scan}
    table.last_agg_pushdown = {
        "files_planned": files_planned,
        # the HLL fallback scan (if any) is reported separately below —
        # files_scanned and meta_files keep the per-file pushdown's
        # integer contract untouched
        "files_scanned": files_scanned,
        "meta_files": rest_meta,
        "ndv_from_stats": sorted(
            a for _, _, a in ndv_aggs if a not in scanned_aliases
        ),
        "ndv_scanned_columns": sorted(scanned_aliases),
    }
    return out


def agg_pushdown(
    table: IcebergTable,
    spark: SparkSession,
    aggs: list[tuple[str, str, str]],
    filters: Any = None,
    group_by: list[str] | None = None,
) -> DataFrame:
    """DataFrame of ``aggs`` = [(fn, col, alias), ...] where fn ∈
    {count, min, max, sum} (col ``"*"`` allowed for count), answered
    from manifest statistics — plus per-file sum blobs (``sumstats.py``)
    for ``sum`` — wherever sound and from ONE residual Spark scan over
    the remaining files otherwise.  Exact under filters, row-level
    deletes, and NaN — every unprovable file is scanned, and the result
    never depends on stats alone.  ``sum`` covers int/long/decimal
    columns only (float sums are order-dependent; refused loudly).

    ``group_by`` (identity-partitioned columns of int/long/string/
    boolean type) turns the one-row answer into one row per group —
    every row of a file shares its identity partition value, so
    per-file stats ARE per-group stats and "rows per day" on a 100 TB
    table stays a manifest read.  A group only appears when it provably
    holds ≥1 live matching row.

    ``table.last_agg_pushdown`` reports the split:
    ``{"files_planned", "files_scanned", "meta_files": {alias: n}}``.
    """
    fields = table.fields
    _validate_aggs(aggs, fields)
    group_by = list(group_by or [])
    ndv_aggs = [a for a in aggs if a[0] == "approx_count_distinct"]
    if ndv_aggs:
        # NDV is not per-file decomposable from manifest stats, so it
        # rides the TABLE-level theta blobs instead (valid only for the
        # snapshot they cover — column_theta enforces that): whole-table,
        # unfiltered, ungrouped.  Columns without a covering blob fall
        # back to ONE HLL scan; everything else stays metadata-only.
        if filters or group_by:
            raise ValueError(
                "approx_count_distinct pushes down from table statistics "
                "— whole-table only (no filters, no group_by)"
            )
        return _ndv_pushdown(table, spark, aggs, ndv_aggs)
    aliases = {a for _, _, a in aggs}
    for g in group_by:
        info = fields.get(g)
        if info is None:
            raise ValueError(f"unknown group column {g!r}")
        if "." in g:
            raise ValueError("nested group columns are not supported")
        if g in aliases:
            raise ValueError(
                f"group column {g!r} collides with an aggregate alias"
            )
        if info.transform != "identity" or not info.partition_name:
            raise ValueError(
                f"group column {g!r} is not identity-partitioned — "
                "per-file stats cannot split a file across groups"
            )
        if info.type not in ("int", "long", "string", "boolean"):
            raise ValueError(
                f"group column {g!r} has type {info.type!r}; metadata "
                "grouping supports int/long/string/boolean partition "
                "values"
            )
    files = table.plan_files(filters)
    deletes = table.plan_deletes()
    use_seq = table.metadata.get("format-version", 1) >= 2

    def okey(rec: dict[str, Any]) -> int:
        if use_seq:
            seq = rec.get("_sequence_number")
            return 0 if seq is None else seq
        return rec.get("_snapshot_id") or 0

    # scope helper shared with the read path (scan._scope_tuple) — import
    # here to avoid a module cycle (scan imports nothing from agg)
    from daskberg_spark.iceberg.scan import _norm_scan_path, _scope_tuple, to_df

    # per-file sum blobs (sumstats.py): loaded once per sum column; a
    # column with no blob coverage routes every file to the scan
    sum_maps: dict[str, dict | None] = {}
    sum_scales: dict[str, int] = {}
    if any(fn == "sum" for fn, _, _ in aggs):
        from daskberg_spark.iceberg.sumstats import column_filesums, type_scale

        for fn, col, _ in aggs:
            if fn == "sum" and col not in sum_maps:
                sum_maps[col] = column_filesums(table, col)
                sum_scales[col] = type_scale(fields[col].type)

    # -- per-file delete state (over-approximate: "might apply" → not clean)
    dv_minus: dict[str, int] = {}
    dv_dirty: set[str] = set()
    eq_scopes: list[tuple[int, tuple | None]] = []
    pos_scopes: list[tuple[int, tuple | None]] = []
    for d in deletes:
        if d.get("content") == 2:
            eq_scopes.append((okey(d), _scope_tuple(table, d)))
        elif d.get("content") == 1:
            ref = d.get("referenced_data_file")
            if ref:
                rc = d.get("record_count")
                key = _norm_scan_path(ref)
                if rc is None or key in dv_minus or key in dv_dirty:
                    # unknown cardinality, or two live DVs on one file
                    # (reconciliation should prevent it — stay sound)
                    dv_dirty.add(key)
                    dv_minus.pop(key, None)
                else:
                    dv_minus[key] = int(rc)
            else:
                pos_scopes.append((okey(d), _scope_tuple(table, d)))

    spec_cache: dict[int, dict[int, dict[str, Any]]] = {}

    def spec_map(f: dict[str, Any]) -> dict[int, dict[str, Any]]:
        sid = f.get("_spec_id", 0)
        if sid not in spec_cache:
            spec_cache[sid] = {
                sf["source-id"]: sf for sf in table._spec_fields(sid)
            }
        return spec_cache[sid]

    def state(f: dict[str, Any]) -> tuple[int, int]:
        """(delete state, exact DV subtraction)."""
        fkey = okey(f)
        fscope = _scope_tuple(table, f)
        for dkey, dscope in eq_scopes:
            # eq deletes apply to strictly-older files within scope
            if fkey < dkey and (dscope is None or dscope == fscope):
                return _DIRTY, 0
        for dkey, dscope in pos_scopes:
            # path-based position deletes name files in their CONTENT —
            # unreadable at metadata time; scope + sequence (≤) is the
            # only sound metadata-level bound on what they may hit
            if fkey <= dkey and (dscope is None or dscope == fscope):
                return _DIRTY, 0
        key = _norm_scan_path(f["file_path"])
        if key in dv_dirty:
            return _DIRTY, 0
        if key in dv_minus:
            return _DV_EXACT, dv_minus[key]
        return _CLEAN, 0

    whole_cache: dict[int, bool] = {}

    def whole_match(idx: int, f: dict[str, Any]) -> bool:
        if not filters:
            return True
        if idx not in whole_cache:
            whole_cache[idx] = file_all_rows_match(
                f, filters, fields, spec_map(f)
            )
        return whole_cache[idx]

    states = [state(f) for f in files]

    def nan_free(f: dict[str, Any], info) -> bool:
        if info.type not in ("float", "double"):
            return True
        nan = _count_lookup(f.get("nan_value_counts"), info.field_id)
        return nan == 0

    def meta_value(idx: int, f: dict[str, Any], fn: str, col: str) -> Any:
        """Metadata contribution of one file to one aggregate:
        a value, _SENTINEL_SKIP (provably contributes nothing), or
        _SENTINEL_SCAN."""
        st, minus = states[idx]
        rc = f.get("record_count")
        if fn == "count" and col == "*":
            if st == _DIRTY or rc is None or not whole_match(idx, f):
                return _SENTINEL_SCAN
            return int(rc) - minus
        info = fields[col]
        if st != _CLEAN or not whole_match(idx, f):
            return _SENTINEL_SCAN
        nulls = _count_lookup(f.get("null_value_counts"), info.field_id)
        if fn == "count":
            if rc is None or nulls is None:
                return _SENTINEL_SCAN
            return int(rc) - nulls
        if fn == "sum":
            # raw-file blob (sumstats.py): valid because the file is
            # CLEAN (no deletes) and whole-matching — every raw row is
            # a live matching row.  Values stay UNSCALED ints here;
            # the combine step rescales decimals once.
            m = sum_maps.get(col)
            ent = None if m is None else m.get(_norm_scan_path(f["file_path"]))
            if ent is None:
                return _SENTINEL_SCAN
            unscaled, nonnull = ent
            if nonnull == 0:
                return _SENTINEL_SKIP  # SQL SUM over zero non-null rows
            if unscaled is None:
                return _SENTINEL_SCAN  # malformed blob entry — stay sound
            return int(unscaled)
        side = "lower_bounds" if fn == "min" else "upper_bounds"
        bound = _bound_lookup(f.get(side), info.field_id, info.type)
        if bound is None:
            # no bound: fine iff the column is provably all-NULL (or the
            # file empty) — NULLs never contribute to min/max
            if rc == 0 or (rc is not None and nulls == rc):
                return _SENTINEL_SKIP
            return _SENTINEL_SCAN
        if not _is_exact_bound_type(info.type):
            return _SENTINEL_SCAN  # possibly-truncated; refinement below
        if fn == "max" and not nan_free(f, info):
            # a NaN row outranks the (NaN-free) upper bound
            return _SENTINEL_SCAN
        if fn == "min" and info.type in ("float", "double"):
            nan = _count_lookup(f.get("nan_value_counts"), info.field_id)
            if nan is None or (
                nan is not None
                and rc is not None
                and nulls is not None
                and nan + nulls >= rc
            ):
                # all-NaN file: its min IS NaN under Spark ordering;
                # unknown NaN census can't prove otherwise
                return _SENTINEL_SCAN
        return bound

    def group_key(f: dict[str, Any]) -> tuple | None:
        """The file's group tuple, or None when unknowable (then the
        file must be scanned).  Resolved under the FILE'S OWN spec —
        partition-field names are writer-chosen, so an older spec may
        carry a same-named field with a NON-identity transform whose
        value would silently mis-group (e.g. a truncate[1] prefix
        standing in for the full value)."""
        if not group_by:
            return ()
        part = f.get("partition") or {}
        sm = spec_map(f)
        key = []
        for g in group_by:
            entry = sm.get(fields[g].field_id)
            if not entry or entry.get("transform") != "identity":
                return None
            pname = entry.get("name")
            if pname not in part:
                return None
            key.append(part[pname])
        return tuple(key)

    gkeys = [group_key(f) for f in files]

    # -- split every (file, agg) into metadata value vs scan ---------------
    meta_parts: dict[str, dict[tuple, list[Any]]] = {
        a: {} for _, _, a in aggs
    }
    scan_sets: dict[str, set[int]] = {a: set() for _, _, a in aggs}
    for idx, f in enumerate(files):
        if gkeys[idx] is None or (group_by and f.get("record_count") is None):
            # unknowable group (or group existence) → scan for everything
            for _, _, alias in aggs:
                scan_sets[alias].add(idx)
            continue
        for fn, col, alias in aggs:
            v = meta_value(idx, f, fn, col)
            if v is _SENTINEL_SCAN:
                scan_sets[alias].add(idx)
            elif v is not _SENTINEL_SKIP:
                meta_parts[alias].setdefault(gkeys[idx], []).append(v)

    # -- bounds refinement: drop min/max scan files that provably cannot
    #    contain the extremum ------------------------------------------------
    for fn, col, alias in aggs:
        # the cap argument compares files ACROSS the whole table — under
        # grouping a skip decision would need a per-group cap; scan
        # instead (conservative)
        if fn not in ("min", "max") or not scan_sets[alias] or group_by:
            continue
        info = fields[col]
        cap = None  # an upper bound on the true min / lower bound on max
        for idx, f in enumerate(files):
            st, _ = states[idx]
            rc = f.get("record_count")
            nulls = _count_lookup(f.get("null_value_counts"), info.field_id)
            # cap files must be provably non-empty post-delete/filter:
            # clean, whole-matching, with a known non-null value
            if st != _CLEAN or not whole_match(idx, f):
                continue
            if rc is None or nulls is None or nulls >= rc:
                continue
            side = "upper_bounds" if fn == "min" else "lower_bounds"
            b = _bound_lookup(f.get(side), info.field_id, info.type)
            if b is None or _is_nan(b):
                continue
            if cap is None or (
                _lt(b, cap) if fn == "min" else _lt(cap, b)
            ):
                cap = b
        if cap is None:
            continue
        for idx in sorted(scan_sets[alias]):
            f = files[idx]
            st, _ = states[idx]
            # only delete-free whole-matching files can be skipped: a
            # delete or a partial filter match invalidates bounds-only
            # reasoning about what the file still holds
            if st != _CLEAN or not whole_match(idx, f):
                continue
            side = "lower_bounds" if fn == "min" else "upper_bounds"
            b = _bound_lookup(f.get(side), info.field_id, info.type)
            if b is None or _is_nan(b):
                continue
            if fn == "max" and not nan_free(f, fields[col]):
                continue  # a NaN row would outrank every bound
            beyond = _lt(cap, b) if fn == "min" else _lt(b, cap)
            if beyond:
                scan_sets[alias].discard(idx)

    # -- one residual scan, aggregates gated per-file by a bitmask ---------
    scan_idx = sorted(set().union(*scan_sets.values()))
    scan_idx_set = set(scan_idx)
    scanned_rows: dict[tuple, Any] = {}
    if scan_idx:
        masks = {}
        for bit, (_, _, alias) in enumerate(aggs):
            for idx in scan_sets[alias]:
                p = files[idx]["file_path"]
                masks[p] = masks.get(p, 0) | (1 << bit)
        need_cols = sorted(
            {c for _, c, _ in aggs if c != "*"} | set(group_by)
        )
        struct_names = [f.name for f in schema_to_struct(table.schema).fields]
        df = to_df(
            table,
            spark,
            filters=filters,
            columns=need_cols or struct_names[:1],
            keep_file=True,
            file_subset={files[i]["file_path"] for i in scan_idx},
        )
        from daskberg_spark.iceberg.scan import _attach_path_value

        df = _attach_path_value(
            df, spark, "__file", "__aggmask", sorted(masks.items())
        )
        exprs = []
        for bit, (fn, col, alias) in enumerate(aggs):
            gate = F.col("__aggmask").bitwiseAND(F.lit(1 << bit)) != 0
            target = F.lit(1) if col == "*" else F.col(col)
            guarded = F.when(gate, target)
            if fn == "sum":
                # decimal(38, s) accumulation: a single scan partial
                # cannot overflow it, and the driver combine is exact
                # arbitrary-precision int — never a silent long wrap
                exprs.append(
                    F.sum(
                        guarded.cast(f"decimal(38,{sum_scales[col]})")
                    ).alias(alias)
                )
            else:
                agg_fn = {"count": F.count, "min": F.min, "max": F.max}[fn]
                exprs.append(agg_fn(guarded).alias(alias))
        # group existence: every scanned row is a live matching row
        exprs.append(F.count(F.lit(1)).alias("__exist"))
        if group_by:
            for r in df.groupBy(*group_by).agg(*exprs).collect():
                scanned_rows[tuple(r[g] for g in group_by)] = r
        else:
            scanned_rows[()] = df.agg(*exprs).first()

    # -- group existence from metadata (files the scan never touches) ------
    meta_exist: dict[tuple, int] = {}
    for idx, f in enumerate(files):
        if idx in scan_idx_set or gkeys[idx] is None:
            continue
        st, minus = states[idx]
        rc = f.get("record_count")
        # enforce (not just assume) the invariant every fully-metadata
        # file satisfies: provably whole-matching and delete-exact —
        # a DIRTY or partial-match file must never mint a group row
        if st == _DIRTY or not whole_match(idx, f):
            continue
        if rc is not None:
            live = int(rc) - minus
            if live > 0:
                meta_exist[gkeys[idx]] = meta_exist.get(gkeys[idx], 0) + live

    # -- combine -------------------------------------------------------------
    struct = schema_to_struct(table.schema)
    spark_types = {f.name: f.dataType for f in struct.fields}
    group_keys: set[tuple] = set(meta_exist)
    group_keys.update(
        k for k, r in scanned_rows.items() if (r["__exist"] or 0) > 0
    )
    if not group_by:
        group_keys = {()}  # the global aggregate emits exactly one row

    def none_last(key: tuple) -> tuple:
        return tuple((v is None, v) for v in key)

    out_rows = []
    for gk in sorted(group_keys, key=none_last):
        vals: list[Any] = list(gk)
        srow = scanned_rows.get(gk)
        for fn, col, alias in aggs:
            parts = list(meta_parts[alias].get(gk, []))
            if srow is not None and scan_sets[alias]:
                parts.append(srow[alias])
            if fn == "count":
                vals.append(sum(int(p) for p in parts if p is not None))
            elif fn == "sum":
                # parts: unscaled metadata ints + the scanned Decimal
                # partial (exact exponent -s from decimal(38, s))
                sc = sum_scales[col]
                ctx = decimal.Context(prec=78)
                tot = None
                for p in parts:
                    if p is None:
                        continue
                    u = (
                        int(p.scaleb(sc, ctx))
                        if isinstance(p, decimal.Decimal)
                        else int(p)
                    )
                    tot = u if tot is None else tot + u
                if tot is None:
                    vals.append(None)
                elif sc:
                    # string construction is context-exact
                    vals.append(decimal.Decimal(f"{tot}E-{sc}"))
                else:
                    if abs(tot) > (1 << 63) - 1:
                        raise ValueError(
                            f"sum({col}) = {tot} overflows BIGINT — "
                            "cast the column to decimal first"
                        )
                    vals.append(tot)
            else:
                vals.append(_combine(fn, parts))
        out_rows.append(tuple(vals))
    out_fields = [
        T.StructField(g, spark_types[g], True) for g in group_by
    ]
    for fn, col, alias in aggs:
        if fn == "count":
            typ = T.LongType()
        elif fn == "sum":
            sc = sum_scales[col]
            typ = T.DecimalType(38, sc) if sc else T.LongType()
        else:
            typ = spark_types[col]
        out_fields.append(T.StructField(alias, typ, True))

    table.last_agg_pushdown = {
        "files_planned": len(files),
        "files_scanned": len(scan_idx),
        "meta_files": {
            alias: sum(
                1
                for idx in range(len(files))
                if idx not in scan_sets[alias]
            )
            for _, _, alias in aggs
        },
    }
    if not scan_idx:
        _record_zero_scan(table, filters)
    # JVM-side literal relation (inline(array(struct(...)))): a plain
    # createDataFrame ships the rows through Python workers at a fixed
    # ~0.3-0.5 s — real IO-sized cost for an operator whose whole point
    # is zero IO.  Only for SMALL results: analysis of hundreds of
    # cast(lit(...)) nodes costs more than the Python round-trip
    # (measured 2.2 s at 83 groups × 6 columns), so big grouped answers
    # take the createDataFrame path.
    schema = T.StructType(out_fields)
    if not out_rows or len(out_rows) * len(out_fields) > 64:
        return spark.createDataFrame(out_rows, schema)
    structs = [
        F.struct(
            *[
                F.lit(v).cast(fld.dataType).alias(fld.name)
                for v, fld in zip(row, out_fields)
            ]
        )
        for row in out_rows
    ]
    return spark.range(1).select(F.inline(F.array(*structs)))


IcebergTable.agg_pushdown = agg_pushdown  # type: ignore[attr-defined]


def agg_auto(
    table: IcebergTable,
    spark: SparkSession,
    aggs: list[tuple[str, str, str]],
    filters: Any = None,
    group_by: list[str] | None = None,
) -> DataFrame:
    """One-call aggregate dispatch down the strategy ladder — always
    exact, each rung cheaper than the next:

    1. **Fresh-rollup rewrite** (``rollup.agg_via_rollup``): grouped
       count/sum/min/max answered by re-aggregating a registered
       rollup — O(groups), zero source IO, covers NON-partition group
       columns the per-file pushdown never can.
    2. **Metadata pushdown** (``agg_pushdown``): manifest stats + sum
       blobs + theta NDVs, per-file hybrid with one residual scan.
    3. **Plain scan**: whatever the statistics layer cannot prove —
       float sums, non-identity grouped shapes with no rollup, nested
       columns — runs as an ordinary Catalyst aggregate.

    ``table.last_agg_route`` records which rung answered."""
    group_by = list(group_by or [])
    if group_by:
        from daskberg_spark.iceberg.rollup import agg_via_rollup

        out = agg_via_rollup(table, spark, aggs, group_by, filters=filters)
        if out is not None:
            table.last_agg_route = "rollup"
            return out
    try:
        out = agg_pushdown(table, spark, aggs, filters, group_by or None)
        table.last_agg_route = "pushdown"
        return out
    except ValueError:
        pass  # a shape the statistics layer refuses → ordinary scan
    from daskberg_spark.iceberg.scan import to_df

    need = sorted(
        {c for _, c, _ in aggs if c != "*"} | set(group_by)
    )
    df = to_df(table, spark, columns=need or None, filters=filters)
    fns = {
        "count": F.count,
        "min": F.min,
        "max": F.max,
        "sum": F.sum,
        "approx_count_distinct": F.approx_count_distinct,
    }
    exprs = []
    for fn, col, alias in aggs:
        target = F.lit(1) if col == "*" else F.col(col)
        exprs.append(fns[fn](target).alias(alias))
    out = df.groupBy(*group_by).agg(*exprs) if group_by else df.agg(*exprs)
    table.last_agg_route = "scan"
    return out


IcebergTable.agg_auto = agg_auto  # type: ignore[attr-defined]


def percentile_pushdown(
    table: IcebergTable,
    spark: SparkSession,
    quants: list[tuple[str, float, str]],
) -> DataFrame:
    """One-row DataFrame of ``[(col, p, alias), ...]`` approximate
    percentiles answered from the CURRENT snapshot's equi-depth
    quantile blobs (``quantiles.py``) with ZERO data IO: a ``p`` on a
    stored knot (``i/buckets``) returns the knot itself — an exact
    order statistic whenever the write-time GK sketch ran in exact mode
    (non-null count ≤ its accuracy parameter, matching both
    ``percentile_approx`` and DuckDB's ``quantile_disc``) — and an
    off-knot ``p`` linearly interpolates between the two neighbors
    (documented approximation).  Columns without a covering blob share
    ONE ``percentile_approx`` scan — never a wrong answer from missing
    statistics.  ``column_quantiles`` only surfaces blobs whose
    statistics entry covers the current snapshot, so stale histograms
    route to the scan too.

    Temporal columns decode back from the histogram's rank domain
    (epoch days / micros); int/long answers cast back to long (knots
    are data elements in exact mode).  Whole-table, unfiltered —
    per-file stats cannot split an order statistic, the same reason
    NDV pushdown is whole-table.

    ``table.last_percentile_pushdown`` reports
    ``{"from_stats": [...], "scanned": [...]}``."""
    import datetime as _dt

    fields = table.fields
    seen: set[str] = set()
    for col, p, alias in quants:
        if col not in fields:
            raise ValueError(f"unknown column {col!r}")
        if not (0.0 <= float(p) <= 1.0):
            raise ValueError(f"percentile {p!r} outside [0, 1]")
        if alias in seen:
            raise ValueError(f"duplicate alias {alias!r}")
        seen.add(alias)

    def decode(knot: float, ice_type: str):
        if ice_type == "date":
            return _dt.date(1970, 1, 1) + _dt.timedelta(days=round(knot))
        if ice_type == "timestamp":
            # NTZ: knots are the wall clock's UTC-rendered micros
            # (unix_micros under this engine's UTC sessions) — decode
            # the naive wall verbatim; NTZ driver conversions are
            # wall-pure under any zone (r15)
            return _dt.datetime(1970, 1, 1) + _dt.timedelta(
                microseconds=round(knot)
            )
        if ice_type in ("timestamptz", "timestampz"):
            # instants decode AWARE-UTC so any driver TZ preserves
            # them; naive would re-interpret driver-locally (r15)
            return _dt.datetime(
                1970, 1, 1, tzinfo=_dt.timezone.utc
            ) + _dt.timedelta(microseconds=round(knot))
        if ice_type in ("int", "long"):
            return int(round(knot))
        return float(knot)

    vals: dict[str, Any] = {}
    need_scan: list[tuple[str, float, str]] = []
    for col, p, alias in quants:
        hist = table.column_quantiles(col)
        bounds = (hist or {}).get("bounds") or []
        if len(bounds) < 2:
            need_scan.append((col, float(p), alias))
            continue
        n = len(bounds) - 1
        r = float(p) * n
        lo = min(int(r), n - 1)
        frac = r - lo
        knot = bounds[lo] + frac * (bounds[lo + 1] - bounds[lo])
        vals[alias] = decode(knot, fields[col].type)
    if need_scan:
        from daskberg_spark.iceberg.scan import to_df

        df = to_df(
            table, spark, columns=sorted({c for c, _, _ in need_scan})
        )
        row = df.agg(
            *[
                F.percentile_approx(c, F.lit(p), F.lit(10000)).alias(a)
                for c, p, a in need_scan
            ]
        ).collect()[0]
        for c, _p, a in need_scan:
            v = row[a]
            vals[a] = v
    else:
        _record_zero_scan(table, None)
    table.last_percentile_pushdown = {
        "from_stats": sorted(
            a for _, _, a in quants if (a not in {x[2] for x in need_scan})
        ),
        "scanned": sorted(a for _, _, a in need_scan),
    }
    cols = []
    for col, _p, alias in quants:
        t = fields[col].type
        if t == "date":
            cols.append(F.lit(vals[alias]).cast("date").alias(alias))
        elif t == "timestamp":
            # NTZ: route the WALL CLOCK through an ISO literal —
            # F.lit(naive) would re-interpret it through the driver's
            # system zone before the NTZ cast could see it (r15)
            v = vals[alias]
            cols.append(
                F.lit(None if v is None else v.isoformat())
                .cast("timestamp_ntz")
                .alias(alias)
            )
        elif t in ("timestamptz", "timestampz"):
            cols.append(F.lit(vals[alias]).cast("timestamp").alias(alias))
        elif t in ("int", "long"):
            cols.append(F.lit(vals[alias]).cast("long").alias(alias))
        else:
            cols.append(F.lit(vals[alias]).cast("double").alias(alias))
    return spark.range(1).select(*cols)


IcebergTable.percentile_pushdown = percentile_pushdown  # type: ignore[attr-defined]


def percentile_groupby(
    table: IcebergTable,
    spark: SparkSession,
    quants: list[tuple[str, float, str]],
    group_by: list[str],
) -> DataFrame:
    """PER-GROUP percentile battery — the grouped twin of
    ``percentile_pushdown`` (r12): one row per ``group_by`` tuple with
    ``[(col, p, alias), ...]`` percentiles, answered from the CURRENT
    snapshot's ``daskberg-quantiles-grouped-v1`` blobs
    (``quantiles.write_grouped_quantile_statistics``) with ZERO data
    IO when a blob keyed on EXACTLY these group columns covers every
    requested value column.  This is the dashboard shape the global
    pushdown cannot serve — "p95 latency by day" — made metadata-only
    the way ``agg_pushdown_groupby`` does MIN/MAX.  A ``p`` on a
    stored knot is the group's exact order statistic whenever the
    write-time sketch ran in exact mode (per-group non-null count ≤
    accuracy); off-knot ``p`` interpolates (documented approximation).
    Staleness, a different grouping, or an uncovered column route the
    WHOLE battery to one grouped ``percentile_approx`` scan — never a
    wrong answer from missing statistics.

    ``table.last_percentile_groupby`` reports ``{"route":
    "stats"|"scan", "groups": N}``."""
    import datetime as _dt

    from daskberg_spark.iceberg.conversions import iceberg_to_spark_type
    from daskberg_spark.iceberg.quantiles import decode_group_value

    from daskberg_spark.iceberg.groupkeys import (
        apply_group_keys,
        group_key_base,
        group_key_type,
    )

    fields = table.fields
    ftypes = {n: i.type for n, i in fields.items()}
    if not group_by:
        raise ValueError("group_by must be non-empty — use "
                         "percentile_pushdown for the global battery")
    for g in group_by:
        # derived day()/hour() specs validate through their base (r14)
        if group_key_base(g, ftypes) not in fields:
            raise ValueError(f"unknown group column {g!r}")
    seen: set[str] = set()
    for col, p, alias in quants:
        if col not in fields:
            raise ValueError(f"unknown column {col!r}")
        if not (0.0 <= float(p) <= 1.0):
            raise ValueError(f"percentile {p!r} outside [0, 1]")
        if alias in seen or alias in group_by:
            raise ValueError(f"duplicate alias {alias!r}")
        seen.add(alias)

    def decode(knot: float, ice_type: str):
        if ice_type == "date":
            return _dt.date(1970, 1, 1) + _dt.timedelta(days=round(knot))
        if ice_type == "timestamp":
            # NTZ: knots are the wall clock's UTC-rendered micros
            # (unix_micros under this engine's UTC sessions) — decode
            # the naive wall verbatim; NTZ driver conversions are
            # wall-pure under any zone (r15)
            return _dt.datetime(1970, 1, 1) + _dt.timedelta(
                microseconds=round(knot)
            )
        if ice_type in ("timestamptz", "timestampz"):
            # instants decode AWARE-UTC so any driver TZ preserves
            # them; naive would re-interpret driver-locally (r15)
            return _dt.datetime(
                1970, 1, 1, tzinfo=_dt.timezone.utc
            ) + _dt.timedelta(microseconds=round(knot))
        if ice_type in ("int", "long"):
            return int(round(knot))
        return float(knot)

    def out_type(ice_type: str) -> str:
        if ice_type == "date":
            return "date"
        if ice_type in ("timestamp", "timestamptz", "timestampz"):
            return "timestamp"
        if ice_type in ("int", "long"):
            return "long"
        return "double"

    hists: dict[str, dict] = {}
    for col in {c for c, _, _ in quants}:
        h = table.grouped_column_quantiles(col, group_by)
        if h is None:
            break
        hists[col] = h
    if len(hists) == len({c for c, _, _ in quants}):
        # metadata route: every value column carries a fresh grouped
        # blob keyed on exactly this grouping
        per_col: dict[str, dict[tuple, dict]] = {
            col: {tuple(g["key"]): g for g in h["groups"]}
            for col, h in hists.items()
        }
        keys = sorted(
            {k for m in per_col.values() for k in m},
            key=lambda k: tuple((v is None, v) for v in k),
        )
        rows = []
        for key in keys:
            row = [
                decode_group_value(v, group_key_type(g, ftypes))
                for g, v in zip(group_by, key)
            ]
            for col, p, _alias in quants:
                g = per_col[col].get(key)
                bounds = (g or {}).get("bounds") or []
                if len(bounds) < 2:
                    # an all-NULL (or absent) group has no percentile
                    row.append(
                        decode(bounds[0], fields[col].type)
                        if len(bounds) == 1
                        else None
                    )
                    continue
                n = len(bounds) - 1
                r = float(p) * n
                lo = min(int(r), n - 1)
                frac = r - lo
                knot = bounds[lo] + frac * (bounds[lo + 1] - bounds[lo])
                row.append(decode(knot, fields[col].type))
            rows.append(row)
        schema = T.StructType(
            [
                T.StructField(
                    g, iceberg_to_spark_type(group_key_type(g, ftypes)), True
                )
                for g in group_by
            ]
            + [
                T.StructField(
                    alias,
                    iceberg_to_spark_type(
                        # temporal answers keep the column's OWN tz
                        # semantics (NTZ wall vs LTZ instant, r15)
                        fields[c].type
                        if out_type(fields[c].type) == "timestamp"
                        else {"long": "long", "double": "double",
                              "date": "date"}[out_type(fields[c].type)]
                    ),
                    True,
                )
                for c, _p, alias in quants
            ]
        )
        _record_zero_scan(table, None)
        table.last_percentile_groupby = {"route": "stats", "groups": len(rows)}
        return spark.createDataFrame(rows, schema)

    # scan route: ONE grouped percentile_approx pass, output types
    # matched to the metadata route's so callers see a stable schema
    from daskberg_spark.iceberg.quantiles import _numeric_expr
    from daskberg_spark.iceberg.scan import to_df

    bases = {group_key_base(g, ftypes) for g in group_by}
    df = apply_group_keys(
        to_df(
            table,
            spark,
            columns=sorted(bases | {c for c, _, _ in quants}),
        ),
        group_by,
        ftypes,
    )
    aggs = []
    for col, p, alias in quants:
        t = fields[col].type
        e = F.percentile_approx(
            _numeric_expr(col, t), F.lit(float(p)), F.lit(10000)
        )
        ot = out_type(t)
        if ot == "date":
            e = F.date_add(F.lit("1970-01-01").cast("date"), F.round(e).cast("int"))
        elif ot == "timestamp":
            e = F.timestamp_micros(F.round(e).cast("long"))
            if t == "timestamp":
                # NTZ columns answer NTZ (knots were the UTC-rendered
                # wall; this engine's sessions run UTC), matching the
                # stats route's schema (r15)
                e = e.cast("timestamp_ntz")
        elif ot == "long":
            e = F.round(e).cast("long")
        aggs.append(e.alias(alias))
    out = df.groupBy(*group_by).agg(*aggs)
    table.last_percentile_groupby = {"route": "scan", "groups": -1}
    return out


IcebergTable.percentile_groupby = percentile_groupby  # type: ignore[attr-defined]


def ndv_groupby(
    table: IcebergTable,
    spark: SparkSession,
    col: str,
    group_by: list[str],
    alias: str = "ndv",
) -> DataFrame:
    """PER-GROUP distinct count — "distinct users by day" — answered
    from the CURRENT snapshot's grouped theta blob
    (``theta.write_grouped_theta_statistics``) with ZERO data IO when
    one keys on EXACTLY ``group_by`` and covers ``col`` (r12).  Below
    the sketch's nominal k every group's value is EXACT (the same
    contract the global theta NDV pushdown has); above it, the
    estimate (~1/sqrt(2^lg_k) rsd).  Staleness or a different grouping
    route to one exact ``count_distinct`` scan — missing statistics
    degrade to the honest (costlier) answer, never a stale one.

    ``table.last_ndv_groupby`` reports ``{"route": "stats"|"scan",
    "groups": N, "exact": all-groups-exact}``."""
    from daskberg_spark.iceberg.conversions import iceberg_to_spark_type
    from daskberg_spark.iceberg.groupkeys import (
        apply_group_keys,
        group_key_base,
        group_key_type,
    )

    fields = table.fields
    ftypes = {n: i.type for n, i in fields.items()}
    if not group_by:
        raise ValueError("group_by must be non-empty — use column_ndv / "
                         "agg_pushdown for the global NDV")
    for g in group_by:
        # derived day()/hour() specs validate through their base (r14)
        if group_key_base(g, ftypes) not in fields:
            raise ValueError(f"unknown group column {g!r}")
    if col not in fields:
        raise ValueError(f"unknown column {col!r}")
    payload = table.grouped_column_ndv(col, group_by)
    if payload is not None:
        from daskberg_spark.iceberg.quantiles import decode_group_value

        rows = [
            [
                decode_group_value(v, group_key_type(g, ftypes))
                for g, v in zip(group_by, g_["key"])
            ]
            + [int(g_["ndv"])]
            for g_ in payload.get("groups", [])
        ]
        schema = T.StructType(
            [
                T.StructField(
                    g, iceberg_to_spark_type(group_key_type(g, ftypes)), True
                )
                for g in group_by
            ]
            + [T.StructField(alias, T.LongType(), True)]
        )
        _record_zero_scan(table, None)
        table.last_ndv_groupby = {
            "route": "stats",
            "groups": len(rows),
            "exact": all(
                g.get("exact") for g in payload.get("groups", [])
            ),
        }
        return spark.createDataFrame(rows, schema)
    from daskberg_spark.iceberg.scan import to_df

    bases = {group_key_base(g, ftypes) for g in group_by}
    df = apply_group_keys(
        to_df(table, spark, columns=sorted(bases | {col})),
        group_by,
        ftypes,
    )
    out = df.groupBy(*group_by).agg(
        F.count_distinct(F.col(col)).alias(alias)
    )
    table.last_ndv_groupby = {"route": "scan", "groups": -1, "exact": True}
    return out


IcebergTable.ndv_groupby = ndv_groupby  # type: ignore[attr-defined]


def analyze_table(
    table: IcebergTable,
    spark: SparkSession,
    columns: list[str] | None = None,
) -> DataFrame:
    """ANALYZE TABLE, metadata-first: one row per primitive top-level
    column with ``row_count`` / ``null_count`` / ``ndv`` /
    ``min_value`` / ``max_value`` (stringified for a uniform schema —
    display/catalog use).  Everything routes through the SAME
    ``agg_pushdown`` battery the query path uses, so counts and bounds
    come from manifest statistics wherever the soundness gates allow
    (deletes, NaN, truncated strings, missing stats all degrade to the
    one residual scan) and NDVs come from theta blobs with the HLL
    scan fallback — never a wrong answer from stale or absent
    statistics, merely a slower one."""
    fields = table.fields
    if columns is None:
        columns = [
            n
            for n, info in fields.items()
            if "." not in n
            and not info.type.startswith(("struct", "list", "map"))
            and info.type != "variant"
        ]
    battery: list[tuple[str, str, str]] = [("count", "*", "rows_total")]
    for c in columns:
        battery.append(("count", c, f"cnt {c}"))
        battery.append(("min", c, f"min {c}"))
        battery.append(("max", c, f"max {c}"))
        battery.append(("approx_count_distinct", c, f"ndv {c}"))
    row = agg_pushdown(table, spark, battery).first()

    def s(v: Any) -> str | None:
        return None if v is None else str(v)

    rows = []
    total = int(row["rows_total"])
    for c in columns:
        cnt = row[f"cnt {c}"]
        rows.append(
            (
                c,
                fields[c].type,
                total,
                None if cnt is None else total - int(cnt),
                None if row[f"ndv {c}"] is None else int(row[f"ndv {c}"]),
                s(row[f"min {c}"]),
                s(row[f"max {c}"]),
            )
        )
    return spark.createDataFrame(
        rows,
        "column string, type string, row_count long, null_count long, "
        "ndv long, min_value string, max_value string",
    )


IcebergTable.analyze_table = analyze_table  # type: ignore[attr-defined]
