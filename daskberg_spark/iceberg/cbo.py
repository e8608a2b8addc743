"""Statistics-driven join planning: the consumer side of the theta NDV
blobs and manifest counts this engine writes.

``write_table_statistics`` gives every column an NDV
(``apache-datasketches-theta-v1``) and manifests carry exact per-file
record counts — exactly what a cost-based optimizer feeds on.  Spark's
own CBO never sees any of it (these scans are assembled DataFrames, not
catalog tables), so multi-join queries over this engine's tables get
Spark's LITERAL join order.  This module reorders them with the
textbook estimator and metadata only:

- ``estimated_rows(table, filters)``: record counts of the PLANNED
  files (manifest pruning already folds partition/stats selectivity
  in), refined by 1/NDV per equality predicate and, per range
  predicate, the equi-depth-histogram CDF when the table carries
  quantile statistics (``quantiles.py``) — the System R 1/3 only as
  the no-histogram fallback.
- join growth for fact ⋈ dim on (fk, dk):
  ``|F| * |D_filtered| / max(ndv(F.fk), ndv(D.dk))`` — the classic
  containment assumption (Selinger; SCALING.md cites the public
  derivation).
- greedy ordering: joins sort by ascending estimated growth factor, so
  the most selective dimension fires first and every later shuffle
  sees the smallest surviving fact.
- dims whose planned bytes fall under ``broadcast_bytes`` get an
  explicit ``F.broadcast`` hint (manifest ``file_size_in_bytes`` —
  the number AQE only learns AFTER a first shuffle).

Inner equi-joins are order-independent, so results are EXACTLY the
unoptimized join's — the oracle pins values while the plan assertions
pin the ordering/broadcasts.  At 100 TB the difference is not the
driver-side ordering cost (microseconds over metadata) but the shuffled
bytes: joining the 0.1%-selective dim first shrinks every downstream
exchange by the same factor.

Reference parity: none — the reference (daskberg) performs no joins at
all; Dask decides everything downstream of its file listing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daskberg_spark.iceberg.metadata import IcebergTable

DEFAULT_BROADCAST_BYTES = 64 << 20


@dataclass
class JoinDim:
    """One dimension side of a star join: ``table`` joined as
    ``fact.<fact_key> == dim.<dim_key>`` after ``filters`` (scan DNF)."""

    table: IcebergTable
    fact_key: str
    dim_key: str
    filters: Any = None
    name: str | None = None

    def label(self) -> str:
        return self.name or self.table.url.rstrip("/").rsplit("/", 1)[-1]


@dataclass
class JoinPlan:
    order: list[str] = field(default_factory=list)
    estimates: dict[str, float] = field(default_factory=dict)
    broadcasts: list[str] = field(default_factory=list)
    sketch_refined: list[str] = field(default_factory=list)
    # dims whose shuffle join was salted on a census-flagged hot fact
    # key (r14) — filled at execution time by cbo_join
    salted: list[str] = field(default_factory=list)


def estimated_rows(table: IcebergTable, filters: Any = None) -> float:
    """Metadata-only cardinality estimate: the MINIMUM of two bounds —
    planned-file record counts (manifest pruning already applied) and
    the NDV-refined total (1/ndv per equality, the classic 1/3 per
    range).  Taking the min, not the product, matters: when the
    planner already pruned to the matching partition, multiplying by
    1/ndv again would double-count the same predicate's selectivity
    (e.g. an identity-partitioned eq filter would come out ndv× too
    small and mis-dispatch ``auto_join``).  Never touches data; an
    estimate of 0 means the planner PROVED emptiness."""
    recs = table.plan_files(filters)
    planned = float(sum(int(f.get("record_count") or 0) for f in recs))
    if planned == 0 or not filters:
        return planned
    sel = 1.0
    # group columns already consumed as a conditional-NDV pin FOR a
    # given column: {col_scored: pins_used} — a mutually-pinned pair
    # (a==x AND b==y with blobs keyed both ways) conditions at most one
    # clause on the other; the second falls to its marginal (advisor)
    ndv_pins_used: dict[str, tuple[str, ...]] = {}
    for clause in _conjuncts(filters):
        col, op, _v = clause
        if op in ("==", "="):
            # selectivity ladder: an EXACT per-group count from a fresh
            # registered rollup beats any estimate (rollup.py), then an
            # exact per-group census from a current-snapshot grouped
            # quantile blob keyed on this column (r13), then NDV's
            # uniform 1/ndv
            try:
                from daskberg_spark.iceberg.rollup import rollup_eq_count

                exact = rollup_eq_count(table, col, _v)
            except Exception:
                exact = None
            if exact is None:
                exact = _grouped_rows_eq_count(table, col, _v)
            if exact is not None:
                total_now = float(
                    sum(
                        int(f.get("record_count") or 0)
                        for f in table.plan_files()
                    )
                )
                sel *= (exact / total_now) if total_now else 0.0
                continue
            # conditional NDV beats the marginal when a co-occurring
            # equality pins a group column and a grouped theta blob
            # keys this column on it: P(col = v | g) = 1/ndv(col | g),
            # which is LARGER than 1/ndv(col) when values nest inside
            # groups — the marginal would under-estimate by the
            # nesting factor and mis-rank the join behind it (r13)
            got = _grouped_ndv_eq_selectivity(
                table,
                col,
                _conjuncts(filters),
                exclude_pins=frozenset(
                    g for g, pins in ndv_pins_used.items() if col in pins
                ),
            )
            if got is not None:
                s, pins = got
                ndv_pins_used[col] = pins
                sel *= s
                continue
            ndv = _safe_ndv(table, col)
            if ndv:
                sel *= 1.0 / ndv
        elif op in ("<", "<=", ">", ">=", "between"):
            # selectivity ladder for ranges: a GROUPED histogram keyed
            # on a co-occurring equality column measures the CONDITIONAL
            # P(range | group) — no independence assumption at all —
            # then the global histogram's marginal CDF, then System R's
            # 1/3: `ts >= now()-1d` on a year of data is ~0.3%
            # selective, and 1/3 would mis-rank every join behind it
            s = _grouped_quantile_selectivity(
                table, col, op, _v, _conjuncts(filters)
            )
            if s is None:
                s = _quantile_selectivity(table, col, op, _v)
            sel *= s if s is not None else (1.0 / 3.0)
    if sel == 1.0:
        return planned  # nothing to refine: skip the unfiltered re-plan
    total = float(
        sum(int(f.get("record_count") or 0) for f in table.plan_files())
    )
    return max(1.0, min(planned, total * sel))


def _conjuncts(filters: Any) -> list[tuple[str, str, Any]]:
    # scan DNF is [[(col, op, v), ...], ...] (OR of ANDs) or a flat
    # conjunction list; selectivity refinement only uses the flat
    # single-branch shape — an OR keeps the conservative planned-rows
    if not filters:
        return []
    first = filters[0]
    if isinstance(first, tuple):
        return list(filters)
    if len(filters) == 1 and isinstance(first, list):
        return list(first)
    return []


def _safe_ndv(table: IcebergTable, col: str) -> int | None:
    try:
        return table.column_ndv(col)
    except Exception:
        return None


def _safe_theta(table: IcebergTable, col: str):
    try:
        return table.column_theta(col)
    except Exception:
        return None


def _quantile_selectivity(
    table: IcebergTable, col: str, op: str, value: Any
) -> float | None:
    """Histogram-measured fraction for a range predicate, or None when
    no histogram / unplaceable value (caller then falls back to 1/3).
    'between' is not a scan-DNF op; it reaches here only from callers
    that pre-split it, so it conservatively declines."""
    if op == "between":
        return None
    try:
        hist = table.column_quantiles(col)
        if hist is None:
            return None
        from daskberg_spark.iceberg.quantiles import (
            range_selectivity,
            value_to_number,
        )

        v = value_to_number(value, table.fields[col].type)
        if v is None:
            return None
        return range_selectivity(hist, op, v)
    except Exception:
        return None


def _grouped_quantile_selectivity(
    table: IcebergTable,
    col: str,
    op: str,
    value: Any,
    conjuncts: list[tuple[str, str, Any]],
) -> float | None:
    """CONDITIONAL range selectivity from a grouped histogram (r12,
    extended r13): when the same conjunction constrains a group column
    and a fresh ``daskberg-quantiles-grouped-v1`` blob keys ``col`` on
    those columns, the groups' own CDFs measure the conditional —
    composing with the group clause's own selectivity multiplicatively
    WITHOUT the independence assumption the marginal histogram needs.
    Three ladder rungs, most specific first:

    - TWO equality pins (``g1 == v1 AND g2 == v2``) with a blob keyed
      on both (either order): the joint group's CDF —
      P(col <op> v | g1, g2) — catches correlations neither
      single-column conditional can see.
    - one equality pin: the matching group's CDF (r12).
    - a RANGE pin on a group column (``g >= gv``): the per-group
      conditionals of the satisfying groups, weighted by group row
      counts — Σ rows_g·P(col <op> v | g) / Σ rows_g.

    None when no grouped blob applies, a pinned key is absent (a
    provably-empty conjunction is indistinguishable from a
    key-encoding mismatch, so never hard-zero), or a group key can't
    be placed on the rank domain — the caller falls to the marginal
    CDF, then 1/3.  Estimates only; results never depend on this."""
    if op == "between":
        return None
    try:
        from daskberg_spark.iceberg.planner import normalize_value
        from daskberg_spark.iceberg.quantiles import (
            _encode_group_value,
            decode_group_value,
            range_selectivity,
            value_to_number,
        )

        v = value_to_number(value, table.fields[col].type)
        if v is None:
            return None
        eq_pins = [
            (g, gv)
            for g, gop, gv in conjuncts
            if gop in ("==", "=") and g != col and g in table.fields
        ]
        # (1) two-column pins: a blob keyed on the exact pair wins
        for i, (g1, v1) in enumerate(eq_pins):
            for j, (g2, v2) in enumerate(eq_pins):
                if i == j:
                    continue
                hist = table.grouped_column_quantiles(col, [g1, g2])
                if hist is None:
                    continue
                key = [
                    _encode_group_value(
                        normalize_value(v1, table.fields[g1].type),
                        table.fields[g1].type,
                    ),
                    _encode_group_value(
                        normalize_value(v2, table.fields[g2].type),
                        table.fields[g2].type,
                    ),
                ]
                for grp in hist.get("groups", []):
                    if grp.get("key") == key:
                        s = range_selectivity(grp, op, v)
                        if s is not None:
                            return s
        # (1.5) equality pin + RANGE pin with a blob keyed on the pair
        # (either order, r14): row-weighted conditionals over the
        # groups whose eq-key matches the pin and whose range-key
        # satisfies the range — P(col <op> v | g1 = v1, g2 in range)
        # with no independence assumption.  Previously this shape fell
        # to the single-eq rung, ignoring the range's interaction.
        range_pins = [
            (g, gop2, gv)
            for g, gop2, gv in conjuncts
            if gop2 in ("<", "<=", ">", ">=")
            and g != col
            and g in table.fields
        ]
        for g1, v1 in eq_pins:
            for g2, gop2, gv2 in range_pins:
                if g2 == g1:
                    continue
                for keyed in ([g1, g2], [g2, g1]):
                    hist = table.grouped_column_quantiles(col, keyed)
                    if hist is None:
                        continue
                    eq_idx = keyed.index(g1)
                    rng_idx = 1 - eq_idx
                    ekey = _encode_group_value(
                        normalize_value(v1, table.fields[g1].type),
                        table.fields[g1].type,
                    )
                    gtype = table.fields[g2].type
                    gn = value_to_number(gv2, gtype)
                    if gn is None:
                        continue
                    num = den = 0.0
                    placeable = True
                    for grp in hist.get("groups", []):
                        k = grp.get("key") or [None, None]
                        if k[eq_idx] != ekey:
                            continue
                        if k[rng_idx] is None:
                            continue  # NULL never satisfies a range
                        kn = value_to_number(
                            decode_group_value(k[rng_idx], gtype), gtype
                        )
                        if kn is None:
                            placeable = False
                            break  # string keys: decline this rung
                        if not _num_cmp(kn, gop2, gn):
                            continue
                        s = range_selectivity(grp, op, v)
                        if s is None:
                            continue
                        rows_g = float(grp.get("rows") or 0)
                        num += rows_g * s
                        den += rows_g
                    if placeable and den > 0:
                        return num / den
                    # eq key absent / nothing satisfies: key-encoding
                    # caveat — fall to lower rungs, never hard-zero
        # (2) single equality pin (r12)
        for g, gv in eq_pins:
            hist = table.grouped_column_quantiles(col, [g])
            if hist is None:
                continue
            key = _encode_group_value(
                normalize_value(gv, table.fields[g].type),
                table.fields[g].type,
            )
            for grp in hist.get("groups", []):
                if (grp.get("key") or [None])[0] == key:
                    return range_selectivity(grp, op, v)
            # pinned group absent from the blob: USUALLY a provably-
            # empty conjunction, but a key-encoding mismatch between
            # the filter literal and the stored JSON key would look
            # identical — hard-zeroing the estimate on that would
            # mis-rank joins the opposite way this feature intends, so
            # fall through to the marginal CDF (estimates only)
            return None
        # (3) range pin on a group column: row-weighted conditionals
        for g, gop, gv in conjuncts:
            if (
                gop not in ("<", "<=", ">", ">=")
                or g == col
                or g not in table.fields
            ):
                continue
            hist = table.grouped_column_quantiles(col, [g])
            if hist is None:
                continue
            gtype = table.fields[g].type
            gn = value_to_number(gv, gtype)
            if gn is None:
                continue
            num = den = 0.0
            placeable = True
            for grp in hist.get("groups", []):
                k0 = (grp.get("key") or [None])[0]
                if k0 is None:
                    continue  # NULL group keys never satisfy a range
                kn = value_to_number(decode_group_value(k0, gtype), gtype)
                if kn is None:
                    placeable = False
                    break  # string keys etc.: decline the whole rung
                if not _num_cmp(kn, gop, gn):
                    continue
                s = range_selectivity(grp, op, v)
                if s is None:
                    continue
                rows_g = float(grp.get("rows") or 0)
                num += rows_g * s
                den += rows_g
            if placeable and den > 0:
                return num / den
    except Exception:
        return None
    return None


def _grouped_rows_eq_count(
    table: IcebergTable, col: str, value: Any
) -> float | None:
    """EXACT row count for ``col == value`` from a CURRENT-snapshot
    grouped quantile blob keyed on ``[col]`` (r13): the blob's groups
    carry exact per-group row censuses, so an equality pin on the
    GROUP column itself reads the true count — skew-proof where the
    uniform 1/ndv model is worst (a 90/10 group split scores 0.9/0.1,
    not 0.5/0.5).  None when no blob keys on exactly ``[col]``, the
    pinned key is absent (key-encoding caveat: never hard-zero), or
    anything fails — estimates only."""
    import json as _json

    try:
        from daskberg_spark.iceberg.planner import normalize_value
        from daskberg_spark.iceberg.puffin import read_blob
        from daskberg_spark.iceberg.quantiles import (
            GROUPED_QUANTILE_BLOB_TYPE,
            _encode_group_value,
        )

        key = _encode_group_value(
            normalize_value(value, table.fields[col].type),
            table.fields[col].type,
        )
        cur = table.current_snapshot["snapshot-id"]
        for e in table.metadata.get("statistics", []):
            if e["snapshot-id"] != cur:
                continue
            for b in e.get("blob-metadata", []):
                if b.get("type") != GROUPED_QUANTILE_BLOB_TYPE:
                    continue
                try:
                    payload = _json.loads(
                        read_blob(table._relocate(e["statistics-path"]), b)
                    )
                except (ValueError, OSError):
                    continue
                if payload.get("group_cols") != [col]:
                    continue
                for grp in payload.get("groups", []):
                    if (grp.get("key") or [None])[0] == key:
                        return float(grp.get("rows") or 0)
                return None  # key absent: fall through to NDV ladder
    except Exception:
        return None
    return None


def _grouped_ndv_eq_selectivity(
    table: IcebergTable,
    col: str,
    conjuncts: list[tuple[str, str, Any]],
    exclude_pins: frozenset[str] = frozenset(),
) -> tuple[float, str] | None:
    """CONDITIONAL equality selectivity from a grouped theta blob
    (r13, the equality twin of ``_grouped_quantile_selectivity``):
    when the conjunction pins a group column (``g == gv``) and a fresh
    ``daskberg-theta-grouped-v1`` blob keys ``col`` on ``[g]``, the
    matching group's NDV measures P(col = v | g = gv) = 1/ndv(col|g).
    None when no blob applies or the pinned key is absent (a
    key-encoding mismatch must fall to the marginal, never hard-zero).
    ``exclude_pins`` skips group columns whose clause already
    conditioned on ``col`` — two mutually-pinned equalities scoring
    1/ndv(a|b) · 1/ndv(b|a) would estimate ~1.0 on nested columns,
    the opposite mis-rank of the independence model this rung replaces
    (r13 advisor); the caller lets the second clause fall to its
    marginal.  Two rungs, most specific first (r14): a blob keyed on
    a PAIR of pinned columns (either order) measures
    1/ndv(col | g1, g2) — tighter than any single conditional when
    values nest inside the joint grouping; then the single-column
    rung.  Returns ``(selectivity, pin_columns_tuple)``; estimates
    only."""
    try:
        from daskberg_spark.iceberg.planner import normalize_value
        from daskberg_spark.iceberg.quantiles import _encode_group_value

        def enc(gv, g):
            return _encode_group_value(
                normalize_value(gv, table.fields[g].type),
                table.fields[g].type,
            )

        eq_pins = [
            (g, gv)
            for g, gop, gv in conjuncts
            if gop in ("==", "=")
            and g != col
            and g not in exclude_pins
            and g in table.fields
        ]
        # (1) two pinned columns with a pair-keyed blob (r14)
        for i, (g1, v1) in enumerate(eq_pins):
            for j, (g2, v2) in enumerate(eq_pins):
                if i == j:
                    continue
                payload = table.grouped_column_ndv(col, [g1, g2])
                if payload is None:
                    continue
                key = [enc(v1, g1), enc(v2, g2)]
                for grp in payload.get("groups", []):
                    if grp.get("key") == key:
                        ndv = int(grp.get("ndv") or 0)
                        if ndv > 0:
                            return (1.0 / ndv, (g1, g2))
                # key absent from the pair blob: key-encoding caveat —
                # fall to the single rung, never hard-zero
        # (2) one pinned column (r13)
        for g, gv in eq_pins:
            payload = table.grouped_column_ndv(col, [g])
            if payload is None:
                continue
            key = enc(gv, g)
            for grp in payload.get("groups", []):
                if (grp.get("key") or [None])[0] == key:
                    ndv = int(grp.get("ndv") or 0)
                    return (1.0 / ndv, (g,)) if ndv > 0 else None
            return None
    except Exception:
        return None
    return None


def _num_cmp(a: float, op: str, b: float) -> bool:
    if op == "<":
        return a < b
    if op == "<=":
        return a <= b
    if op == ">":
        return a > b
    return a >= b


def plan_star_join(
    fact: IcebergTable,
    dims: list[JoinDim],
    fact_filters: Any = None,
    broadcast_bytes: int = DEFAULT_BROADCAST_BYTES,
) -> JoinPlan:
    """Greedy star-join ordering from metadata: each dim's growth
    factor is ``|D_filtered| / max(ndv(F.fk), ndv(D.dk))`` (the factor
    it multiplies the surviving fact by under containment); joins run
    ascending, ties broken by label for determinism."""
    labels = [d.label() for d in dims]
    if len(set(labels)) != len(labels):
        # two dims resolving to one label would silently drop one join
        # and run the other twice (by_label/plan.order key on labels) —
        # wrong results, so refuse and ask for explicit names
        raise ValueError(
            f"duplicate join labels {sorted(labels)}; joining one table "
            "twice (or two same-named tables) needs distinct "
            "JoinDim(name=...) values"
        )
    plan = JoinPlan()
    fact_rows = estimated_rows(fact, fact_filters)
    scored: list[tuple[float, str]] = []
    for d in dims:
        # ONE metadata plan per dim: rows and bytes come from the same
        # planned record list (plan_files re-runs manifest pruning)
        recs = d.table.plan_files(d.filters)
        d_rows = float(sum(int(f.get("record_count") or 0) for f in recs))
        d_bytes = sum(int(f.get("file_size_in_bytes") or 0) for f in recs)
        if d_rows and d.filters:
            d_rows = min(d_rows, estimated_rows(d.table, d.filters))
        ndv_f = _safe_ndv(fact, d.fact_key)
        ndv_d = _safe_ndv(d.table, d.dim_key) or max(1.0, d_rows)
        denom = float(max(ndv_f or 0, ndv_d or 0)) or 1.0
        growth = d_rows / denom
        # sketch refinement: with theta sketches on BOTH key columns and
        # NEITHER side filtered (the sketches then cover exactly what
        # joins — a filtered fact's surviving keys may overlap the dim
        # very differently from the whole table's), the measured key
        # overlap |F.fk ∩ D.dk| replaces the containment assumption —
        # output/|F| = (overlap/ndv_F) · (rows-per-key of D).  Tighter
        # exactly where containment is worst: barely-overlapping key
        # ranges score near zero instead of 1.0.
        if not d.filters and not fact_filters and ndv_f:
            sk_f = _safe_theta(fact, d.fact_key)
            sk_d = _safe_theta(d.table, d.dim_key)
            if sk_f is not None and sk_d is not None:
                overlap = sk_f.intersect(sk_d).estimate()
                refined = (overlap / max(1.0, float(ndv_f))) * (
                    d_rows / max(1.0, float(ndv_d))
                )
                if refined < growth:
                    growth = refined
                    plan.sketch_refined.append(d.label())
        scored.append((growth, d.label()))
        plan.estimates[d.label()] = growth
        if d_bytes <= broadcast_bytes:
            plan.broadcasts.append(d.label())
    plan.order = [label for _, label in sorted(scored)]
    plan.estimates["__fact_rows__"] = fact_rows
    return plan


def auto_join(
    spark: SparkSession,
    fact: IcebergTable,
    dim: JoinDim,
    fact_filters: Any = None,
    max_keys: int = 1000,
    bloom_max_rows: int = 5_000_000,
    how: str = "inner",
) -> DataFrame:
    """One fact ⋈ dim join with the acceleration CHOSEN FROM METADATA —
    the dispatch real engines bury in their optimizer:

    - estimated dim rows ≤ ``max_keys``: ``join_pruned_df`` — exact dim
      keys reach the fact PLANNER, whole files drop before any IO;
    - ≤ ``bloom_max_rows``: ``bloom_join`` — a fixed-size Bloom
      prefilter drops non-candidates inside codegen before the shuffle
      (driver state m/64 words regardless of key count);
    - above that: the plain shuffle join (a prefilter whose build side
      rivals the fact is pure overhead).

    All three strategies are result-identical for inner/semi joins;
    LEFT OUTER (r15 — the flavor curation enrich joins use) is also
    accepted but routes ONLY through the fact-preserving strategies
    (salted/plain shuffle): key-pruning and Bloom prefilters drop
    fact rows a left join must keep.  Anything else is refused.  The
    choice costs one metadata estimate and is recorded as
    ``fact.last_join_strategy``."""
    import daskberg_spark.iceberg.scan as _scan

    left = how in _SALTED_LEFT
    if not left and how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            "auto_join is sound for inner/semi/left joins only"
        )
    est = estimated_rows(dim.table, dim.filters)
    dim_df = dim.table.to_df(spark, filters=dim.filters)
    if not left and est <= max_keys:
        strategy = "key-prune"
        out = _scan.join_pruned_df(
            fact,
            spark,
            dim_df,
            dim.fact_key,
            dim.dim_key,
            filters=fact_filters,
            max_keys=max_keys,
            how=how,
        )
    else:
        fact_df = fact.to_df(spark, filters=fact_filters)
        if not left and est <= bloom_max_rows:
            from daskberg_spark.operators.bloomjoin import bloom_join

            strategy = "bloom-prefilter"
            out = bloom_join(
                fact_df, dim_df, dim.fact_key, dim.dim_key, how=how
            )
        else:
            # census-driven skew salting (r14): when the fact carries a
            # current-snapshot per-key row census flagging a hot key,
            # fix the partitioning BEFORE the first lopsided exchange
            # materializes instead of waiting for AQE's runtime split
            hot = skewed_join_keys(fact, dim.fact_key)
            if hot:
                strategy = "salted-shuffle"
                widths = skewed_join_widths(spark, fact, dim.fact_key)
                fact.last_skewed_keys = hot  # type: ignore[attr-defined]
                fact.last_skew_widths = widths  # type: ignore[attr-defined]
                out = salted_join(
                    spark,
                    fact_df,
                    dim_df,
                    dim.fact_key,
                    dim.dim_key,
                    hot,
                    how=how,
                    widths=widths,
                )
            else:
                strategy = "shuffle"
                out = fact_df.join(
                    dim_df,
                    fact_df[dim.fact_key] == dim_df[dim.dim_key],
                    how,
                )
    fact.last_join_strategy = strategy  # type: ignore[attr-defined]
    return out


def cbo_join(
    spark: SparkSession,
    fact: IcebergTable,
    dims: list[JoinDim],
    fact_filters: Any = None,
    broadcast_bytes: int = DEFAULT_BROADCAST_BYTES,
) -> DataFrame:
    """INNER star join executed in the statistics-chosen order with
    explicit broadcast hints for metadata-small dims.  Results are
    bit-identical to any other order (inner equi-joins commute); the
    payoff is every intermediate exchange carrying the most-filtered
    fact available.  The chosen plan is recorded on the fact table as
    ``fact.last_join_plan`` for tests and observability."""
    import daskberg_spark.iceberg.scan  # noqa: F401  (attaches .to_df)

    plan = plan_star_join(fact, dims, fact_filters, broadcast_bytes)
    fact.last_join_plan = plan  # type: ignore[attr-defined]
    by_label = {d.label(): d for d in dims}
    fact_df = fact.to_df(spark, filters=fact_filters)
    out = fact_df
    for label in plan.order:
        d = by_label[label]
        dim_df = d.table.to_df(spark, filters=d.filters)
        if label in plan.broadcasts:
            dim_df = F.broadcast(dim_df)
        # Resolve the fact key against the ORIGINAL fact DataFrame
        # (expression-id resolution), not the running join output:
        # out[d.fact_key] raises AMBIGUOUS_REFERENCE once an earlier dim
        # carries a same-named column (e.g. fact_key == dim_key).
        if label not in plan.broadcasts:
            # census-driven skew salting for the SHUFFLE legs (r14):
            # a broadcast join has no lopsided exchange to fix, but a
            # non-broadcast dim shuffles the fact on the key — split a
            # census-flagged hot key's partition in the plan
            hot = skewed_join_keys(fact, d.fact_key)
            if hot:
                plan.salted.append(label)
                out = salted_join(
                    spark,
                    out,
                    dim_df,
                    d.fact_key,
                    d.dim_key,
                    hot,
                    fact_key_col=fact_df[d.fact_key],
                    widths=skewed_join_widths(spark, fact, d.fact_key),
                )
                continue
        out = out.join(
            dim_df, on=fact_df[d.fact_key] == dim_df[d.dim_key], how="inner"
        )
    return out


def _skewed_census(
    table: IcebergTable,
    key: str,
    skew_fraction: float = 0.2,
    max_keys: int = 16,
) -> tuple[dict, float] | None:
    """``({hot_key: exact_rows}, total_rows)`` for join keys whose
    census share exceeds ``skew_fraction``, read from a
    CURRENT-snapshot grouped quantile blob keyed on ``[key]`` — the
    per-group row censuses that power the skew-exact equality
    estimate.  None when no census blob applies.  At most
    ``max_keys`` keys (the list becomes a broadcast literal); NULL
    keys never flag (joins drop them).  Metadata-only;
    estimates-grade: a stale census only mis-chooses the salting,
    never the result (r14)."""
    import json as _json

    try:
        from daskberg_spark.iceberg.puffin import read_blob
        from daskberg_spark.iceberg.quantiles import (
            GROUPED_QUANTILE_BLOB_TYPE,
            decode_group_value,
        )

        cur = table.current_snapshot["snapshot-id"]
        ktype = table.fields[key].type
        for e in table.metadata.get("statistics", []):
            if e["snapshot-id"] != cur:
                continue
            for b in e.get("blob-metadata", []):
                if b.get("type") != GROUPED_QUANTILE_BLOB_TYPE:
                    continue
                try:
                    payload = _json.loads(
                        read_blob(table._relocate(e["statistics-path"]), b)
                    )
                except (ValueError, OSError):
                    continue
                if payload.get("group_cols") != [key]:
                    continue
                groups = payload.get("groups", [])
                total = float(sum(g.get("rows") or 0 for g in groups))
                if total <= 0:
                    return None
                hot = sorted(
                    (
                        (float(g.get("rows") or 0), (g.get("key") or [None])[0])
                        for g in groups
                        if (g.get("key") or [None])[0] is not None
                    ),
                    reverse=True,
                )
                out = {
                    decode_group_value(k, ktype): rows
                    for rows, k in hot[:max_keys]
                    if rows / total >= skew_fraction
                }
                return (out, total) if out else None
    except Exception:
        return None
    return None


def skewed_join_keys(
    table: IcebergTable,
    key: str,
    skew_fraction: float = 0.2,
    max_keys: int = 16,
) -> list | None:
    """The census-flagged hot join keys alone — see
    ``_skewed_census`` for semantics."""
    census = _skewed_census(table, key, skew_fraction, max_keys)
    return list(census[0]) if census else None


def skewed_join_widths(
    spark: SparkSession,
    table: IcebergTable,
    key: str,
    skew_fraction: float = 0.2,
    max_keys: int = 16,
    max_salt: int | None = None,
) -> dict | None:
    """Census-PROPORTIONAL salt widths (r15): the census knows each
    hot key's exact row count, so its partition splits as wide as its
    weight demands — ``ceil(key_rows / target)`` where target is the
    average shuffle-partition load (``total / shuffle.partitions``),
    clamped to [2, shuffle.partitions].  A 50%-of-table key splits to
    ~half the partitions; a barely-over-threshold key splits 2-ways
    instead of a fixed 8 (dim replication is per-copy cost — width
    should be earned).  None when no census applies."""
    import math

    census = _skewed_census(table, key, skew_fraction, max_keys)
    if not census:
        return None
    hot, total = census
    try:
        parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except Exception:
        parts = 200
    parts = max(2, parts)
    if max_salt is None:
        max_salt = parts
    target = max(1.0, total / parts)
    return {
        k: max(2, min(int(max_salt), math.ceil(rows / target)))
        for k, rows in hot.items()
    }


_SALTED_SEMI = ("semi", "left_semi", "leftsemi")
_SALTED_ANTI = ("anti", "left_anti", "leftanti")
_SALTED_LEFT = ("left", "left_outer", "leftouter")
_SALTED_JOIN_HOWS = ("inner",) + _SALTED_SEMI + _SALTED_ANTI + _SALTED_LEFT


def salted_join(
    spark: SparkSession,
    fact_df: Any,
    dim_df: Any,
    fact_key: str,
    dim_key: str,
    skewed_keys: list,
    salt: int = 8,
    how: str = "inner",
    fact_key_col: Any = None,
    widths: dict | None = None,
) -> Any:
    """Split-and-salt equi-join for census-flagged hot keys (r14):
    fact rows carrying a skewed key draw a uniform salt in [0, width)
    and the dim replicates that key ``width`` ways, so the hot key's
    shuffle partition splits ``width`` ways instead of landing on one
    reducer; every other row keeps salt 0 with a single dim copy.
    ``widths`` (r15, from ``skewed_join_widths``) sizes each key's
    split to its census weight; absent, every skewed key uses the
    uniform ``salt``.

    Result-identical to the plain join ONLY for fact-preserving
    flavors — inner, left semi/anti, and left outer (every fact row
    meets exactly one copy of each matching dim key, and an unmatched
    fact row null-extends exactly once because NO copy matches it).
    A right or full outer join would emit the replicated dim copies
    of unmatched skewed keys as duplicate null-extended rows, so
    those flavors are REFUSED here rather than silently corrupted
    (r14 verdict nit).  Complements AQE's runtime skew split by
    fixing the partitioning BEFORE the first lopsided exchange
    materializes."""
    if how not in _SALTED_JOIN_HOWS:
        raise ValueError(
            f"salted_join is result-identical only for fact-preserving "
            f"joins {sorted(set(_SALTED_JOIN_HOWS))} — not {how!r}"
        )
    w = {k: int(widths.get(k, salt)) if widths else int(salt)
         for k in skewed_keys}
    # an explicit fact-key Column supports mid-chain star use, where
    # the running join output may already carry a same-named dim
    # column (expression-id resolution, like cbo_join's joins)
    kcol = fact_key_col if fact_key_col is not None else F.col(fact_key)
    fsalt = F.when(F.lit(False), F.lit(0))
    dsalt = F.when(F.lit(False), F.array(F.lit(0)))
    for k, wk in w.items():
        fsalt = fsalt.when(
            kcol == F.lit(k),
            F.pmod(
                F.xxhash64(F.monotonically_increasing_id()), F.lit(wk)
            ).cast("int"),
        )
        dsalt = dsalt.when(
            F.col(dim_key) == F.lit(k),
            F.sequence(F.lit(0), F.lit(wk - 1)),
        )
    fact_salted = fact_df.withColumn("__fsalt", fsalt.otherwise(F.lit(0)))
    dim_salted = dim_df.withColumn(
        "__dsalt", F.explode(dsalt.otherwise(F.array(F.lit(0))))
    )
    out = fact_salted.join(
        dim_salted,
        (kcol == dim_salted[dim_key])
        & (fact_salted["__fsalt"] == dim_salted["__dsalt"]),
        how,
    )
    if how in _SALTED_SEMI + _SALTED_ANTI:
        return out.drop("__fsalt")
    return out.drop("__fsalt", "__dsalt")
