"""Iceberg type mapping and single-value (bound bytes) serialization.

Reference counterpart: ``/root/reference/daskberg/conversions.py`` (pandas
dtype maps + bound decoding).  This module follows the **Iceberg spec**
("Binary single-value serialization", Appendix D) rather than the
reference, which decodes decimals little-endian where the spec mandates
big-endian two's-complement (SURVEY.md §1.3 ⚠); ints/longs/floats/doubles
and timestamps are little-endian per spec, as validated against the
Spark-written golden table (age 56 → ``b'8\\x00\\x00\\x00'``).

Wrong bound decoding can only weaken pruning, never correctness — the scan
re-applies the full predicate in Spark — but spec-correct decoding is what
makes pruning actually fire on real tables.
"""

from __future__ import annotations

import datetime
import re
import struct
from decimal import Decimal
from typing import Any

from pyspark.sql import types as T

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_DT = datetime.datetime(1970, 1, 1)


def datetime_to_micros(value: "datetime.datetime") -> int:
    """Epoch microseconds via INTEGER arithmetic — the ONE conversion
    shared by bound encoding and the bucket/hour transforms.
    float ``total_seconds()*1e6`` is off by ≥1 µs beyond ~year 2112
    (incl. the common 9999-12-31 sentinel), which flips bucket numbers
    and hour boundaries."""
    if value.tzinfo is not None:
        value = value.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    delta = value - _EPOCH_DT
    return (
        delta.days * 86_400_000_000
        + delta.seconds * 1_000_000
        + delta.microseconds
    )

_DECIMAL_RE = re.compile(r"decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)")
_FIXED_RE = re.compile(r"fixed\[\s*(\d+)\s*\]")


# v3 row-lineage column names — the ONE contract shared by the scan's
# inheritance read (scan.py) and the writer's rewrite materialization
# (writer.py); renaming or extending lineage must change both through
# this tuple.
LINEAGE_COLS = ("_row_id", "_last_updated_sequence_number")


def iceberg_to_spark_type(type_str: str) -> T.DataType:
    """Iceberg primitive type string → Spark DataType (SURVEY §1.3 table)."""
    m = _DECIMAL_RE.fullmatch(type_str)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    if _FIXED_RE.fullmatch(type_str):
        return T.BinaryType()
    try:
        return {
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "date": T.DateType(),
            "time": T.LongType(),  # µs since midnight; Spark has no TimeType
            "timestamp": T.TimestampNTZType(),
            "timestamptz": T.TimestampType(),
            "timestampz": T.TimestampType(),  # reference's spelling
            "string": T.StringType(),
            "uuid": T.StringType(),
            "binary": T.BinaryType(),
            # v3 `unknown`: values are always null and the column is
            # never stored in data files — Spark's void type null-fills
            # on read (the engine's missing-column path)
            "unknown": T.NullType(),
            # v3 `variant`: semi-structured values — Spark 4's native
            # VariantType (parquet stores the spec's metadata/value
            # binary pair; query with variant_get / to_json)
            "variant": T.VariantType(),
            # v3 `geometry`/`geography`: WKB byte passthrough — Spark
            # has no geo type, so the column surfaces as binary (the
            # stored representation per the spec); decode with a geo
            # UDF downstream
            "geometry": T.BinaryType(),
            "geography": T.BinaryType(),
        }[type_str]
    except KeyError:
        if type_str in ("timestamp_ns", "timestamptz_ns"):
            raise NotImplementedError(
                "v3 nanosecond timestamps: Spark's timestamp precision "
                "is microseconds — a silent µs downcast would corrupt "
                "sub-microsecond data; migrate the column or read with "
                "a ns-capable engine"
            ) from None
        raise NotImplementedError(f"iceberg type {type_str!r}") from None


def lift_footer_stats(
    path: str, types: dict[str, str]
) -> tuple[int, int, dict[str, Any], dict[str, Any], dict[str, int], dict[str, int]]:
    """(num_rows, file_size, lowers, uppers, null_counts, nan_counts)
    lifted from one parquet FOOTER — zero data IO.  Per-row-group
    min/max accumulate across the file for every column present in
    ``types`` (the table schema); values are raw Python (encode with
    ``encode_bound``).
    Null counts (→ manifest ``null_value_counts``, spec field 110) lift
    only when EVERY row group reports one for the column — a single
    statless row group makes the file total unknowable, and emitting a
    partial count would let metadata-only DELETE wrongly prove
    no-NULLs.
    Float/double NaN handling (spec field 138; measured writer
    behavior, not wishful convention): parquet-mr — Spark's writer —
    COMPARES NaN greatest, so a chunk holding NaN leaks a literal NaN
    into its ``max``; parquet-cpp/pyarrow SKIPS NaN in min/max and
    leaves no trace.  Therefore: a NaN-valued stat is never lifted as a
    bound (an upper bound of NaN would prune every real match — a
    wrong-answer bug, regression-tested) and marks the column
    NaN-tainted; ``nan == 0`` lifts ONLY for parquet-mr-created files
    whose float/double bounds all lifted as real numbers (mr's ordering
    makes NaN presence visible, so a real max proves a NaN-free
    chunk); other writers get no census, and gt/gtEq pruning stays
    conservative on their floats.  The ONE implementation behind both
    the driver-side ``_footer_entry`` loop and ``add_files_spark``'s
    executor lift, so the two registration paths can never diverge in
    pruning bounds."""
    import os

    import pyarrow.parquet as pq

    try:
        meta = pq.ParquetFile(path).metadata
    except OSError:
        # parquet logical types newer than this pyarrow (e.g. Spark 4's
        # VARIANT annotation) fail at footer-parse time — lift through
        # DuckDB instead (row count exact; min/max for the top-level
        # primitive columns it can compare)
        return _lift_footer_stats_duckdb(path, types)
    names = [meta.schema.column(i).name for i in range(meta.num_columns)]
    is_mr = (meta.created_by or "").startswith("parquet-mr")
    lowers: dict[str, Any] = {}
    uppers: dict[str, Any] = {}
    nulls: dict[str, int] = {}
    unknown_nulls: set[str] = set()
    no_minmax: set[str] = set()
    nan_tainted: set[str] = set()
    for rg in range(meta.num_row_groups):
        for ci in range(meta.num_columns):
            name = names[ci]
            if name not in types:
                continue
            stats = meta.row_group(rg).column(ci).statistics
            if stats is None or stats.null_count is None:
                unknown_nulls.add(name)
            else:
                nulls[name] = nulls.get(name, 0) + stats.null_count
            if stats is None or not stats.has_min_max:
                no_minmax.add(name)
                continue
            try:
                lo, hi = stats.min, stats.max
            except Exception:
                # pyarrow raises ArrowNotImplementedError casting some
                # chunks' stats (seen: an all-NULL FLBA decimal chunk
                # reports has_min_max yet the cast fails) — degrade to
                # boundless, the planner then scans the file
                no_minmax.add(name)
                continue
            if (isinstance(lo, float) and lo != lo) or (
                isinstance(hi, float) and hi != hi
            ):
                nan_tainted.add(name)
                continue
            if name not in lowers or lo < lowers[name]:
                lowers[name] = lo
            if name not in uppers or hi > uppers[name]:
                uppers[name] = hi
    for name in unknown_nulls:
        nulls.pop(name, None)
    for name in nan_tainted:
        lowers.pop(name, None)
        uppers.pop(name, None)
    nans = {
        name: 0
        for name, t in types.items()
        if t in ("float", "double")
        and is_mr
        and name in lowers
        and name not in no_minmax
        and name not in nan_tainted
    }
    return meta.num_rows, os.path.getsize(path), lowers, uppers, nulls, nans


def _lift_footer_stats_duckdb(
    path: str, types: dict[str, str]
) -> tuple[int, int, dict[str, Any], dict[str, Any], dict[str, int]]:
    """``lift_footer_stats`` fallback through DuckDB's parquet footer
    reader, for files whose logical types this pyarrow build cannot
    parse (Spark 4 VARIANT).  Row count is exact; min/max lift only for
    top-level int/long/float/double/string columns (stats come back as
    strings — anything else stays unlifted, which weakens pruning but
    never correctness)."""
    import os

    import duckdb

    con = duckdb.connect()
    n = con.execute(
        "SELECT num_rows FROM parquet_file_metadata(?)", [path]
    ).fetchone()[0]
    casts = {
        "int": int,
        "long": int,
        "float": float,
        "double": float,
        "string": str,
    }
    lowers: dict[str, Any] = {}
    uppers: dict[str, Any] = {}
    for name, lo, hi in con.execute(
        "SELECT path_in_schema, stats_min_value, stats_max_value "
        "FROM parquet_metadata(?)",
        [path],
    ).fetchall():
        conv = casts.get(types.get(name, ""), None)
        if conv is None or lo is None or hi is None:
            continue  # nested leaf, untyped, or no stats
        lo_v, hi_v = conv(lo), conv(hi)
        if name not in lowers or lo_v < lowers[name]:
            lowers[name] = lo_v
        if name not in uppers or hi_v > uppers[name]:
            uppers[name] = hi_v
    # DuckDB's stats view has no per-row-group null counts we trust
    # across formats — leave null_value_counts AND nan_value_counts
    # unlifted (conservative: gt/gtEq on floats keeps such files)
    return int(n), os.path.getsize(path), lowers, uppers, {}, {}


def iceberg_to_arrow_type(t: Any) -> Any:
    """Iceberg type (string or nested JSON dict) → pyarrow DataType —
    what the streaming source needs to null-fill columns added after a
    file was written: the Python Data Source worker hands yielded Arrow
    batches to Spark under the DECLARED source schema, so an untyped
    ``pa.nulls`` (null-type array) where the schema says e.g. double
    fails at read time."""
    import pyarrow as pa

    if isinstance(t, str):
        m = _DECIMAL_RE.fullmatch(t)
        if m:
            return pa.decimal128(int(m.group(1)), int(m.group(2)))
        if _FIXED_RE.fullmatch(t):
            return pa.binary()
        try:
            return {
                "boolean": pa.bool_(),
                "int": pa.int32(),
                "long": pa.int64(),
                "float": pa.float32(),
                "double": pa.float64(),
                "date": pa.date32(),
                "time": pa.int64(),  # µs since midnight (Spark LongType)
                "timestamp": pa.timestamp("us"),
                "timestamptz": pa.timestamp("us", tz="UTC"),
                "timestampz": pa.timestamp("us", tz="UTC"),
                "string": pa.string(),
                "uuid": pa.string(),
                "binary": pa.binary(),
                "unknown": pa.null(),  # v3: always-null column
                "geometry": pa.binary(),  # v3: WKB passthrough
                "geography": pa.binary(),
            }[t]
        except KeyError:
            raise NotImplementedError(f"iceberg type {t!r}") from None
    kind = t["type"]
    if kind == "struct":
        return pa.struct(
            [
                pa.field(
                    f["name"],
                    iceberg_to_arrow_type(f["type"]),
                    nullable=not f.get("required"),
                )
                for f in t["fields"]
            ]
        )
    if kind == "list":
        return pa.list_(iceberg_to_arrow_type(t["element"]))
    if kind == "map":
        return pa.map_(
            iceberg_to_arrow_type(t["key"]), iceberg_to_arrow_type(t["value"])
        )
    raise NotImplementedError(f"iceberg type {t!r}")


def schema_to_struct(schema: dict[str, Any]) -> T.StructType:
    """Iceberg schema JSON (v1 ``fields`` list) → Spark StructType.

    Nested struct/list/map are supported (the reference raises
    NotImplementedError for them, ``conversions.py:46``).
    """

    def conv(t: Any) -> T.DataType:
        if isinstance(t, str):
            return iceberg_to_spark_type(t)
        kind = t["type"]
        if kind == "struct":
            return T.StructType(
                [
                    T.StructField(f["name"], conv(f["type"]), not f.get("required"))
                    for f in t["fields"]
                ]
            )
        if kind == "list":
            return T.ArrayType(conv(t["element"]), not t.get("element-required"))
        if kind == "map":
            return T.MapType(conv(t["key"]), conv(t["value"]), not t.get("value-required"))
        raise NotImplementedError(f"iceberg type {t!r}")

    return T.StructType(
        [
            T.StructField(f["name"], conv(f["type"]), not f.get("required"))
            for f in schema["fields"]
        ]
    )


def decode_bound(value: bytes | None, type_str: str) -> Any:
    """Iceberg single-value binary → Python value (spec Appendix D).

    Used for ``lower_bounds`` / ``upper_bounds`` in manifests and the
    partition-field summaries in the manifest list.
    """
    if value is None:
        return None
    m = _DECIMAL_RE.fullmatch(type_str)
    if m:
        scale = int(m.group(2))
        unscaled = int.from_bytes(value, "big", signed=True)  # spec: big-endian
        return Decimal(unscaled).scaleb(-scale)
    if type_str == "boolean":
        return value != b"\x00"
    if type_str == "int":
        return int.from_bytes(value, "little", signed=True)
    if type_str == "long":
        return int.from_bytes(value, "little", signed=True)
    if type_str == "float":
        return struct.unpack("<f", value)[0]
    if type_str == "double":
        if len(value) == 4:
            # bounds written before a float→double promotion stay 4-byte
            # (int→long needs no case: int.from_bytes is width-agnostic)
            return struct.unpack("<f", value)[0]
        return struct.unpack("<d", value)[0]
    if type_str == "date":
        days = int.from_bytes(value, "little", signed=True)
        return _EPOCH_DATE + datetime.timedelta(days=days)
    if type_str == "time":
        return int.from_bytes(value, "little", signed=True)
    if type_str in ("timestamp", "timestamptz", "timestampz"):
        micros = int.from_bytes(value, "little", signed=True)
        return _EPOCH_DT + datetime.timedelta(microseconds=micros)
    if type_str == "uuid":
        import uuid as _uuid

        if len(value) == 16:
            # spec single-value serialization: 16-byte big-endian
            return str(_uuid.UUID(bytes=value))
        try:
            return str(_uuid.UUID(value.decode("utf-8")))
        except (ValueError, UnicodeDecodeError):
            return value.decode("utf-8", errors="replace")
    if type_str == "string":
        return value.decode("utf-8", errors="replace")
    return value  # binary / fixed: raw


def min_signed_bytes(n: int) -> bytes:
    """Minimal-length big-endian two's-complement encoding (Iceberg spec).

    ``(bit_length+8)//8`` over-allocates exactly when n == -2^(8k-1)
    (e.g. -128 → 2 bytes ``ff80`` instead of the spec's 1-byte ``80``),
    which changes the murmur3 bucket hash and breaks equality pruning
    against spec-compliant writers — round-1 ADVICE transforms.py:92.
    """
    length = max(1, (n.bit_length() + 7) // 8)
    try:
        return n.to_bytes(length, "big", signed=True)
    except OverflowError:  # positive value needing a sign byte, e.g. 128
        return n.to_bytes(length + 1, "big", signed=True)


def encode_bound(value: Any, type_str: str) -> bytes | None:
    """Python value → Iceberg single-value binary (writer/fixture side)."""
    if value is None:
        return None
    m = _DECIMAL_RE.fullmatch(type_str)
    if m:
        scale = int(m.group(2))
        unscaled = int(Decimal(value).scaleb(scale))
        return min_signed_bytes(unscaled)
    if type_str == "boolean":
        return b"\x01" if value else b"\x00"
    if type_str == "int":
        return int(value).to_bytes(4, "little", signed=True)
    if type_str == "long":
        return int(value).to_bytes(8, "little", signed=True)
    if type_str == "float":
        return struct.pack("<f", value)
    if type_str == "double":
        return struct.pack("<d", value)
    if type_str == "date":
        if isinstance(value, datetime.date):
            value = (value - _EPOCH_DATE).days
        return int(value).to_bytes(4, "little", signed=True)
    if type_str == "time":
        return int(value).to_bytes(8, "little", signed=True)
    if type_str in ("timestamp", "timestamptz", "timestampz"):
        if isinstance(value, datetime.datetime):
            value = datetime_to_micros(value)
        return int(value).to_bytes(8, "little", signed=True)
    if type_str in ("string", "uuid"):
        return str(value).encode("utf-8")
    if isinstance(value, bytes):
        return value
    raise NotImplementedError(f"cannot encode {value!r} as {type_str}")


def partition_value_to_python(value: Any, type_str: str) -> Any:
    """Normalize a partition value from the manifest Avro to a Python value.

    In manifest ``partition`` structs, dates arrive as int days and
    timestamps as int micros (Avro logical types we decode as plain ints).
    """
    if value is None:
        return None
    if type_str == "date" and isinstance(value, int):
        return _EPOCH_DATE + datetime.timedelta(days=value)
    if type_str in ("timestamp", "timestamptz", "timestampz") and isinstance(value, int):
        return _EPOCH_DT + datetime.timedelta(microseconds=value)
    m = _DECIMAL_RE.fullmatch(type_str)
    if m and isinstance(value, bytes):
        return decode_bound(value, type_str)
    if type_str == "uuid":
        import uuid as _uuid

        if isinstance(value, bytes) and len(value) == 16:
            return str(_uuid.UUID(bytes=value))  # avro fixed[16]
        if isinstance(value, str):
            try:
                return str(_uuid.UUID(value))  # canonical lowercase
            except ValueError:
                return value
    return value
