"""Variant binary encoding — the open format Spark 4's ``VariantType``
stores in parquet (Parquet project ``VariantEncoding.md``; Iceberg v3
adopts the same encoding for its ``variant`` type).

From-scratch encoder/decoder so the DRIVER-SIDE writer can emit variant
columns (pyarrow has no variant type — data lands as the spec's
``struct<metadata: binary, value: binary>`` physical pair, which Spark's
vectorized reader lifts back to VariantType).  Supported value shapes:
``None`` / ``bool`` / ``int`` (int8..int64 minimal width) / ``float``
(double) / ``str`` / ``bytes`` / ``list`` / ``dict`` — the JSON-ish
subset a pipeline writes through ``parse_json`` anyway.  Unsupported
python types fail loudly.

Verified against Spark itself: ``test_variant_encoding_spark_roundtrip``
writes encoder output to parquet and compares ``to_json`` /
``variant_get`` with Spark's own ``parse_json`` of the same payload.
"""
from __future__ import annotations

import struct
from typing import Any

_VERSION = 1

# primitive type_info values (basic_type 0)
_P_NULL = 0
_P_TRUE = 1
_P_FALSE = 2
_P_INT8 = 3
_P_INT16 = 4
_P_INT32 = 5
_P_INT64 = 6
_P_DOUBLE = 7
_P_BINARY = 15
_P_STRING = 16


def _uint(value: int, size: int) -> bytes:
    return value.to_bytes(size, "little")


def _offset_size(max_value: int) -> int:
    for size in (1, 2, 3):
        if max_value < (1 << (8 * size)):
            return size
    return 4


def _collect_keys(value: Any, keys: set[str]) -> None:
    if isinstance(value, dict):
        for k, v in value.items():
            if not isinstance(k, str):
                # str()-coercion could collide two keys into one
                # spec-forbidden duplicate field name (or crash the
                # sort on tied coerced keys) — fail loudly instead
                raise ValueError(
                    f"variant object keys must be strings, got {k!r}"
                )
            keys.add(k)
            _collect_keys(v, keys)
    elif isinstance(value, (list, tuple)):
        for v in value:
            _collect_keys(v, keys)


def build_metadata(keys: list[str]) -> bytes:
    """Metadata dictionary: header byte (version | sorted | offset
    size), dictionary size, offsets, utf8 bytes.  Keys must already be
    sorted (the encoder always sorts → ``sorted_strings`` set, enabling
    readers' binary search)."""
    encoded = [k.encode("utf-8") for k in keys]
    total = sum(len(b) for b in encoded)
    osz = _offset_size(total)
    header = _VERSION | (1 << 4) | ((osz - 1) << 6)
    out = bytearray([header])
    out += _uint(len(encoded), osz)
    off = 0
    for b in encoded:
        out += _uint(off, osz)
        off += len(b)
    out += _uint(off, osz)
    for b in encoded:
        out += b
    return bytes(out)


def _encode_value(value: Any, key_id: dict[str, int]) -> bytes:
    if value is None:
        return bytes([(_P_NULL << 2) | 0])
    if value is True:
        return bytes([(_P_TRUE << 2) | 0])
    if value is False:
        return bytes([(_P_FALSE << 2) | 0])
    if isinstance(value, int):
        for tinfo, fmt, lo, hi in (
            (_P_INT8, "<b", -(1 << 7), 1 << 7),
            (_P_INT16, "<h", -(1 << 15), 1 << 15),
            (_P_INT32, "<i", -(1 << 31), 1 << 31),
            (_P_INT64, "<q", -(1 << 63), 1 << 63),
        ):
            if lo <= value < hi:
                return bytes([(tinfo << 2) | 0]) + struct.pack(fmt, value)
        raise ValueError(f"int out of int64 range: {value}")
    if isinstance(value, float):
        return bytes([(_P_DOUBLE << 2) | 0]) + struct.pack("<d", value)
    if isinstance(value, str):
        b = value.encode("utf-8")
        if len(b) < 64:  # short string: length rides in type_info
            return bytes([(len(b) << 2) | 1]) + b
        return (
            bytes([(_P_STRING << 2) | 0]) + struct.pack("<I", len(b)) + b
        )
    if isinstance(value, bytes):
        return (
            bytes([(_P_BINARY << 2) | 0]) + struct.pack("<I", len(value)) + value
        )
    if isinstance(value, (list, tuple)):
        items = [_encode_value(v, key_id) for v in value]
        total = sum(len(b) for b in items)
        osz = _offset_size(total)
        large = len(items) > 255
        header = ((int(large) << 2) | (osz - 1)) << 2 | 3
        out = bytearray([header])
        out += _uint(len(items), 4 if large else 1)
        off = 0
        for b in items:
            out += _uint(off, osz)
            off += len(b)
        out += _uint(off, osz)
        for b in items:
            out += b
        return bytes(out)
    if isinstance(value, dict):
        # fields sorted by key — required for readers' binary search
        # when the metadata dictionary is flagged sorted (keys are
        # validated str by _collect_keys, so the sort never ties into
        # comparing values)
        fields = sorted(value.items())
        items = [_encode_value(v, key_id) for _k, v in fields]
        ids = [key_id[k] for k, _v in fields]
        total = sum(len(b) for b in items)
        osz = _offset_size(total)
        idsz = _offset_size(max(ids, default=0))
        large = len(items) > 255
        header = (
            ((int(large) << 4) | ((idsz - 1) << 2) | (osz - 1)) << 2
        ) | 2
        out = bytearray([header])
        out += _uint(len(items), 4 if large else 1)
        for i in ids:
            out += _uint(i, idsz)
        off = 0
        for b in items:
            out += _uint(off, osz)
            off += len(b)
        out += _uint(off, osz)
        for b in items:
            out += b
        return bytes(out)
    raise NotImplementedError(
        f"variant encoding of python type {type(value).__name__}"
    )


def encode_variant(value: Any) -> tuple[bytes, bytes]:
    """Encode one python value → ``(metadata, value)`` binary pair."""
    keys: set[str] = set()
    _collect_keys(value, keys)
    ordered = sorted(keys)
    meta = build_metadata(ordered)
    key_id = {k: i for i, k in enumerate(ordered)}
    return meta, _encode_value(value, key_id)


# -- decoder (round-trip tests; also handy for debugging foreign files) --


def _read_uint(data: bytes, pos: int, size: int) -> int:
    return int.from_bytes(data[pos : pos + size], "little")


def decode_metadata(meta: bytes) -> list[str]:
    header = meta[0]
    if header & 0x0F != _VERSION:
        raise ValueError("unsupported variant metadata version")
    osz = ((header >> 6) & 0x03) + 1
    n = _read_uint(meta, 1, osz)
    offs = [
        _read_uint(meta, 1 + osz * (1 + i), osz) for i in range(n + 1)
    ]
    base = 1 + osz * (n + 2)
    return [
        meta[base + offs[i] : base + offs[i + 1]].decode("utf-8")
        for i in range(n)
    ]


def _decode_value(data: bytes, pos: int, keys: list[str]) -> Any:
    header = data[pos]
    basic, tinfo = header & 0x03, header >> 2
    if basic == 0:  # primitive
        body = pos + 1
        if tinfo == _P_NULL:
            return None
        if tinfo == _P_TRUE:
            return True
        if tinfo == _P_FALSE:
            return False
        if tinfo == _P_INT8:
            return struct.unpack_from("<b", data, body)[0]
        if tinfo == _P_INT16:
            return struct.unpack_from("<h", data, body)[0]
        if tinfo == _P_INT32:
            return struct.unpack_from("<i", data, body)[0]
        if tinfo == _P_INT64:
            return struct.unpack_from("<q", data, body)[0]
        if tinfo == _P_DOUBLE:
            return struct.unpack_from("<d", data, body)[0]
        if tinfo == _P_STRING:
            n = struct.unpack_from("<I", data, body)[0]
            return data[body + 4 : body + 4 + n].decode("utf-8")
        if tinfo == _P_BINARY:
            n = struct.unpack_from("<I", data, body)[0]
            return data[body + 4 : body + 4 + n]
        raise NotImplementedError(f"variant primitive type_info {tinfo}")
    if basic == 1:  # short string
        return data[pos + 1 : pos + 1 + tinfo].decode("utf-8")
    if basic == 3:  # array
        osz = (tinfo & 0x03) + 1
        large = bool(tinfo & 0x04)
        nsz = 4 if large else 1
        n = _read_uint(data, pos + 1, nsz)
        offs_base = pos + 1 + nsz
        vals_base = offs_base + osz * (n + 1)
        return [
            _decode_value(
                data, vals_base + _read_uint(data, offs_base + osz * i, osz), keys
            )
            for i in range(n)
        ]
    # object
    osz = (tinfo & 0x03) + 1
    idsz = ((tinfo >> 2) & 0x03) + 1
    large = bool(tinfo & 0x10)
    nsz = 4 if large else 1
    n = _read_uint(data, pos + 1, nsz)
    ids_base = pos + 1 + nsz
    offs_base = ids_base + idsz * n
    vals_base = offs_base + osz * (n + 1)
    out: dict[str, Any] = {}
    for i in range(n):
        kid = _read_uint(data, ids_base + idsz * i, idsz)
        voff = _read_uint(data, offs_base + osz * i, osz)
        out[keys[kid]] = _decode_value(data, vals_base + voff, keys)
    return out


def decode_variant(meta: bytes, value: bytes) -> Any:
    """Decode a ``(metadata, value)`` pair back to python (tests)."""
    return _decode_value(value, 0, decode_metadata(meta))


# --- shredded-subfield stats lifting (write side) -------------------------
#
# v3 variant columns carry no spec-defined manifest bound encoding, so
# the scan's shredded pruning historically re-read each candidate
# file's parquet footer at plan time.  The writer already reads those
# footers once at COMMIT time — this lifts each top-level shredded
# subfield's file-level min/max into an engine-specific optional
# manifest field ("variant_bounds", JSON; foreign readers resolve
# manifests by their own reader schema and ignore it), so variant
# predicates prune manifest-level like every other column, with zero
# plan-time IO.  Sound by the same gates as scan._variant_prune_multi:
# a subfield is recorded ONLY when its residual `value` sibling and the
# top-level `value` column are all-NULL in every row group (no row can
# hide an unshredded value the stats don't see) and every row group
# carries exact stats.

_PHYS_PARSE = {
    "INT32": int,
    "INT64": int,
    "FLOAT": float,
    "DOUBLE": float,
    "BYTE_ARRAY": str,
}


def shred_leaf_names(col: str, dotted_field: str) -> tuple[str, list[str]]:
    """(typed-value leaf column name, residual ``value`` sibling names
    at EVERY nesting level including the top-level column) for a dotted
    shredded path like ``meta.score``.  The parquet layout alternates
    field/``typed_value`` groups (``col, typed_value, meta,
    typed_value, score, typed_value``); soundness requires every
    intermediate ``value`` sibling all-NULL — an object stored
    unshredded at ANY level can hide subfield values the leaf stats
    never saw."""
    sibs = [f"{col}, value"]
    accum = col
    for p in dotted_field.split("."):
        accum += f", typed_value, {p}"
        sibs.append(f"{accum}, value")
    return f"{accum}, typed_value", sibs


def discover_shredded_leaves(
    group_names, col: str
) -> dict[str, str]:
    """{dotted field path: typed-value leaf column name} for every
    shredded SCALAR leaf under variant column ``col`` — top-level and
    nested alike.  Leaf names alternate ``field, typed_value`` segments
    after the column (parquet stores only leaves, so struct levels
    never appear as their own entries)."""
    out: dict[str, str] = {}
    for name in group_names:
        parts = name.split(", ")
        if (
            len(parts) < 4
            or len(parts) % 2
            or parts[0] != col
            or any(
                parts[i] != "typed_value" for i in range(1, len(parts), 2)
            )
        ):
            continue
        out[".".join(parts[2::2])] = name
    return out


def shredded_footer_bounds(
    path: str, variant_cols: list[str]
) -> dict[str, dict[str, Any]]:
    """{"<col>.<dotted.field>": {"lo", "hi", "phys"} | {"empty": True}}
    for every shredded scalar leaf of ``variant_cols`` — top-level and
    nested paths alike — whose footer stats prove a sound file-level
    bound.  ``empty`` means the field is NULL/missing in every row (any
    predicate on it matches nothing, including ``!=``).  Fields with
    inexact/absent stats or a non-NULL ``value`` residual at ANY
    nesting level are omitted — plan-time pruning then falls back to
    the footer read (or keeps the file)."""
    import duckdb

    try:
        rows = duckdb.execute(
            "SELECT path_in_schema, type, num_values, stats_min_value, "
            "stats_max_value, stats_null_count FROM parquet_metadata(?)",
            [path],
        ).fetchall()
    except Exception:
        return {}
    groups: dict[str, list[tuple]] = {}
    phys: dict[str, str] = {}
    for name, ptype, nv, mn, mx, nc in rows:
        groups.setdefault(name, []).append((nv, mn, mx, nc))
        phys[name] = str(ptype).upper()

    def all_null(name: str) -> bool:
        gs = groups.get(name)
        return bool(gs) and all(
            nc is not None and nc == nv for nv, _mn, _mx, nc in gs
        )

    out: dict[str, dict[str, Any]] = {}
    for col in variant_cols:
        fields = discover_shredded_leaves(groups, col)
        if fields and not all_null(f"{col}, value"):
            continue  # some row's object lives unshredded: no bounds
        for field in sorted(fields):
            t_leaf, v_sibs = shred_leaf_names(col, field)
            if not all(all_null(v) for v in v_sibs[1:]):
                # residual-fallback rows exist at some nesting level
                # (v_sibs[0] is the top-level residual checked above)
                continue
            parse = _PHYS_PARSE.get(phys.get(t_leaf, ""))
            if parse is None:
                continue
            los, his, nonnull, sound = [], [], False, True
            for nv, mn, mx, nc in groups[t_leaf]:
                if nc is None:
                    sound = False  # unknown null census: no bound
                    break
                if nc == nv:
                    continue  # whole group missing the field
                nonnull = True
                if mn is None or mx is None:
                    sound = False
                    break
                try:
                    los.append(parse(mn))
                    his.append(parse(mx))
                except (TypeError, ValueError):
                    sound = False
                    break
            if not sound:
                continue
            key = f"{col}.{field}"
            if not nonnull:
                out[key] = {"empty": True}
            else:
                out[key] = {
                    "lo": min(los),
                    "hi": max(his),
                    "phys": phys[t_leaf],
                }
    return out
