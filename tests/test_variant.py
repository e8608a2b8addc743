"""v3 variant: the from-scratch binary encoder (``variant.py``), the
driver-side writer path, and shredded-footer pruning
(``scan.variant_prune_files``)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

VECTORS = [
    None,
    True,
    False,
    0,
    5,
    -7,
    300,
    -40_000,
    1 << 40,
    3.5,
    -0.25,
    "hi",
    "",
    "x" * 100,
    {"a": 1, "tag": "t1"},
    {"b": [1, 2, {"c": None}], "a": 2.5},
    [1, "two", None, {"k": False}],
    {},
    [],
    {"nested": {"deep": {"deeper": [1, [2, [3]]]}}},
    list(range(300)),  # large array (4-byte count)
    {f"k{i:03d}": i for i in range(300)},  # large object
    b"\x00\x01raw bytes\xff",  # binary primitive
    {"blob": b"\x89PNG"},
]


def test_encoder_python_roundtrip():
    from daskberg_spark.iceberg.variant import decode_variant, encode_variant

    for v in VECTORS:
        m, b = encode_variant(v)
        assert decode_variant(m, b) == v, v
    with pytest.raises(NotImplementedError):
        encode_variant(object())
    with pytest.raises(ValueError):
        encode_variant(1 << 70)


def test_encoder_spark_roundtrip(spark, tmp_path):
    """The encoder's bytes must be readable by Spark's OWN variant
    reader — write the struct<metadata,value> pair to parquet, read as
    VariantType, compare ``to_json`` against the python value."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.types as T

    from daskberg_spark.iceberg.variant import encode_variant

    import base64

    def jsonable(v):
        if isinstance(v, bytes):
            return base64.b64encode(v).decode()
        if isinstance(v, dict):
            return {k: jsonable(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [jsonable(x) for x in v]
        return v

    # encode the RAW vectors (bytes included); to_json renders binary
    # as base64, so expectations compare through that lens
    vals = list(VECTORS)
    pairs = [encode_variant(v) for v in vals]
    tbl = pa.table(
        {
            "i": pa.array(range(len(vals)), type=pa.int64()),
            "payload": pa.array(
                [{"metadata": m, "value": b} for m, b in pairs],
                type=pa.struct(
                    [
                        pa.field("metadata", pa.binary(), nullable=False),
                        pa.field("value", pa.binary(), nullable=False),
                    ]
                ),
            ),
        }
    )
    f = str(tmp_path / "v.parquet")
    pq.write_table(tbl, f)
    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("payload", T.VariantType()),
        ]
    )
    out = {
        r["i"]: r["j"]
        for r in spark.read.schema(schema)
        .parquet(f)
        .selectExpr("i", "to_json(payload) AS j")
        .collect()
    }
    for i, v in enumerate(vals):
        got = json.loads(out[i]) if out[i] is not None else None
        assert got == jsonable(v), (v, out[i])


def test_driver_side_variant_write_read(spark):
    import daskberg_spark.iceberg.scan  # noqa: F401  (attaches .to_df)
    from daskberg_spark.iceberg.fixtures import ensure_variant_write_fixture
    from daskberg_spark.iceberg.metadata import IcebergTable

    t = IcebergTable(ensure_variant_write_fixture())
    rows = {
        r["id"]: (r["a"], r["tag"])
        for r in t.to_df(spark)
        .selectExpr(
            "id",
            "variant_get(payload, '$.a', 'long') AS a",
            "variant_get(payload, '$.tag', 'string') AS tag",
        )
        .collect()
    }
    for i in range(50):
        if i == 31:
            assert rows[i] == (None, None)  # NULL payload
        else:
            assert rows[i] == (i % 7, f"t{i % 3}"), i
    # nested object survives
    deep = (
        t.to_df(spark, filters=[("id", "==", 30)])
        .selectExpr("variant_get(payload, '$.extra.deep[1]', 'long') AS d")
        .collect()
    )
    assert [r["d"] for r in deep] == [2]


def test_variant_write_refuses_avro(tmp_path):
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "t"),
        [
            {"id": 1, "name": "k", "type": "long", "required": False},
            {"id": 2, "name": "v", "type": "variant", "required": False},
        ],
    )
    with pytest.raises(NotImplementedError, match="parquet-only"):
        w.append([{"k": 1, "v": {"a": 1}}], file_format="avro")


def test_shredded_footer_prune(spark):
    """Predicate on a shredded subfield prunes whole files from footer
    stats; results are residual-exact either way."""
    from daskberg_spark.iceberg.fixtures import ensure_variant_shred_fixture
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.scan import to_df

    t = IcebergTable(ensure_variant_shred_fixture(spark))
    assert len(t.plan_files()) == 2
    df = to_df(t, spark, variant_filters=[("payload", "$.a", ">=", 100)])
    got = sorted(r["id"] for r in df.select("id").collect())
    assert got == list(range(50, 100))
    assert t.last_scan["files_scanned"] == 1  # one file footer-pruned

    # string subfield prune: no file is all-t9, so nothing survives,
    # and the in-op path works
    df = to_df(t, spark, variant_filters=[("payload", "$.tag", "in", ["t9"])])
    assert df.count() == 0
    assert t.last_scan["files_scanned"] == 0

    # conservative cases keep files and stay exact: nested path, !=
    df = to_df(t, spark, variant_filters=[("payload", "$.a.b", "==", 1)])
    assert t.last_scan["files_scanned"] == 2 and df.count() == 0
    df = to_df(t, spark, variant_filters=[("payload", "$.tag", "!=", "t0")])
    assert t.last_scan["files_scanned"] == 2
    assert df.count() == sum(1 for i in range(100) if i % 3 != 0)


def test_unshredded_variant_filters_conservative(spark):
    """The pre-r10 unshredded fixture has no typed_value leaves: every
    file is kept (no stats) and the residual still answers exactly."""
    from daskberg_spark.iceberg.fixtures import ensure_variant_fixture
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.scan import to_df

    t = IcebergTable(ensure_variant_fixture(spark))
    total = len(t.plan_files())
    df = to_df(t, spark, variant_filters=[("payload", "$.a", "==", 3)])
    assert t.last_scan["files_scanned"] == total
    assert df.count() == sum(1 for i in range(50) if i % 7 == 3)
    with pytest.raises(ValueError, match="not a variant"):
        to_df(t, spark, variant_filters=[("id", "$.a", "==", 3)])


def test_compaction_over_variant_tables(spark, tmp_path):
    """Rewrites over variant tables: driver compaction of driver-written
    files round-trips the PHYSICAL pair verbatim (re-encoding it as a
    variant object would double-encode — the r10 passthrough in
    _write_data_file), Spark-written (VARIANT-annotated) files refuse
    the driver path loudly, and the Spark rewrite path folds them."""
    import shutil

    from daskberg_spark.iceberg.fixtures import (
        ensure_variant_shred_fixture,
        ensure_variant_write_fixture,
    )
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        compact_files,
        compact_files_spark,
    )

    d = str(tmp_path / "t")
    shutil.copytree(ensure_variant_write_fixture(), d)
    assert compact_files(IcebergWriter.load(d)) is not None
    t = IcebergTable(d)
    assert len(t.plan_files()) == 1
    got = {
        (r["id"], r["a"])
        for r in t.to_df(spark)
        .selectExpr("id", "variant_get(payload,'$.a','long') AS a")
        .collect()
    }
    assert got == {(i, None if i == 31 else i % 7) for i in range(50)}

    d2 = str(tmp_path / "t2")
    shutil.copytree(ensure_variant_shred_fixture(spark), d2)
    with pytest.raises(NotImplementedError, match="compact_files_spark"):
        compact_files(IcebergWriter.load(d2))
    assert compact_files_spark(IcebergWriter.load(d2), spark) is not None
    t2 = IcebergTable(d2)
    assert len(t2.plan_files()) == 1
    got2 = sorted(
        (r["id"], r["a"])
        for r in t2.to_df(spark)
        .selectExpr("id", "variant_get(payload,'$.a','long') AS a")
        .collect()
    )
    assert got2 == sorted(
        [(i, i % 7) for i in range(50)]
        + [(i, 100 + i % 7) for i in range(50, 100)]
    )


def test_maintain_survives_shredded_variant(spark, tmp_path):
    """A driver-side maintenance sweep over a shredded-variant table
    must not abort: compaction is skipped with a recorded reason, the
    metadata-only steps still run; the Spark-backed sweep compacts."""
    import shutil

    from daskberg_spark.iceberg.fixtures import ensure_variant_shred_fixture
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import IcebergWriter, maintain

    d = str(tmp_path / "t")
    shutil.copytree(ensure_variant_shred_fixture(spark), d)
    report = maintain(IcebergWriter.load(d))
    assert report["compact"] is None
    assert "compact_files_spark" in report.get("compact_skipped", "")

    report2 = maintain(IcebergWriter.load(d), spark=spark)
    assert report2["compact"] is not None
    assert len(IcebergTable(d).plan_files()) == 1


def test_encoder_rejects_non_string_keys():
    from daskberg_spark.iceberg.variant import encode_variant

    with pytest.raises(ValueError, match="keys must be strings"):
        encode_variant({1: "x", "1": "y"})  # coercion would collide


def test_writer_refuses_ambiguous_physical_pair_shape(tmp_path):
    """The {'metadata': bytes, 'value': bytes} dict shape is reserved
    for the rewrite passthrough; a user OBJECT of that exact shape
    without a valid variant header must refuse loudly, never ship the
    raw bytes as a (corrupt) physical pair."""
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "t"),
        [
            {"id": 1, "name": "id", "type": "long", "required": False},
            {"id": 2, "name": "payload", "type": "variant", "required": False},
        ],
        [],
    )
    with pytest.raises(ValueError, match="reserved physical"):
        w.append(
            [{"id": 1, "payload": {"metadata": b"\x77", "value": b"\x00"}}]
        )


def test_string_probe_never_prunes_numeric_shredded_leaf(spark):
    """Regression: a STRING predicate against a bigint-shredded leaf
    compared lexicographically ('5' <= '10' is False) and pruned files
    whose rows the casting residual matches."""
    from daskberg_spark.iceberg.fixtures import ensure_variant_shred_fixture
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.scan import to_df

    t = IcebergTable(ensure_variant_shred_fixture(spark))
    # $.a is shredded as bigint (values 100+i%7 in file 2, i%7 in file 1)
    want = to_df(t, spark).selectExpr(
        "id", "variant_get(payload, '$.a', 'string') AS a"
    ).where("a = '104'")
    got = to_df(
        t, spark, variant_filters=[("payload", "$.a", "==", "104")]
    ).selectExpr("id")
    assert got.count() == want.count() and got.count() > 0


def test_variant_in_filter_shapes(spark):
    from daskberg_spark.iceberg.fixtures import ensure_variant_shred_fixture
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.scan import to_df

    t = IcebergTable(ensure_variant_shred_fixture(spark))
    # a plain string for 'in' would silently match per-character
    with pytest.raises(ValueError, match="list/tuple"):
        to_df(t, spark, variant_filters=[("payload", "$.tag", "in", "t9")])
    # mixed-type lists would throw NumberFormatException inside Spark's
    # own cast mid-query — refused loudly up front instead
    with pytest.raises(ValueError, match="share one type"):
        to_df(t, spark, variant_filters=[("payload", "$.a", "in", [104, "x"])])
    # homogeneous and long+double mixes work, with the exact residual
    n = to_df(
        t, spark, variant_filters=[("payload", "$.a", "in", [104, 105])]
    ).count()
    exact = to_df(t, spark).selectExpr(
        "variant_get(payload, '$.a', 'long') AS a"
    ).where("a IN (104, 105)").count()
    assert n == exact > 0


def test_variant_bounds_lifted_into_manifests(spark):
    """r10 verdict item 3: commits lift shredded-subfield bounds into
    the manifest's engine-extension ``variant_bounds`` field, so a
    variant predicate prunes with ZERO plan-time footer reads — and the
    manifest verdicts match the footer path's exactly."""
    import json

    from daskberg_spark.iceberg.fixtures import ensure_variant_shred_fixture
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.scan import _variant_prune_multi, to_df

    t = IcebergTable(ensure_variant_shred_fixture(spark))
    recs = t.plan_files()
    assert len(recs) == 2
    for rec in recs:
        vb = json.loads(rec["variant_bounds"])
        assert set(vb) == {"payload.a", "payload.tag"}
        assert vb["payload.tag"]["phys"] == "BYTE_ARRAY"
    los = sorted(json.loads(r["variant_bounds"])["payload.a"]["lo"] for r in recs)
    his = sorted(json.loads(r["variant_bounds"])["payload.a"]["hi"] for r in recs)
    assert los == [0, 100] and his == [6, 106]

    # zero footer reads on the manifest path; pruning identical to the
    # footer path (bounds stripped -> same survivors, footers counted)
    for preds in (
        [("payload", "$.a", ">=", 100)],
        [("payload", "$.a", "<", 3)],
        [("payload", "$.tag", "in", ["t9"])],
        [("payload", "$.tag", "==", "t1"), ("payload", "$.a", ">", 4)],
    ):
        c1: dict = {}
        lifted = _variant_prune_multi(recs, preds, c1)
        assert c1.get("variant_footer_reads", 0) == 0, preds
        stripped = [
            {k: v for k, v in r.items() if k != "variant_bounds"}
            for r in recs
        ]
        c2: dict = {}
        footer = _variant_prune_multi(stripped, preds, c2)
        assert c2.get("variant_footer_reads", 0) == len(recs)
        assert [r["file_path"] for r in lifted] == [
            r["file_path"] for r in footer
        ], preds
    # and the full read agrees with a stats-free residual recompute
    df = to_df(t, spark, variant_filters=[("payload", "$.a", "<", 3)])
    assert t.last_scan["variant_footer_reads"] == 0
    got = sorted(r["id"] for r in df.select("id").collect())
    assert got == sorted(i for i in range(50) if i % 7 < 3)


def test_variant_bounds_soundness_gates(spark, tmp_path):
    """A file with UNSHREDDED residual rows gets no lifted bounds for
    the field the residual could hide (write-side gate mirrors the
    footer-prune gate)."""
    import json
    import os

    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.variant import shredded_footer_bounds
    from daskberg_spark.iceberg.writer import IcebergWriter, commit_spark_output
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    w = IcebergWriter(
        path,
        [
            {"id": 1, "name": "id", "type": "long", "required": False},
            {"id": 2, "name": "payload", "type": "variant", "required": False},
        ],
    )
    stage = os.path.join(path, "stage")
    # shred on `a` only: rows carrying extra key `b` spill into the
    # top-level residual `value`, so NO field may claim lifted bounds
    df = spark.range(0, 20).select(
        F.col("id"),
        F.parse_json(
            F.when(
                F.col("id") % 2 == 0,
                F.concat(F.lit('{"a": '), F.col("id").cast("string"), F.lit("}")),
            ).otherwise(
                F.concat(
                    F.lit('{"a": '),
                    F.col("id").cast("string"),
                    F.lit(', "b": "x"}'),
                )
            )
        ).alias("payload"),
    )
    old = spark.conf.get("spark.sql.variant.forceShreddingSchemaForTest", "")
    spark.conf.set("spark.sql.variant.forceShreddingSchemaForTest", "a bigint")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(stage)
    finally:
        spark.conf.set("spark.sql.variant.forceShreddingSchemaForTest", old)
    commit_spark_output(w, stage)
    rec = IcebergTable(path).plan_files()[0]
    vb = rec.get("variant_bounds")
    parsed = json.loads(vb) if vb else {}
    assert "payload.a" not in parsed, parsed
    # direct extractor agrees
    assert "payload.a" not in shredded_footer_bounds(rec["file_path"], ["payload"])


def _nested_shred_table(spark, tmp_path, half_rows=20):
    """Two files, NESTED shredding (`meta struct<score,tag>`): file 1
    has meta.score 0..57 and flag='x' everywhere; file 2 has meta.score
    300..357 and flag='y' everywhere, with meta MISSING on every third
    row (leaf nulls must not block bounds)."""
    import os

    from daskberg_spark.iceberg.writer import IcebergWriter, commit_spark_output

    path = str(tmp_path / "nested")
    w = IcebergWriter(
        path,
        [
            {"id": 1, "name": "id", "type": "long", "required": False},
            {"id": 2, "name": "payload", "type": "variant", "required": False},
        ],
    )
    stage = os.path.join(path, "stage")

    def half(lo, hi, base, flag, skip_meta):
        body = F.concat(
            F.lit('{"flag": "' + flag + '"'),
            F.when(
                F.col("id") % 3 == 2 if skip_meta else F.lit(False),
                F.lit(""),
            ).otherwise(
                F.concat(
                    F.lit(', "meta": {"score": '),
                    (F.lit(base) + (F.col("id") % 20) * 3).cast("string"),
                    F.lit(', "tag": "m'),
                    (F.col("id") % 2).cast("string"),
                    F.lit('"}'),
                )
            ),
            F.lit("}"),
        )
        return spark.range(lo, hi).select(
            F.col("id"), F.parse_json(body).alias("payload")
        )

    old = spark.conf.get("spark.sql.variant.forceShreddingSchemaForTest", "")
    # `ghost` is in the shredding schema but NEVER present in the data:
    # its typed_value leaf exists with all-null stats (the 'empty' case)
    spark.conf.set(
        "spark.sql.variant.forceShreddingSchemaForTest",
        "flag string, ghost string, meta struct<score bigint, tag string>",
    )
    try:
        half(0, half_rows, 0, "x", False).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        half(half_rows, 2 * half_rows, 300, "y", True).coalesce(1).write.mode(
            "append"
        ).parquet(stage)
    finally:
        spark.conf.set("spark.sql.variant.forceShreddingSchemaForTest", old)
    commit_spark_output(w, stage)
    return path


def test_nested_shredded_path_prunes(spark, tmp_path):
    """r11: predicates on NESTED shredded paths ('$.meta.score') prune
    files — from the manifest-lifted bounds first, footers as fallback
    — with the exact nested variant_get residual always applied."""
    import json

    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.scan import _variant_prune_multi, to_df

    t = IcebergTable(_nested_shred_table(spark, tmp_path))
    recs = t.plan_files()
    assert len(recs) == 2
    # nested keys lifted into manifests at commit
    for rec in recs:
        vb = json.loads(rec["variant_bounds"])
        assert {"payload.flag", "payload.meta.score", "payload.meta.tag"} <= set(
            vb
        ), vb
    # nested range predicate prunes the low file with ZERO footer reads
    df = to_df(t, spark, variant_filters=[("payload", "$.meta.score", ">=", 300)])
    assert t.last_scan["files_scanned"] == 1
    assert t.last_scan["variant_footer_reads"] == 0
    got = sorted(r["id"] for r in df.select("id").collect())
    assert got == [i for i in range(20, 40) if i % 3 != 2]
    # footer fallback path plans the same files
    stripped = [
        {k: v for k, v in r.items() if k != "variant_bounds"} for r in recs
    ]
    c: dict = {}
    footer = _variant_prune_multi(
        stripped, [("payload", "$.meta.score", ">=", 300)], c
    )
    assert c["variant_footer_reads"] == 2
    assert [r["file_path"] for r in footer] == [
        r["file_path"]
        for r in _variant_prune_multi(
            recs, [("payload", "$.meta.score", ">=", 300)]
        )
    ]
    # nested string leaf: no 'm9' anywhere -> zero files
    df = to_df(t, spark, variant_filters=[("payload", "$.meta.tag", "==", "m9")])
    assert t.last_scan["files_scanned"] == 0 and df.count() == 0


def test_not_equals_prunes_pinned_and_empty(spark, tmp_path):
    """r11: '!=' prunes a file whose bounds pin the field to exactly
    the probed value (every non-null row equals it; null/missing rows
    never satisfy '!='), and a file where the field is missing in
    every row.  Floats stay conservative per the NaN rule."""
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.scan import to_df

    t = IcebergTable(_nested_shred_table(spark, tmp_path))
    # flag pinned to 'x' in file 1, 'y' in file 2
    df = to_df(t, spark, variant_filters=[("payload", "$.flag", "!=", "x")])
    assert t.last_scan["files_scanned"] == 1
    assert df.count() == 20
    df = to_df(t, spark, variant_filters=[("payload", "$.flag", "!=", "y")])
    assert t.last_scan["files_scanned"] == 1
    assert df.count() == 20
    # a shredded field present in NO row ('empty' bounds): '!=' matches
    # nothing — NULL != v is never true — so every file prunes
    df = to_df(t, spark, variant_filters=[("payload", "$.ghost", "!=", "z")])
    assert t.last_scan["files_scanned"] == 0 and df.count() == 0
    # a field absent from the shredding schema has NO stats at all:
    # conservative keep, residual still exact
    df = to_df(t, spark, variant_filters=[("payload", "$.absent", "!=", 5)])
    assert t.last_scan["files_scanned"] == 2 and df.count() == 0
    # pinned NESTED value: meta.tag is m0/m1 mixed -> kept; but a
    # range-open '!=' on meta.score (not pinned) keeps both files and
    # stays residual-exact, missing-meta rows excluded by SQL semantics
    df = to_df(t, spark, variant_filters=[("payload", "$.meta.score", "!=", 0)])
    # file1 minus its score==0 row; file2's meta-missing rows (id%3==2)
    # never satisfy '!='
    expect = 19 + sum(1 for i in range(20, 40) if i % 3 != 2)
    assert df.count() == expect


def test_nested_intermediate_residual_blocks_prune(spark, tmp_path):
    """An object stored UNSHREDDED at an intermediate level (meta as a
    non-object) hides subfield values from leaf stats — no bounds may
    be lifted for paths under it and the footer prune must keep the
    file."""
    import json
    import os

    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.scan import to_df
    from daskberg_spark.iceberg.variant import shredded_footer_bounds
    from daskberg_spark.iceberg.writer import IcebergWriter, commit_spark_output

    path = str(tmp_path / "resid")
    w = IcebergWriter(
        path,
        [
            {"id": 1, "name": "id", "type": "long", "required": False},
            {"id": 2, "name": "payload", "type": "variant", "required": False},
        ],
    )
    stage = os.path.join(path, "stage")
    # every third row stores meta as a NUMBER -> lands in `meta, value`
    body = F.when(
        F.col("id") % 3 == 2,
        F.concat(F.lit('{"meta": '), F.col("id").cast("string"), F.lit("}")),
    ).otherwise(
        F.concat(
            F.lit('{"meta": {"score": '),
            (F.col("id") * 5).cast("string"),
            F.lit("}}"),
        )
    )
    df = spark.range(0, 12).select(
        F.col("id"), F.parse_json(body).alias("payload")
    )
    old = spark.conf.get("spark.sql.variant.forceShreddingSchemaForTest", "")
    spark.conf.set(
        "spark.sql.variant.forceShreddingSchemaForTest",
        "meta struct<score bigint>",
    )
    try:
        df.coalesce(1).write.mode("overwrite").parquet(stage)
    finally:
        spark.conf.set("spark.sql.variant.forceShreddingSchemaForTest", old)
    commit_spark_output(w, stage)
    t = IcebergTable(path)
    rec = t.plan_files()[0]
    vb = json.loads(rec["variant_bounds"]) if rec.get("variant_bounds") else {}
    assert "payload.meta.score" not in vb, vb
    assert "payload.meta.score" not in shredded_footer_bounds(
        rec["file_path"], ["payload"]
    )
    # probing far outside the leaf's stats range must NOT prune
    df = to_df(
        t, spark, variant_filters=[("payload", "$.meta.score", "==", 10**9)]
    )
    assert t.last_scan["files_scanned"] == 1
    assert df.count() == 0
