"""Theta sketch NDV statistics — the spec-standard
``apache-datasketches-theta-v1`` Puffin blob, from scratch.

The differential section runs the REAL Apache DataSketches Java
library (datasketches-java ships in Spark's jars) through py4j and
asserts this engine's sketches are byte-identical in exact mode and
wrap-readable with matching estimates/thetas in estimation mode —
the strongest interop check available without a network."""

from __future__ import annotations

import datetime as dt
import struct

import numpy as np
import pytest

from daskberg_spark.iceberg.theta import (
    DEFAULT_UPDATE_SEED,
    LONG_MAX,
    ThetaSketch,
    KmvAccumulator,
    compute_seed_hash,
    hash63,
    hash_values,
    murmur3_x64_128,
    single_value_bytes,
)


# -- murmur3 x64-128 ----------------------------------------------------------


def test_murmur_public_vectors():
    # the mmh3 README's published pair for 'foo' (x64_128, seed 0)
    h1, h2 = murmur3_x64_128(b"foo", 0)
    assert h1 - (1 << 64) == -2129773440516405919
    assert h2 == 9128664383759220103
    # and the combined 128-bit form they document
    assert (h1 | (h2 << 64)) == 168394135621993849475852668931176482145
    assert murmur3_x64_128(b"", 0) == (0, 0)


def test_seed_hash_default():
    # DataSketches Util.computeSeedHash(9001)
    assert compute_seed_hash(DEFAULT_UPDATE_SEED) == 37836


def test_vectorized_hash_matches_scalar():
    rng = np.random.default_rng(7)
    longs = rng.integers(-(2**62), 2**62, size=257, dtype=np.int64)
    vec = hash_values(longs, "long")
    ref = [hash63(struct.pack("<q", int(v))) for v in longs]
    assert list(vec) == [r for r in ref if r]
    ints = rng.integers(-(2**31), 2**31, size=111, dtype=np.int32)
    assert list(hash_values(ints, "int")) == [
        hash63(struct.pack("<i", int(v))) for v in ints
    ]
    dbls = rng.normal(size=99)
    assert list(hash_values(dbls, "double")) == [
        hash63(struct.pack("<d", float(v))) for v in dbls
    ]


def test_double_canonicalization():
    a = hash_values(np.array([0.0]), "double")
    b = hash_values(np.array([-0.0]), "double")
    assert list(a) == list(b)
    n1 = hash_values(np.array([float("nan")]), "double")
    n2 = list(hash_values([float("nan")], "double"))
    assert list(n1) == n2


# -- single-value serialization ----------------------------------------------


def test_single_value_vectors():
    assert single_value_bytes(True, "boolean") == b"\x01"
    assert single_value_bytes(False, "boolean") == b"\x00"
    assert single_value_bytes(34, "int") == b"\x22\x00\x00\x00"
    assert single_value_bytes(34, "long") == b"\x22" + b"\x00" * 7
    assert single_value_bytes(1.0, "float") == b"\x00\x00\x80\x3f"
    assert single_value_bytes(dt.date(1970, 1, 2), "date") == (
        b"\x01\x00\x00\x00"
    )
    assert single_value_bytes(
        dt.datetime(1970, 1, 1, 0, 0, 1), "timestamp"
    ) == struct.pack("<q", 1_000_000)
    assert single_value_bytes("iceberg", "string") == b"iceberg"
    assert single_value_bytes("", "string") is None  # DataSketches no-op
    # decimal: minimal two's-complement big-endian of the unscaled value
    assert single_value_bytes("3.45", "decimal(9,2)") == struct.pack(
        ">h", 345
    )[-2:]
    import uuid as _uuid

    u = _uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7")
    assert single_value_bytes(u, "uuid") == u.bytes


# -- sketch construction / estimator / union ----------------------------------


def test_exact_mode_estimate_is_distinct_count():
    sk = ThetaSketch.from_values(
        [f"doc-{i % 97}" for i in range(5000)], "string"
    )
    assert sk.is_exact and sk.estimate() == 97.0


def test_estimation_mode_within_rse():
    n = 50_000
    sk = ThetaSketch.from_values(
        np.arange(n, dtype=np.int64), "long"
    )
    assert not sk.is_exact
    assert len(sk.hashes) == 4096
    # RSE ~ 1/sqrt(k) = 1.56%; allow 5 sigma
    assert abs(sk.estimate() - n) / n < 0.08


def test_union_equals_sketch_of_concatenation():
    a = np.arange(0, 30_000, dtype=np.int64)
    b = np.arange(20_000, 60_000, dtype=np.int64)
    ska = ThetaSketch.from_values(a, "long")
    skb = ThetaSketch.from_values(b, "long")
    both = ThetaSketch.from_values(np.concatenate([a, b]), "long")
    u = ska.union(skb)
    assert u.theta == both.theta
    assert np.array_equal(u.hashes, both.hashes)
    assert u.serialize() == both.serialize()


def test_serialize_roundtrip_property():
    rng = np.random.default_rng(11)
    for n in (0, 1, 3, 4096, 9000):
        vals = rng.integers(0, 2**60, size=n, dtype=np.int64)
        sk = ThetaSketch.from_values(vals, "long")
        back = ThetaSketch.deserialize(sk.serialize())
        assert back.theta == sk.theta
        assert np.array_equal(back.hashes, sk.hashes)
        assert back.serialize() == sk.serialize()


def test_known_answer_bytes():
    # empty: preamble-only, EMPTY flag, seed hash 0 (the DataSketches
    # empty singleton is seed-agnostic)
    assert ThetaSketch.from_hashes([]).serialize() == bytes.fromhex(
        "01030300001e0000"
    )
    # single item: preLongs=1, SINGLEITEM flag 0x20, seed hash 0x93cc,
    # then the one retained hash
    h = hash63(b"foo")
    single = ThetaSketch.from_hashes([h]).serialize()
    assert single == bytes.fromhex("01030300003acc93") + struct.pack(
        "<Q", h
    )
    # two items: preLongs=2 exact form with p=1.0f at bytes 12..15
    h2 = sorted([h, hash63(b"bar")])
    two = ThetaSketch.from_hashes(h2).serialize()
    assert two[:16] == bytes.fromhex("02030300001acc93") + struct.pack(
        "<if", 2, 1.0
    )
    assert two[16:] == struct.pack("<QQ", *h2)


def test_accumulator_bounded_and_equivalent():
    rng = np.random.default_rng(3)
    acc = KmvAccumulator()
    all_vals = []
    for _ in range(20):
        batch = rng.integers(0, 2**61, size=3000, dtype=np.int64)
        all_vals.append(batch)
        acc.add_hashes(hash_values(batch, "long"))
        assert len(acc._arr) <= 4097
    ref = ThetaSketch.from_values(np.concatenate(all_vals), "long")
    got = acc.sketch()
    assert got.theta == ref.theta
    assert np.array_equal(got.hashes, ref.hashes)


# -- hypothesis properties -----------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except Exception:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:

    @given(
        st.lists(
            st.integers(min_value=-(2**62), max_value=2**62), max_size=300
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_prop_exact_mode_counts_distinct(vals):
        sk = ThetaSketch.from_values(vals, "long")
        assert sk.is_exact
        assert sk.estimate() == len(set(vals))
        back = ThetaSketch.deserialize(sk.serialize())
        assert back.serialize() == sk.serialize()

    @given(
        st.lists(st.integers(0, 2**40), max_size=200),
        st.lists(st.integers(0, 2**40), max_size=200),
    )
    @settings(max_examples=60, deadline=None)
    def test_prop_set_algebra_exact(a, b):
        sa = ThetaSketch.from_values(a, "long")
        sb = ThetaSketch.from_values(b, "long")
        A, B = set(a), set(b)
        assert sa.union(sb).estimate() == len(A | B)
        assert sa.intersect(sb).estimate() == len(A & B)
        assert sa.a_not_b(sb).estimate() == len(A - B)
        # union commutes bit-exactly
        assert sa.union(sb).serialize() == sb.union(sa).serialize()

    @given(
        st.lists(
            st.lists(st.integers(0, 2**45), max_size=400),
            min_size=1,
            max_size=6,
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_prop_union_associative_vs_flat(parts):
        sketches = [ThetaSketch.from_values(p, "long") for p in parts]
        folded = sketches[0]
        for s in sketches[1:]:
            folded = folded.union(s)
        flat = ThetaSketch.from_values(
            [v for p in parts for v in p], "long"
        )
        assert folded.serialize() == flat.serialize()


# -- differential vs the real Apache DataSketches library ---------------------


def _java_compact(spark, byte_values):
    sk = spark._jvm.org.apache.datasketches.theta.UpdateSketch.builder().build()
    for b in byte_values:
        sk.update(b)
    return bytes(sk.compact(True, None).toByteArray())


def _java_wrap(spark, data: bytes):
    mem = spark._jvm.org.apache.datasketches.memory.Memory.wrap(data)
    return spark._jvm.org.apache.datasketches.theta.Sketches.wrapCompactSketch(
        mem
    )


def test_differential_exact_mode_byte_identical(spark):
    import decimal as _dec
    import uuid as _uuid

    cases = [
        ("string", [f"value-{i}" for i in range(500)]),
        ("long", list(range(-250, 250))),
        ("int", list(range(1000))),
        ("double", [i * 0.25 for i in range(300)] + [-0.0, float("nan")]),
        ("date", [dt.date(2024, 1, 1) + dt.timedelta(days=i) for i in range(90)]),
        ("boolean", [True, False]),
        ("timestamp", [
            dt.datetime(2024, 6, 1) + dt.timedelta(minutes=i)
            for i in range(120)
        ]),
        ("decimal(9,2)", [_dec.Decimal(i) / 4 for i in range(-80, 80)]),
        ("uuid", [
            _uuid.uuid5(_uuid.NAMESPACE_URL, f"u{i}") for i in range(60)
        ]),
        ("binary", [bytes([i % 256, (i * 3) % 256]) for i in range(200)]),
    ]
    for typ, vals in cases:
        jbytes = _java_compact(
            spark, [single_value_bytes(v, typ) for v in vals]
        )
        mine = ThetaSketch.from_values(vals, typ).serialize()
        assert jbytes == mine, f"type {typ} diverged"
    # empty and single-item forms
    assert _java_compact(spark, []) == ThetaSketch.from_hashes([]).serialize()
    assert _java_compact(spark, [b"foo"]) == ThetaSketch.from_hashes(
        [hash63(b"foo")]
    ).serialize()


def test_differential_estimation_mode_wrap(spark):
    mine = ThetaSketch.from_values(
        [f"v{i}" for i in range(25_000)], "string"
    )
    wrapped = _java_wrap(spark, mine.serialize())
    assert wrapped.getEstimate() == pytest.approx(mine.estimate(), abs=1e-6)
    assert wrapped.getThetaLong() == mine.theta
    assert wrapped.getRetainedEntries(True) == len(mine.hashes)


def test_differential_union(spark):
    a = ThetaSketch.from_values([f"a{i}" for i in range(9000)], "string")
    b = ThetaSketch.from_values([f"b{i}" for i in range(9000)], "string")
    jvm = spark._jvm
    u = jvm.org.apache.datasketches.theta.SetOperation.builder().buildUnion()
    u.union(_java_wrap(spark, a.serialize()))
    u.union(_java_wrap(spark, b.serialize()))
    jres = u.getResult(True, None)
    mres = a.union(b)
    assert jres.getThetaLong() == mres.theta
    assert jres.getEstimate() == pytest.approx(mres.estimate(), abs=1e-6)


def test_intersection_and_anotb():
    a = ThetaSketch.from_values(np.arange(0, 30_000, dtype=np.int64), "long")
    b = ThetaSketch.from_values(
        np.arange(20_000, 50_000, dtype=np.int64), "long"
    )
    inter = a.intersect(b)
    assert abs(inter.estimate() - 10_000) / 10_000 < 0.1
    diff = a.a_not_b(b)
    assert abs(diff.estimate() - 20_000) / 20_000 < 0.1
    # disjoint sets intersect to zero
    c = ThetaSketch.from_values(
        np.arange(90_000, 95_000, dtype=np.int64), "long"
    )
    assert a.intersect(c).estimate() == 0.0
    # exact mode is exactly right
    xs = ThetaSketch.from_values(np.arange(0, 100, dtype=np.int64), "long")
    ys = ThetaSketch.from_values(np.arange(60, 160, dtype=np.int64), "long")
    assert xs.intersect(ys).estimate() == 40.0
    assert xs.a_not_b(ys).estimate() == 60.0


def test_set_ops_refuse_seed_mismatch():
    # DataSketches throws on mismatched seed hashes; silently
    # intersecting incompatible hash sets would hand the CBO a
    # meaningless ~0 overlap (review finding)
    a = ThetaSketch.from_values(list(range(100)), "long")
    b = ThetaSketch.from_values(list(range(100)), "long")
    b.seed_hash = a.seed_hash + 1
    for op in (a.intersect, a.a_not_b, a.union):
        with pytest.raises(ValueError, match="seed hash mismatch"):
            op(b)


def test_differential_intersection(spark):
    jvm = spark._jvm
    a = ThetaSketch.from_values([f"a{i}" for i in range(12_000)], "string")
    b = ThetaSketch.from_values(
        [f"a{i}" for i in range(6_000, 20_000)], "string"
    )
    op = jvm.org.apache.datasketches.theta.SetOperation.builder()
    inter = op.buildIntersection()
    inter.intersect(_java_wrap(spark, a.serialize()))
    inter.intersect(_java_wrap(spark, b.serialize()))
    jres = inter.getResult(True, None)
    mres = a.intersect(b)
    assert jres.getThetaLong() == mres.theta
    assert jres.getRetainedEntries(True) == len(mres.hashes)
    assert jres.getEstimate() == pytest.approx(mres.estimate(), abs=1e-6)
    anotb = jvm.org.apache.datasketches.theta.SetOperation.builder().buildANotB()
    jd = anotb.aNotB(
        _java_wrap(spark, a.serialize()), _java_wrap(spark, b.serialize())
    )
    md = a.a_not_b(b)
    assert jd.getThetaLong() == md.theta
    assert jd.getRetainedEntries(True) == len(md.hashes)


# -- writer integration / incremental refresh ---------------------------------


def _typed_writer(path):
    from daskberg_spark.iceberg.writer import IcebergWriter

    return IcebergWriter(
        str(path),
        [
            {"id": 1, "name": "id", "type": "long", "required": False},
            {"id": 2, "name": "grp", "type": "string", "required": False},
            {"id": 3, "name": "val", "type": "double", "required": False},
            {"id": 4, "name": "d", "type": "date", "required": False},
        ],
    )


def _rows(lo, hi, grp_mod=3):
    return [
        {
            "id": i,
            "grp": "abcdef"[i % grp_mod],
            "val": float(i % 17),
            "d": dt.date(2024, 1, 1) + dt.timedelta(days=i % 40),
        }
        for i in range(lo, hi)
    ]


def test_write_statistics_theta_blobs(spark, tmp_path):
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.theta import THETA_BLOB_TYPE
    from daskberg_spark.iceberg.writer import write_table_statistics

    w = _typed_writer(tmp_path / "t")
    w.append(_rows(0, 80))
    write_table_statistics(w, spark)
    t = IcebergTable(str(tmp_path / "t"))
    entry = t.metadata["statistics"][-1]
    assert all(
        b["type"] == THETA_BLOB_TYPE for b in entry["blob-metadata"]
    )
    assert t.column_ndv("id") == 80
    assert t.column_ndv("grp") == 3
    assert t.column_ndv("val") == 17
    assert t.column_ndv("d") == 40
    sk = t.column_theta("id")
    assert sk.is_exact and sk.estimate() == 80.0
    # the payload reads back in the REAL DataSketches library too
    wrapped = _java_wrap(
        spark,
        __import__("daskberg_spark.iceberg.puffin", fromlist=["read_blob"])
        .read_blob(
            entry["statistics-path"],
            [
                b
                for b in entry["blob-metadata"]
                if b["fields"] == [t.fields["id"].field_id]
            ][0],
        ),
    )
    assert wrapped.getEstimate() == 80.0


def test_incremental_refresh_matches_full(spark, tmp_path):
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import (
        refresh_table_statistics,
        write_table_statistics,
    )

    w = _typed_writer(tmp_path / "t")
    w.append(_rows(0, 60))
    write_table_statistics(w, spark)
    w.append(_rows(60, 90, grp_mod=5))
    w.append(_rows(90, 120, grp_mod=6))
    _, mode = refresh_table_statistics(w, spark)
    assert mode == "incremental"
    t = IcebergTable(str(tmp_path / "t"))
    inc = {c: t.column_ndv(c) for c in ("id", "grp", "val", "d")}
    inc_sketch = t.column_theta("id").serialize()
    write_table_statistics(w, spark)
    t2 = IcebergTable(str(tmp_path / "t"))
    full = {c: t2.column_ndv(c) for c in ("id", "grp", "val", "d")}
    assert inc == full == {"id": 120, "grp": 6, "val": 17, "d": 40}
    assert t2.column_theta("id").serialize() == inc_sketch


def test_refresh_new_column_and_no_base_full(spark, tmp_path):
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import (
        refresh_table_statistics,
        write_table_statistics,
    )

    w = _typed_writer(tmp_path / "t")
    w.append(_rows(0, 50))
    # no base stats at all -> full
    _, mode = refresh_table_statistics(w, spark)
    assert mode == "full"
    # column added after base: old files read NULL, incremental stays
    # correct from the added files alone
    w.add_column("tag", "string")
    w.append(
        [
            {**r, "tag": f"tag{r['id'] % 7}"}
            for r in _rows(50, 100)
        ]
    )
    _, mode = refresh_table_statistics(w, spark)
    assert mode == "incremental"
    t = IcebergTable(str(tmp_path / "t"))
    assert t.column_ndv("tag") == 7
    assert t.column_ndv("id") == 100


def test_maintain_refreshes_stats(spark, tmp_path):
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import (
        maintain,
        write_table_statistics,
    )

    w = _typed_writer(tmp_path / "t")
    w.append(_rows(0, 60))
    write_table_statistics(w, spark)
    w.append(_rows(60, 90, grp_mod=5))
    # min_file_bytes=0 keeps compaction out of the window so the
    # refresh stays incremental; with compaction on, the replace
    # snapshot correctly forces a full rebuild instead
    rep = maintain(w, spark, min_file_bytes=0)
    assert rep["refresh_statistics"] == "incremental"
    t = IcebergTable(str(tmp_path / "t"))
    assert t.column_ndv("id") == 90 and t.column_ndv("grp") == 5
    # idempotent: head now covered, second sweep does nothing
    assert maintain(w, spark, min_file_bytes=0)["refresh_statistics"] is None
    # a table that never opted into stats pays no surprise scan
    w2 = _typed_writer(tmp_path / "u")
    w2.append(_rows(0, 30))
    assert maintain(w2, spark)["refresh_statistics"] is None


def test_sketch_counts_nan_and_big_longs(spark, tmp_path):
    # review findings: (a) pandas dropna() would silently drop NaN
    # doubles that COUNT(DISTINCT) counts; (b) nullable int64 routed
    # through pandas float64 corrupts ids past 2^53.  The arrow build
    # path must get both exactly right.
    from pyspark.sql import functions as F

    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        write_table_statistics,
    )

    w = IcebergWriter(
        str(tmp_path / "t"),
        [
            {"id": 1, "name": "big", "type": "long", "required": False},
            {"id": 2, "name": "val", "type": "double", "required": False},
        ],
    )
    base = 1_234_567_890_123_456_789  # ulp at this scale is 256
    w.append(
        [
            {
                "big": None if i == 7 else base + i,  # adjacent big longs
                "val": float("nan") if i % 5 == 0 else float(i % 9),
            }
            for i in range(40)
        ]
    )
    write_table_statistics(w, spark)
    t = IcebergTable(str(tmp_path / "t"))
    df = t.to_df(spark)
    # Spark's count_distinct: 39 non-null distinct longs; NaN counts
    # as ONE distinct double alongside 0..8
    assert t.column_ndv("big") == 39
    assert (
        df.agg(F.count_distinct("big")).collect()[0][0] == 39
    )
    assert t.column_ndv("val") == 10
    assert df.agg(F.count_distinct("val")).collect()[0][0] == 10


def test_build_sketches_lgk_threads_through(spark, tmp_path):
    # review finding: deserialize() hard-coded lg_k=12, so a lg_k=13
    # build's partials were cut back to k=4096 at union time
    from daskberg_spark.iceberg.theta import build_column_sketches
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import IcebergWriter

    import daskberg_spark.iceberg.scan  # noqa: F401

    w = IcebergWriter(
        str(tmp_path / "t"),
        [{"id": 1, "name": "id", "type": "long", "required": False}],
    )
    w.append([{"id": i} for i in range(6000)])
    df = IcebergTable(str(tmp_path / "t")).to_df(spark)
    sk = build_column_sketches(df, [("id", "long")], lg_k=13)["id"]
    assert sk.is_exact and sk.estimate() == 6000.0


def test_ndv_pushdown_stats_and_fallback(spark, tmp_path):
    import daskberg_spark.iceberg.agg  # noqa: F401
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import write_table_statistics

    w = _typed_writer(tmp_path / "t")
    w.append(_rows(0, 80))
    write_table_statistics(w, spark)
    t = IcebergTable(str(tmp_path / "t"))
    out = t.agg_pushdown(
        spark,
        [
            ("approx_count_distinct", "id", "ndv_id"),
            ("count", "*", "n"),
            ("max", "id", "max_id"),
        ],
    ).collect()[0]
    assert (out["ndv_id"], out["n"], out["max_id"]) == (80, 80, 79)
    assert t.last_agg_pushdown["files_scanned"] == 0
    assert t.last_agg_pushdown["ndv_from_stats"] == ["ndv_id"]
    # meta_files keeps its integer contract for the count/max legs
    assert all(
        isinstance(v, int)
        for v in t.last_agg_pushdown["meta_files"].values()
    )
    # stale stats (new append, no refresh) -> HLL fallback scan,
    # never a wrong answer from an old blob
    w.append(_rows(80, 100))
    t2 = IcebergTable(str(tmp_path / "t"))
    out2 = t2.agg_pushdown(
        spark, [("approx_count_distinct", "grp", "ndv_grp")]
    ).collect()[0]
    assert out2["ndv_grp"] == 3
    assert t2.last_agg_pushdown["ndv_scanned_columns"] == ["ndv_grp"]
    # filters/grouping refused — per-file stats can't split NDV
    with pytest.raises(ValueError, match="whole-table only"):
        t2.agg_pushdown(
            spark,
            [("approx_count_distinct", "id", "x")],
            filters=[("id", ">", 3)],
        )
    # review findings: two NDV aggs on ONE column share the fallback
    # scan without an ambiguous projection, and a dotted alias is a
    # plain name, not a struct access
    out3 = t2.agg_pushdown(
        spark,
        [
            ("approx_count_distinct", "id", "ndv.a"),
            ("approx_count_distinct", "id", "b"),
        ],
    ).collect()[0]
    # the fallback is Spark's HLL — approximate, but both aliases share
    # one scan so they must agree exactly, and land near the truth
    assert out3["ndv.a"] == out3["b"]
    assert abs(out3["b"] - 100) <= 10


def test_refresh_bounded_delete_window(spark, tmp_path):
    # r10 verdict item 4: a SMALL row-level delete (here 10 of 80 rows,
    # 12.5% < the 20% gate) no longer forces a full rebuild — the union
    # sketch overestimates NDV by at most the killed rows, an error the
    # CBO consumer tolerates.  The stored NDV must bracket
    # [true, true + killed].
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import (
        delete_where_fast,
        refresh_table_statistics,
        write_table_statistics,
    )

    w = _typed_writer(tmp_path / "t")
    w.append(_rows(0, 60))
    write_table_statistics(w, spark)
    w.append(_rows(60, 80))
    delete_where_fast(w, spark, [[("id", "<", 10)]])
    _, mode = refresh_table_statistics(w, spark)
    assert mode == "incremental"
    t = IcebergTable(str(tmp_path / "t"))
    stored = {
        b["fields"][0]: int(b["properties"]["ndv"])
        for e in t.metadata.get("statistics", [])
        if e["snapshot-id"] == t.metadata["current-snapshot-id"]
        for b in e["blob-metadata"]
    }
    true_ndv = t.to_df(spark).select("id").distinct().count()
    id_fid = 1
    assert true_ndv <= stored[id_fid] <= true_ndv + 10


def test_refresh_falls_back_on_large_or_eq_delete(spark, tmp_path):
    # above the 20% killed-rows gate -> full rebuild
    from daskberg_spark.iceberg.writer import (
        delete_where_fast,
        refresh_table_statistics,
        write_table_statistics,
    )

    w = _typed_writer(tmp_path / "t")
    w.append(_rows(0, 60))
    write_table_statistics(w, spark)
    w.append(_rows(60, 80))
    delete_where_fast(w, spark, [[("id", "<", 30)]])
    _, mode = refresh_table_statistics(w, spark)
    assert mode == "full"
    # equality deletes kill unboundedly many rows per key -> full
    w2 = _typed_writer(tmp_path / "t2")
    w2.append(_rows(0, 60))
    write_table_statistics(w2, spark)
    w2.delete_rows_equality([{"id": 5}])
    _, mode2 = refresh_table_statistics(w2, spark)
    assert mode2 == "full"


def test_hash_values_datetime64_dates():
    # ADVICE r10: numpy datetime64 date arrays crashed the fallback
    # (single_value_bytes subtracts datetime.date from np.datetime64);
    # kind-'M' now converts to epoch days and takes the int fast path.
    import numpy as np

    from daskberg_spark.iceberg.theta import hash_values

    dts = np.array(
        ["2024-01-01", "2024-06-15", "1969-12-31"], dtype="datetime64[D]"
    )
    days = dts.astype("int64").astype(np.int32)
    assert np.array_equal(hash_values(dts, "date"), hash_values(days, "date"))
    # and matches the scalar python-date path too
    pydates = dts.astype("datetime64[D]").tolist()
    assert np.array_equal(
        hash_values(dts, "date"), hash_values(pydates, "date")
    )


def test_refresh_missing_summary_is_non_append(spark, tmp_path):
    # ADVICE r10: a window snapshot with NO summary (externally-written
    # metadata) must route to the FULL rebuild — treating it as an
    # append could union away a delete and keep inflated NDVs.
    from daskberg_spark.iceberg.writer import (
        refresh_table_statistics,
        write_table_statistics,
    )

    w = _typed_writer(tmp_path / "t")
    w.append(_rows(0, 60))
    write_table_statistics(w, spark)
    w.append(_rows(60, 80))
    w.snapshots[-1].pop("summary", None)
    _, mode = refresh_table_statistics(w, spark)
    assert mode == "full"


def test_grouped_ndv_exact_and_routing(spark, tmp_path):
    """Grouped theta blobs serve per-group NDV metadata-only (exact in
    exact mode, NULL group keys included); staleness and grouping
    mismatches route to the exact count_distinct scan."""
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.theta import (
        write_grouped_theta_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "gn"),
        [
            {"id": 1, "name": "seg", "type": "string", "required": False},
            {"id": 2, "name": "u", "type": "long", "required": False},
        ],
    )
    w.append(
        [
            {"seg": ["a", "b", None][i % 3], "u": i % (7 + i % 3)}
            for i in range(600)
        ]
    )
    path = write_grouped_theta_statistics(w, spark, ["seg"], ["u"])
    assert path and path.endswith(".puffin")
    t = IcebergTable(w.path)
    out = t.ndv_groupby(spark, "u", ["seg"])
    assert t.last_ndv_groupby["route"] == "stats"
    assert t.last_ndv_groupby["exact"] is True
    assert t.last_scan["files_scanned"] == 0
    got = {r.seg: r.ndv for r in out.collect()}
    truth = {
        r.seg: r.ndv
        for r in t.to_df(spark)
        .groupBy("seg")
        .agg(
            __import__("pyspark.sql.functions", fromlist=["x"])
            .count_distinct("u")
            .alias("ndv")
        )
        .collect()
    }
    assert got == truth and None in got, (got, truth)
    # a DIFFERENT grouping routes to the scan (same exact values)
    out2 = t.ndv_groupby(spark, "seg", ["u"])
    assert t.last_ndv_groupby["route"] == "scan"
    # a commit stales the blob: scan route, still exact
    w.append([{"seg": "a", "u": 10**6}])
    t2 = IcebergTable(w.path)
    out3 = t2.ndv_groupby(spark, "u", ["seg"])
    assert t2.last_ndv_groupby["route"] == "scan"
    got3 = {r.seg: r.ndv for r in out3.collect()}
    assert got3["a"] == truth["a"] + 1


def test_grouped_ndv_write_gates(spark, tmp_path):
    import pytest

    from daskberg_spark.iceberg.theta import (
        write_grouped_theta_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "gg"),
        [
            {"id": 1, "name": "f", "type": "double", "required": False},
            {"id": 2, "name": "k", "type": "long", "required": False},
        ],
    )
    w.append([{"f": float(i), "k": i} for i in range(50)])
    # float group keys can't JSON-round-trip exactly: refused
    with pytest.raises(ValueError, match="keys on"):
        write_grouped_theta_statistics(w, spark, ["f"], ["k"])
    # unbounded group counts refused loudly
    with pytest.raises(ValueError, match="metadata-sized"):
        write_grouped_theta_statistics(w, spark, ["k"], ["f"], max_groups=10)


# -- grouped-NDV incremental refresh (r13) ------------------------------------


def _gndv_truth(t, spark):
    from pyspark.sql import functions as F

    return {
        r.seg: r.ndv
        for r in t.to_df(spark)
        .groupBy("seg")
        .agg(F.count_distinct("u").alias("ndv"))
        .collect()
    }


def test_grouped_ndv_refresh_incremental_on_append(spark, tmp_path):
    """Bootstrap writes per-file grouped sketch partials for every
    file; a later append refreshes by reading ONLY the new file
    (O(new files)) and the merged blob stays bit-equal to
    COUNT(DISTINCT) in exact mode — NO identity-partitioning
    requirement (sketch union, unlike CDF merge, needs no file↔group
    alignment)."""
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.theta import (
        refresh_grouped_theta_statistics,
        write_grouped_theta_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "gr"),
        [
            {"id": 1, "name": "seg", "type": "string", "required": False},
            {"id": 2, "name": "u", "type": "long", "required": False},
        ],
    )
    w.append(
        [{"seg": ["a", "b", None][i % 3], "u": i % 11} for i in range(300)]
    )
    w.append([{"seg": "a", "u": 100 + i % 5} for i in range(100)])
    write_grouped_theta_statistics(w, spark, ["seg"], ["u"])
    # bootstrap: every live file takes the partial pass once
    rep = refresh_grouped_theta_statistics(w, spark)
    assert rep["files_total"] == 2 and rep["partials_computed"] == 2, rep
    assert rep["dirty_files"] == 0
    # append one file: the refresh partial-scans ONLY it
    w.append([{"seg": "c", "u": 1000 + i} for i in range(50)])
    rep = refresh_grouped_theta_statistics(w, spark)
    assert rep["files_total"] == 3 and rep["partials_computed"] == 1, rep
    t = IcebergTable(w.path)
    payload = t.grouped_column_ndv("u", ["seg"])
    assert payload["merged"] is True
    out = t.ndv_groupby(spark, "u", ["seg"])
    assert t.last_ndv_groupby["route"] == "stats"
    assert t.last_scan["files_scanned"] == 0
    got = {r.seg: r.ndv for r in out.collect()}
    truth = _gndv_truth(t, spark)
    assert got == truth and None in got, (got, truth)
    # never opted in: None, nothing scanned
    w2 = IcebergWriter(
        str(tmp_path / "gr2"),
        [{"id": 1, "name": "u", "type": "long", "required": False}],
    )
    w2.append([{"u": 1}])
    assert refresh_grouped_theta_statistics(w2, spark) is None


def test_grouped_ndv_refresh_delete_dirty_and_compaction(spark, tmp_path):
    """A delete makes its files' raw-content sketches untrustworthy
    (sketches cannot subtract): the refresh re-reads DIRTY files
    delete-aware while clean files stay metadata-only, and compaction
    needs no special case (rewritten files re-derive the same hashes,
    union is idempotent)."""
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.theta import (
        refresh_grouped_theta_statistics,
        write_grouped_theta_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter, compact_files_spark

    w = IcebergWriter(
        str(tmp_path / "gd"),
        [
            {"id": 1, "name": "seg", "type": "string", "required": False},
            {"id": 2, "name": "u", "type": "long", "required": False},
        ],
    )
    w.append([{"seg": "ab"[i % 2], "u": i % 20} for i in range(200)])
    w.append([{"seg": "b", "u": 50 + i % 7} for i in range(100)])
    write_grouped_theta_statistics(w, spark, ["seg"], ["u"])
    rep = refresh_grouped_theta_statistics(w, spark)
    assert rep["partials_computed"] == 2
    # kill every u >= 50 (eq-delete scopes both files dirty)
    w.delete_rows_equality([{"u": 50 + i} for i in range(10)])
    rep = refresh_grouped_theta_statistics(w, spark)
    assert rep["dirty_files"] >= 1 and rep["partials_computed"] == 0, rep
    t = IcebergTable(w.path)
    got = {r.seg: r.ndv for r in t.ndv_groupby(spark, "u", ["seg"]).collect()}
    assert t.last_ndv_groupby["route"] == "stats"
    truth = _gndv_truth(t, spark)
    assert got == truth, (got, truth)
    # compaction rewrites to clean files: partials for the new file,
    # dirty leg gone, values unchanged
    compact_files_spark(w, spark, min_file_bytes=1 << 20)
    rep = refresh_grouped_theta_statistics(w, spark)
    assert rep["dirty_files"] == 0 and rep["partials_computed"] >= 1, rep
    t = IcebergTable(w.path)
    got = {r.seg: r.ndv for r in t.ndv_groupby(spark, "u", ["seg"]).collect()}
    assert got == truth, (got, truth)


def test_grouped_ndv_refresh_consolidates_partials(spark, tmp_path):
    """Each refresh appends one partials entry; past the shared
    threshold the next refresh repacks ONE live-files entry and
    coverage still answers (partials_computed stays 0)."""
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.theta import (
        GROUPED_THETA_FILE_BLOB_TYPE,
        refresh_grouped_theta_statistics,
        write_grouped_theta_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "gc"),
        [
            {"id": 1, "name": "seg", "type": "string", "required": False},
            {"id": 2, "name": "u", "type": "long", "required": False},
        ],
    )
    w.append([{"seg": "a", "u": i} for i in range(30)])
    write_grouped_theta_statistics(w, spark, ["seg"], ["u"])
    for r in range(10):
        w.append([{"seg": "ab"[r % 2], "u": 100 * r + i} for i in range(20)])
        refresh_grouped_theta_statistics(w, spark)
    n_entries = sum(
        1
        for e in w.statistics
        if any(
            b.get("type") == GROUPED_THETA_FILE_BLOB_TYPE
            for b in e.get("blob-metadata", [])
        )
    )
    assert n_entries <= 9, n_entries  # repacked, not 11
    rep = refresh_grouped_theta_statistics(w, spark)
    assert rep["partials_computed"] == 0, rep
    t = IcebergTable(w.path)
    got = {r.seg: r.ndv for r in t.ndv_groupby(spark, "u", ["seg"]).collect()}
    assert got == _gndv_truth(t, spark)


def test_maintain_refreshes_grouped_ndv(spark, tmp_path):
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.theta import write_grouped_theta_statistics
    from daskberg_spark.iceberg.writer import IcebergWriter, maintain

    w = IcebergWriter(
        str(tmp_path / "gm"),
        [
            {"id": 1, "name": "seg", "type": "string", "required": False},
            {"id": 2, "name": "u", "type": "long", "required": False},
        ],
    )
    w.append([{"seg": "ab"[i % 2], "u": i % 9} for i in range(100)])
    write_grouped_theta_statistics(w, spark, ["seg"], ["u"])
    w.append([{"seg": "c", "u": i} for i in range(30)])
    rep = maintain(w, spark, min_file_bytes=0)
    assert rep["refresh_grouped_ndv"] is not None, rep
    t = IcebergTable(w.path)
    assert t.grouped_column_ndv("u", ["seg"])["merged"] is True
    rep2 = maintain(w, spark, min_file_bytes=0)
    assert rep2["refresh_grouped_ndv"] is None, rep2


def test_grouped_ndv_conditional_eq_selectivity(spark, tmp_path):
    """r13 CBO rung: with values NESTED inside groups (each of 3 groups
    owns its own 40 u-values, 120 global), the marginal model scores
    `seg == 0 AND u == 5` at 1/3 · 1/120 ≈ N/360, while the grouped
    theta blob measures the conditional 1/ndv(u | seg) = 1/40 →
    ≈ N/120 — 3× larger, the nesting factor."""
    from daskberg_spark.iceberg.cbo import estimated_rows
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.theta import write_grouped_theta_statistics
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        write_table_statistics,
    )

    w = IcebergWriter(
        str(tmp_path / "ce"),
        [
            {"id": 1, "name": "seg", "type": "long", "required": False},
            {"id": 2, "name": "u", "type": "long", "required": False},
        ],
    )
    # group g owns u in [40g, 40g+40): 40 per group, 120 global
    w.append([{"seg": i % 3, "u": 40 * (i % 3) + i % 40} for i in range(1200)])
    write_table_statistics(w, spark)
    t = IcebergTable(w.path)
    marginal = estimated_rows(t, [("seg", "==", 0), ("u", "==", 5)])
    assert 2 <= marginal <= 5, marginal  # 1200/360 ≈ 3.3
    write_grouped_theta_statistics(w, spark, ["seg"], ["u"])
    t = IcebergTable(w.path)
    conditional = estimated_rows(t, [("seg", "==", 0), ("u", "==", 5)])
    assert 8 <= conditional <= 12, conditional  # 1200/120 = 10
    # seg == 99 is outside every file's min/max: the PLANNER proves
    # emptiness before any NDV refinement runs (0 = proved-empty, a
    # stronger statement than the blob key-miss fallback, which the
    # quantile conditional test covers)
    missing = estimated_rows(t, [("seg", "==", 99), ("u", "==", 5)])
    assert missing == 0.0, missing


def test_grouped_ndv_date_keys(spark, tmp_path):
    """'Distinct users by DAY' with day as a real date column (r13):
    keys ride the blob as ISO strings (the grouped-quantile
    convention), ndv_groupby decodes them back to dates, and the
    incremental refresh keeps working across an append."""
    import datetime as dt

    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.theta import (
        refresh_grouped_theta_statistics,
        write_grouped_theta_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "gdt"),
        [
            {"id": 1, "name": "d", "type": "date", "required": False},
            {"id": 2, "name": "u", "type": "long", "required": False},
        ],
    )
    base = dt.date(2024, 5, 1)
    w.append(
        [
            {"d": base + dt.timedelta(days=i % 3), "u": i % (5 + i % 3)}
            for i in range(300)
        ]
    )
    write_grouped_theta_statistics(w, spark, ["d"], ["u"])
    t = IcebergTable(w.path)
    out = t.ndv_groupby(spark, "u", ["d"])
    assert t.last_ndv_groupby["route"] == "stats"
    got = {r.d: r.ndv for r in out.collect()}
    truth = {
        r.d: r.ndv
        for r in t.to_df(spark)
        .groupBy("d")
        .agg(
            __import__("pyspark.sql.functions", fromlist=["x"])
            .count_distinct("u")
            .alias("ndv")
        )
        .collect()
    }
    assert got == truth and base in got, (got, truth)
    # append a fourth day; the refresh partial-scans only the new file
    w.append([{"d": base + dt.timedelta(days=9), "u": 100 + i} for i in range(40)])
    rep = refresh_grouped_theta_statistics(w, spark)
    assert rep["partials_computed"] <= 2 and rep["files_total"] == 2, rep
    t = IcebergTable(w.path)
    got = {r.d: r.ndv for r in t.ndv_groupby(spark, "u", ["d"]).collect()}
    assert got[base + dt.timedelta(days=9)] == 40
    assert {k: v for k, v in got.items() if k != base + dt.timedelta(days=9)} == truth


def test_global_ndv_partials_refresh(spark, tmp_path):
    """r13: a table opted into per-file theta partials refreshes its
    GLOBAL NDV stats exactly at O(new + dirty files) under the commit
    shapes the append-window path must full-rebuild on — unbounded
    deletes and compaction ("replace" snapshots) included."""
    from pyspark.sql import functions as F

    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.theta import write_file_theta_partials
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        compact_files_spark,
        refresh_table_statistics,
    )

    w = IcebergWriter(
        str(tmp_path / "gp"),
        [
            {"id": 1, "name": "k", "type": "long", "required": False},
            {"id": 2, "name": "u", "type": "string", "required": False},
        ],
    )
    w.append([{"k": i % 50, "u": f"u{i % 30}"} for i in range(200)])
    w.append([{"k": 50 + i % 20, "u": f"v{i % 10}"} for i in range(100)])
    write_file_theta_partials(w, spark)

    def truth(t):
        r = t.to_df(spark).agg(
            F.count_distinct("k").alias("k"),
            F.count_distinct("u").alias("u"),
        ).collect()[0]
        return {"k": r["k"], "u": r["u"]}

    # append: only the new file takes the partial pass
    w.append([{"k": 100 + i, "u": f"w{i}"} for i in range(25)])
    _, mode = refresh_table_statistics(w, spark)
    assert mode == "partials", mode
    rep = w.last_theta_refresh
    assert rep["partials_computed"] == 1 and rep["files_total"] == 3, rep
    t = IcebergTable(w.path)
    assert {c: t.column_ndv(c) for c in ("k", "u")} == truth(t)
    # a >20% delete: the window path would full-rebuild; partials stay
    # O(dirty files) and EXACT
    w.delete_rows_equality([{"k": i} for i in range(40)])
    _, mode = refresh_table_statistics(w, spark)
    assert mode == "partials", mode
    rep = w.last_theta_refresh
    assert rep["dirty_files"] >= 1 and rep["partials_computed"] == 0, rep
    t = IcebergTable(w.path)
    assert {c: t.column_ndv(c) for c in ("k", "u")} == truth(t)
    # compaction commits a "replace" snapshot — the window path's
    # unconditional full-rebuild case; partials re-derive the new
    # file's sketches and stay exact
    compact_files_spark(w, spark, min_file_bytes=1 << 20)
    _, mode = refresh_table_statistics(w, spark)
    assert mode == "partials", mode
    rep = w.last_theta_refresh
    assert rep["dirty_files"] == 0 and rep["partials_computed"] >= 1, rep
    t = IcebergTable(w.path)
    assert {c: t.column_ndv(c) for c in ("k", "u")} == truth(t)


def test_theta_partials_survive_expiry_and_orphan_sweep(spark, tmp_path):
    """Blob lifecycle composition for the r13 per-file sketch partials:
    snapshot expiry REATTACHES the raw-file entries to the surviving
    head (they describe immutable files, not snapshot state), the
    orphan sweep reclaims superseded puffins from disk, and coverage
    still answers — the next refresh computes zero new partials."""
    import os

    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.theta import (
        refresh_grouped_theta_statistics,
        write_grouped_theta_statistics,
    )
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        expire_snapshots,
        remove_orphan_files,
    )

    w = IcebergWriter(
        str(tmp_path / "sv"),
        [
            {"id": 1, "name": "seg", "type": "string", "required": False},
            {"id": 2, "name": "u", "type": "long", "required": False},
        ],
    )
    w.append([{"seg": "a", "u": i} for i in range(40)])
    write_grouped_theta_statistics(w, spark, ["seg"], ["u"])
    for r in range(10):
        w.append([{"seg": "ab"[r % 2], "u": 100 * r + i} for i in range(20)])
        refresh_grouped_theta_statistics(w, spark)
    # expire everything but the head: partials entries on expired
    # snapshots must reattach, not die
    expired = expire_snapshots(w, keep_last=1)
    assert expired, "nothing expired — fixture too small"
    removed = remove_orphan_files(w.path)
    assert any(p.endswith(".puffin") for p in removed), removed
    t = IcebergTable(w.path)
    for e in t.table_statistics():
        assert os.path.exists(e["statistics-path"]), e["statistics-path"]
    rep = refresh_grouped_theta_statistics(w, spark)
    assert rep["partials_computed"] == 0, rep
    t = IcebergTable(w.path)
    got = {r.seg: r.ndv for r in t.ndv_groupby(spark, "u", ["seg"]).collect()}
    assert t.last_ndv_groupby["route"] == "stats"
    assert got == _gndv_truth(t, spark), got


def test_grouped_ndv_refresh_randomized_differential(spark, tmp_path):
    """Seeded lifecycle differential: after EVERY commit window — mixed
    appends (NULL group keys included), eq-deletes, and a compaction —
    the incrementally-refreshed grouped blob equals the exact
    COUNT(DISTINCT) truth group-for-group, and the partial pass never
    reads more than the files the window added."""
    import random

    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.theta import (
        refresh_grouped_theta_statistics,
        write_grouped_theta_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter, compact_files_spark

    rng = random.Random(13)
    w = IcebergWriter(
        str(tmp_path / "rd"),
        [
            {"id": 1, "name": "seg", "type": "string", "required": False},
            {"id": 2, "name": "u", "type": "long", "required": False},
        ],
    )
    segs = ["a", "b", "c", None]

    def batch(n):
        return [
            {"seg": rng.choice(segs), "u": rng.randrange(200)}
            for _ in range(n)
        ]

    w.append(batch(150))
    write_grouped_theta_statistics(w, spark, ["seg"], ["u"])
    refresh_grouped_theta_statistics(w, spark)  # bootstrap partials

    def live_paths():
        return {
            f["file_path"]
            for f in IcebergTable(w.path).plan_files(None)
        }

    files_before = live_paths()
    for step in range(6):
        action = rng.choice(["append", "append", "delete", "compact"])
        if action == "append":
            w.append(batch(rng.randrange(30, 80)))
        elif action == "delete":
            w.delete_rows_equality(
                [{"u": rng.randrange(200)} for _ in range(5)]
            )
        else:
            compact_files_spark(w, spark, min_file_bytes=1 << 20)
        files_now = live_paths()
        rep = refresh_grouped_theta_statistics(w, spark)
        # O-bound: partials only for FILES this window introduced
        assert rep["partials_computed"] <= len(files_now - files_before), (
            step, action, rep,
        )
        files_before = files_now
        t = IcebergTable(w.path)
        got = {
            r.seg: r.ndv
            for r in t.ndv_groupby(spark, "u", ["seg"]).collect()
        }
        assert t.last_ndv_groupby["route"] == "stats", (step, action)
        assert got == _gndv_truth(t, spark), (step, action, got)


def test_global_ndv_refresh_preserves_lg_k(spark, tmp_path):
    """r13 advisor (medium): a table opted into per-file partials at a
    NON-default lg_k must refresh at that lg_k — deserializing stored
    sketches and bootstrapping missing files at the k=4096 default
    would silently narrow the exact-below-k guarantee the opt-in paid
    for.  The stored blob payload's lg_k is authoritative."""
    import json as _json

    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.puffin import read_blob
    from daskberg_spark.iceberg.theta import (
        GROUPED_THETA_FILE_BLOB_TYPE,
        refresh_column_sketches_from_partials,
        write_file_theta_partials,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "lgk"),
        [{"id": 1, "name": "u", "type": "long", "required": False}],
    )
    w.append([{"u": i} for i in range(100)])
    write_file_theta_partials(w, spark, lg_k=14)
    # append a file: its bootstrap partials must also be written at 14
    w.append([{"u": 1000 + i} for i in range(50)])
    merged, rep = refresh_column_sketches_from_partials(w, spark)
    assert rep["partials_computed"] == 1, rep
    assert merged["u"].lg_k == 14, merged["u"].lg_k
    t = IcebergTable(w.path)
    lg_ks = set()
    for e in t.metadata.get("statistics", []):
        for b in e.get("blob-metadata", []):
            if b.get("type") != GROUPED_THETA_FILE_BLOB_TYPE:
                continue
            payload = _json.loads(
                read_blob(t._relocate(e["statistics-path"]), b)
            )
            if payload.get("group_cols") == []:
                lg_ks.add(payload.get("lg_k"))
    assert lg_ks == {14}, lg_ks


def test_grouped_partials_gate_single_pass(spark, tmp_path):
    """r13 advisor (low): the max_groups gate on the partials writer
    rides INSIDE the sketch pass (no separate distinct().count() scan)
    and still refuses loudly — as a plain ValueError — above the cap."""
    import pytest

    from daskberg_spark.iceberg.theta import (
        write_file_grouped_theta_partials,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "g1p"),
        [
            {"id": 1, "name": "k", "type": "long", "required": False},
            {"id": 2, "name": "v", "type": "long", "required": False},
        ],
    )
    w.append([{"k": i, "v": i % 7} for i in range(40)])
    with pytest.raises(ValueError, match="metadata-sized"):
        write_file_grouped_theta_partials(
            w, spark, ["k"], ["v"], max_groups=5
        )
    # under the cap: same call succeeds in the one pass
    assert (
        write_file_grouped_theta_partials(
            w, spark, ["k"], ["v"], max_groups=100
        )
        is not None
    )


def test_mutual_pin_conditionals_use_one_rung(spark, tmp_path):
    """r13 advisor (low): with 1:1-nested columns a↔b and grouped theta
    blobs keyed BOTH ways, scoring clause a at 1/ndv(a|b) AND clause b
    at 1/ndv(b|a) multiplies two conditionals of each other — the
    product approaches 1.0 and the estimate balloons to the full table.
    The fix conditions at most ONE clause of a mutually-pinned pair;
    the other falls to its marginal, landing near the true count."""
    from daskberg_spark.iceberg.cbo import estimated_rows
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.theta import write_grouped_theta_statistics
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        write_table_statistics,
    )

    w = IcebergWriter(
        str(tmp_path / "mp"),
        [
            {"id": 1, "name": "a", "type": "long", "required": False},
            {"id": 2, "name": "b", "type": "long", "required": False},
        ],
    )
    # a and b are 1:1 (b = a + 100): 10 groups, 100 rows each
    w.append([{"a": i % 10, "b": i % 10 + 100} for i in range(1000)])
    write_table_statistics(w, spark)
    # multi-config (r14): both groupings coexist on one snapshot —
    # exactly the both-ways state the advisor's scenario needs
    write_grouped_theta_statistics(w, spark, ["a"], ["b"])
    write_grouped_theta_statistics(w, spark, ["b"], ["a"])
    t = IcebergTable(w.path)
    from daskberg_spark.iceberg.cbo import _grouped_ndv_eq_selectivity

    conj = [("a", "==", 3), ("b", "==", 103)]
    # precondition: BOTH conditional lookups fire (else the test is
    # vacuous) — each returns 1/ndv = 1.0 with its consumed pin
    assert _grouped_ndv_eq_selectivity(t, "a", conj) == (1.0, ("b",))
    assert _grouped_ndv_eq_selectivity(t, "b", conj) == (1.0, ("a",))
    # ndv(a|b)=ndv(b|a)=1: the double-conditional bug would score
    # 1·1 = 1.0 → 1000 rows; one-rung + marginal lands at ~100 (truth)
    est = estimated_rows(t, [("a", "==", 3), ("b", "==", 103)])
    assert est <= 250, est
    assert est >= 50, est


def test_grouped_ndv_timestamp_and_derived_keys(spark, tmp_path):
    """r14: 'distinct users per DAY/HOUR' on a real timestamp column.
    Derived ``day(ts)`` / ``hour(ts)`` specs compute codegen keys under
    the spec name; the blob stores the spec verbatim; ``ndv_groupby``
    matches on the same string and decodes keys back to date/datetime.
    The incremental refresh stays O(new files) — hard-asserted — and
    in exact mode the values equal COUNT(DISTINCT) bit-for-bit.  Raw
    timestamp keys round-trip too (ISO-micros codec)."""
    import datetime as dt

    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from pyspark.sql import functions as F

    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.theta import (
        refresh_grouped_theta_statistics,
        write_grouped_theta_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "tsk"),
        [
            {"id": 1, "name": "ts", "type": "timestamp", "required": False},
            {"id": 2, "name": "u", "type": "long", "required": False},
        ],
    )
    base = dt.datetime(2024, 3, 1)

    def rows(lo, hi):
        return [
            {"ts": base + dt.timedelta(hours=i % 50), "u": i % 23}
            for i in range(lo, hi)
        ]

    w.append(rows(0, 300))
    w.append(rows(300, 500))
    write_grouped_theta_statistics(w, spark, ["day(ts)"], ["u"])
    rep = refresh_grouped_theta_statistics(w, spark)
    assert rep["partials_computed"] == 2, rep
    # append one file: the refresh partial-scans ONLY it
    w.append(
        [
            {"ts": base + dt.timedelta(days=30, hours=i % 5), "u": 100 + i}
            for i in range(50)
        ]
    )
    rep = refresh_grouped_theta_statistics(w, spark)
    assert rep["files_total"] == 3 and rep["partials_computed"] == 1, rep
    t = IcebergTable(w.path)
    out = t.ndv_groupby(spark, "u", ["day(ts)"])
    assert t.last_ndv_groupby["route"] == "stats", t.last_ndv_groupby
    assert t.last_scan["files_scanned"] == 0, t.last_scan
    got = {r["day(ts)"]: r["ndv"] for r in out.collect()}
    assert all(isinstance(k, dt.date) for k in got), got
    truth = {
        r["day"]: r["ndv"]
        for r in t.to_df(spark)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count_distinct("u").alias("ndv"))
        .collect()
    }
    assert got == truth, (got, truth)
    # the SCAN fallback (different grouping) also understands specs
    out2 = t.ndv_groupby(spark, "u", ["hour(ts)"])
    assert t.last_ndv_groupby["route"] == "scan"
    got2 = {r["hour(ts)"]: r["ndv"] for r in out2.collect()}
    truth2 = {
        r["h"]: r["ndv"]
        for r in t.to_df(spark)
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count_distinct("u").alias("ndv"))
        .collect()
    }
    assert got2 == truth2

    # RAW timestamp keys: hour(ts) blob via the derived spec, then a
    # raw-ts grouping (50 + 5 distinct instants — under max_groups)
    write_grouped_theta_statistics(w, spark, ["ts"], ["u"])
    refresh_grouped_theta_statistics(w, spark)
    t = IcebergTable(w.path)
    out3 = t.ndv_groupby(spark, "u", ["ts"])
    assert t.last_ndv_groupby["route"] == "stats"
    got3 = {r["ts"]: r["ndv"] for r in out3.collect()}
    assert all(isinstance(k, dt.datetime) for k in got3)
    truth3 = {
        r["ts"]: r["ndv"]
        for r in t.to_df(spark)
        .groupBy("ts")
        .agg(F.count_distinct("u").alias("ndv"))
        .collect()
    }
    assert got3 == truth3


def test_grouped_ndv_multi_config(spark, tmp_path):
    """r14: MULTIPLE groupings coexist and refresh together — "NDV by
    seg" AND "NDV by day" on one table.  Writing the second config no
    longer clobbers the first (config-scoped replacement), ONE refresh
    advances both incrementally (partials shared per grouping), both
    serve metadata-only, and dropping one leaves the other."""
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from pyspark.sql import functions as F

    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.theta import (
        drop_grouped_theta_statistics,
        refresh_grouped_theta_statistics,
        write_grouped_theta_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "mc"),
        [
            {"id": 1, "name": "seg", "type": "string", "required": False},
            {"id": 2, "name": "src", "type": "string", "required": False},
            {"id": 3, "name": "u", "type": "long", "required": False},
        ],
    )

    def rows(lo, hi):
        return [
            {"seg": f"s{i % 3}", "src": f"w{i % 4}", "u": i % 29}
            for i in range(lo, hi)
        ]

    w.append(rows(0, 300))
    write_grouped_theta_statistics(w, spark, ["seg"], ["u"])
    write_grouped_theta_statistics(w, spark, ["src"], ["u"])
    t = IcebergTable(w.path)
    # both configs live on the same snapshot (no clobber)
    assert t.grouped_column_ndv("u", ["seg"]) is not None
    assert t.grouped_column_ndv("u", ["src"]) is not None
    # ONE refresh advances BOTH configs after an append
    w.append(rows(300, 400))
    rep = refresh_grouped_theta_statistics(w, spark)
    assert len(rep["configs"]) == 2, rep
    by_gc = {tuple(r["group_cols"]): r for r in rep["configs"]}
    # each config partial-scanned only the new file (bootstrap covered
    # file 1 per config: 1 bootstrap + 1 new = 2 on first refresh)
    assert by_gc[("seg",)]["partials_computed"] == 2
    assert by_gc[("src",)]["partials_computed"] == 2
    w.append(rows(400, 450))
    rep = refresh_grouped_theta_statistics(w, spark)
    assert all(r["partials_computed"] == 1 for r in rep["configs"]), rep
    t = IcebergTable(w.path)
    truth_df = t.to_df(spark)
    for gcol in ("seg", "src"):
        got = {
            r[gcol]: r.ndv
            for r in t.ndv_groupby(spark, "u", [gcol]).collect()
        }
        assert t.last_ndv_groupby["route"] == "stats", gcol
        truth = {
            r[gcol]: r.ndv
            for r in truth_df.groupBy(gcol)
            .agg(F.count_distinct("u").alias("ndv"))
            .collect()
        }
        assert got == truth, (gcol, got, truth)
    # dropping one grouping leaves the other maintained
    dropped = drop_grouped_theta_statistics(w, ["src"])
    assert dropped >= 1
    rep = refresh_grouped_theta_statistics(w, spark)
    assert "configs" not in rep and rep["group_cols"] == ["seg"], rep
    t = IcebergTable(w.path)
    assert t.grouped_column_ndv("u", ["src"]) is None
    assert t.grouped_column_ndv("u", ["seg"]) is not None


def test_grouped_ndv_mixed_derived_and_plain_keys(spark, tmp_path):
    """r14 composition: a grouping mixing a derived day(ts) key with a
    plain column — "distinct users per (day, segment)" — builds,
    refreshes incrementally, and serves metadata-only with keys
    decoding to (date, string)."""
    import datetime as dt

    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from pyspark.sql import functions as F

    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.theta import (
        refresh_grouped_theta_statistics,
        write_grouped_theta_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "mx"),
        [
            {"id": 1, "name": "ts", "type": "timestamp", "required": False},
            {"id": 2, "name": "seg", "type": "string", "required": False},
            {"id": 3, "name": "u", "type": "long", "required": False},
        ],
    )
    base = dt.datetime(2024, 5, 1)

    def rows(lo, hi):
        return [
            {
                "ts": base + dt.timedelta(hours=i % 48),
                "seg": f"s{i % 2}",
                "u": i % 19,
            }
            for i in range(lo, hi)
        ]

    w.append(rows(0, 200))
    write_grouped_theta_statistics(w, spark, ["day(ts)", "seg"], ["u"])
    refresh_grouped_theta_statistics(w, spark)
    w.append(rows(200, 260))
    rep = refresh_grouped_theta_statistics(w, spark)
    assert rep["partials_computed"] == 1, rep
    t = IcebergTable(w.path)
    out = t.ndv_groupby(spark, "u", ["day(ts)", "seg"])
    assert t.last_ndv_groupby["route"] == "stats", t.last_ndv_groupby
    got = {
        (r["day(ts)"], r["seg"]): r["ndv"] for r in out.collect()
    }
    assert all(
        isinstance(k[0], dt.date) and isinstance(k[1], str) for k in got
    ), got
    truth = {
        (r["d"], r["seg"]): r["ndv"]
        for r in t.to_df(spark)
        .groupBy(F.to_date("ts").alias("d"), "seg")
        .agg(F.count_distinct("u").alias("ndv"))
        .collect()
    }
    assert got == truth, (got, truth)


def test_multi_config_head_gate_is_per_config(spark, tmp_path):
    """r15 (advisor): a manual head-covering write of ONE grouping
    must not starve the OTHER grouping's nightly refresh.  After an
    append, re-writing only the "seg" grouping used to make
    maintain()/refresh_all_statistics skip the whole family (per-TYPE
    head gate) — "src" silently stopped refreshing.  The per-config
    gate refreshes exactly the uncovered grouping."""
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from pyspark.sql import functions as F

    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.theta import (
        refresh_grouped_theta_statistics,
        write_grouped_theta_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter
    from daskberg_spark.iceberg.writer import refresh_all_statistics

    w = IcebergWriter(
        str(tmp_path / "pcg"),
        [
            {"id": 1, "name": "seg", "type": "string", "required": False},
            {"id": 2, "name": "src", "type": "string", "required": False},
            {"id": 3, "name": "u", "type": "long", "required": False},
        ],
    )

    def rows(lo, hi):
        return [
            {"seg": f"s{i % 3}", "src": f"w{i % 4}", "u": i % 29}
            for i in range(lo, hi)
        ]

    w.append(rows(0, 300))
    write_grouped_theta_statistics(w, spark, ["seg"], ["u"])
    write_grouped_theta_statistics(w, spark, ["src"], ["u"])
    refresh_grouped_theta_statistics(w, spark)  # bootstrap partials
    # append, then manually re-cover ONLY "seg" at the new head
    w.append(rows(300, 400))
    write_grouped_theta_statistics(w, spark, ["seg"], ["u"])
    # the per-config gate refreshes exactly the uncovered grouping
    rep = refresh_grouped_theta_statistics(
        w, spark, skip_head_covered=True
    )
    assert rep is not None and "configs" not in rep, rep
    assert rep["group_cols"] == ["src"], rep
    t = IcebergTable(w.path)
    got = {
        r["src"]: r.ndv for r in t.ndv_groupby(spark, "u", ["src"]).collect()
    }
    assert t.last_ndv_groupby["route"] == "stats"
    truth = {
        r["src"]: r.ndv
        for r in t.to_df(spark)
        .groupBy("src")
        .agg(F.count_distinct("u").alias("ndv"))
        .collect()
    }
    assert got == truth, (got, truth)
    # steady state: everything covered, the gated refresh is a no-op
    assert (
        refresh_grouped_theta_statistics(w, spark, skip_head_covered=True)
        is None
    )
    # and the full stats-only entry point agrees end to end: another
    # append + manual "src"-only cover, then refresh_all_statistics
    # catches "seg" up (the r14 per-type gate returned None here)
    w.append(rows(400, 450))
    write_grouped_theta_statistics(w, spark, ["src"], ["u"])
    report = refresh_all_statistics(w, spark)
    assert report["refresh_grouped_ndv"] is not None, report
    t = IcebergTable(w.path)
    got = {
        r["seg"]: r.ndv for r in t.ndv_groupby(spark, "u", ["seg"]).collect()
    }
    assert t.last_ndv_groupby["route"] == "stats"
    truth = {
        r["seg"]: r.ndv
        for r in t.to_df(spark)
        .groupBy("seg")
        .agg(F.count_distinct("u").alias("ndv"))
        .collect()
    }
    assert got == truth, (got, truth)


def test_drop_grouped_statistics_keeps_unreadable_entries(spark, tmp_path):
    """r15 (advisor): a transient read error on a DIFFERENT grouping's
    blob must not delete it during drop_grouped_theta_statistics —
    unreadable entries are kept unless drop_unreadable=True."""
    import os

    from daskberg_spark.iceberg.theta import (
        drop_grouped_theta_statistics,
        write_grouped_theta_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "dru"),
        [
            {"id": 1, "name": "seg", "type": "string", "required": False},
            {"id": 2, "name": "src", "type": "string", "required": False},
            {"id": 3, "name": "u", "type": "long", "required": False},
        ],
    )
    w.append(
        [
            {"seg": f"s{i % 3}", "src": f"w{i % 4}", "u": i}
            for i in range(50)
        ]
    )
    write_grouped_theta_statistics(w, spark, ["seg"], ["u"])
    write_grouped_theta_statistics(w, spark, ["src"], ["u"])
    # simulate a transient IO failure on the "seg" grouping's blob
    seg_path = next(
        e["statistics-path"]
        for e in w.statistics
        if "grouped" in str(e.get("blob-metadata"))
    )
    os.rename(seg_path, seg_path + ".offline")
    try:
        dropped = drop_grouped_theta_statistics(w, ["src"])
    finally:
        os.rename(seg_path + ".offline", seg_path)
    # the readable "src" entry dropped; the unreadable one survived
    assert dropped == 1, dropped
    assert any(
        e["statistics-path"] == seg_path for e in w.statistics
    ), "unreadable entry must survive a drop of a different grouping"
    # explicit corrupt-sweep still works
    os.rename(seg_path, seg_path + ".offline")
    try:
        dropped = drop_grouped_theta_statistics(
            w, ["seg"], drop_unreadable=True
        )
    finally:
        os.rename(seg_path + ".offline", seg_path)
    assert dropped == 1, dropped


def test_full_table_write_pregates_before_building(spark, tmp_path, monkeypatch):
    """r15 (advisor): the full-table grouped write refuses a blown-out
    grouping BEFORE building/collecting sketches — the exact in-pass
    gates still bound legit groupings, but a >>max_groups key space
    must not collect T·max_groups partial rows first.  Asserted by
    making the sketch builder unreachable."""
    import daskberg_spark.iceberg.theta as theta
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "pg"),
        [
            {"id": 1, "name": "k", "type": "long", "required": False},
            {"id": 2, "name": "u", "type": "long", "required": False},
        ],
    )
    w.append([{"k": i, "u": i % 7} for i in range(4000)])

    def boom(*a, **kw):
        raise AssertionError("sketch pass ran despite the pre-gate")

    monkeypatch.setattr(theta, "build_grouped_column_sketches", boom)
    with pytest.raises(ValueError, match="metadata-sized"):
        theta.write_grouped_theta_statistics(
            w, spark, ["k"], ["u"], max_groups=100
        )


def test_grouped_ndv_month_year_keys(spark, tmp_path):
    """r15 (brief #6): month()/year() rollup-horizon group keys — the
    same spec machinery as day(), DATE-typed results (first of month /
    Jan 1, ISO convention).  Lifecycle: refresh stays O(new files)
    (hard-asserted), stats route equals COUNT(DISTINCT) bit-for-bit,
    and percentile_groupby round-trips the same keys on the quantile
    family."""
    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from pyspark.sql import functions as F

    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.quantiles import (
        refresh_grouped_quantile_statistics,
        write_grouped_quantile_statistics,
    )
    from daskberg_spark.iceberg.theta import (
        refresh_grouped_theta_statistics,
        write_grouped_theta_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "my"),
        [
            {"id": 1, "name": "ts", "type": "timestamp", "required": False},
            {"id": 2, "name": "u", "type": "long", "required": False},
        ],
    )
    base = dt.datetime(2023, 11, 20)

    def rows(lo, hi):
        return [
            {"ts": base + dt.timedelta(days=(i * 13) % 400, hours=i % 24),
             "u": (i * 7) % 53}
            for i in range(lo, hi)
        ]

    w.append(rows(0, 600))
    w.append(rows(600, 1000))
    write_grouped_theta_statistics(w, spark, ["month(ts)"], ["u"])
    write_grouped_theta_statistics(w, spark, ["year(ts)"], ["u"])
    write_grouped_quantile_statistics(w, spark, ["year(ts)"], ["u"])
    refresh_grouped_theta_statistics(w, spark)
    refresh_grouped_quantile_statistics(w, spark)
    # append ONE file: each grouping partial-scans only it
    w.append(rows(1000, 1200))
    rep = refresh_grouped_theta_statistics(w, spark)
    assert {tuple(r["group_cols"]) for r in rep["configs"]} == {
        ("month(ts)",),
        ("year(ts)",),
    }, rep
    assert all(r["partials_computed"] == 1 for r in rep["configs"]), rep
    qrep = refresh_grouped_quantile_statistics(w, spark)
    assert qrep["partials_computed"] == 1, qrep

    t = IcebergTable(w.path)
    for spec, trunc in (("month(ts)", "month"), ("year(ts)", "year")):
        out = t.ndv_groupby(spark, "u", [spec])
        assert t.last_ndv_groupby["route"] == "stats", (spec, t.last_ndv_groupby)
        assert t.last_scan["files_scanned"] == 0
        got = {r[spec]: r["ndv"] for r in out.collect()}
        assert all(isinstance(k, dt.date) for k in got), got
        truth = {
            r["g"]: r["ndv"]
            for r in t.to_df(spark)
            .groupBy(F.trunc(F.to_date("ts"), trunc).alias("g"))
            .agg(F.count_distinct("u").alias("ndv"))
            .collect()
        }
        assert got == truth, (spec, got, truth)
    # quantile family: per-year p50 from the blob, decode round-trip
    out = t.percentile_groupby(
        spark, [("u", 0.5, "p50")], ["year(ts)"]
    )
    assert t.last_percentile_groupby["route"] == "stats"
    got = {r["year(ts)"]: r["p50"] for r in out.collect()}
    assert all(isinstance(k, dt.date) for k in got), got
    truth = {
        r["g"]: r["p50"]
        for r in t.to_df(spark)
        .groupBy(F.trunc(F.to_date("ts"), "year").alias("g"))
        .agg(
            F.expr("percentile(u, 0.5)").cast("long").alias("p50")
        )
        .collect()
    }
    assert set(got) == set(truth), (got, truth)
    # over non-temporal bases the specs refuse loudly
    with pytest.raises(ValueError, match="timestamp/date base"):
        write_grouped_theta_statistics(w, spark, ["month(u)"], ["u"])
