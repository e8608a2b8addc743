"""Hilbert-curve clustering (hilbert.py): the pure-Python reference is
a genuine Hilbert curve (bijection + unit steps — the curve's defining
characterization), the Catalyst and SQL forms match it bit-exactly,
and compaction with curve="hilbert" prunes box queries at least as
hard as Morton at the same file count."""

from __future__ import annotations

import random

import daskberg_spark.iceberg.scan  # noqa: F401  (attaches .to_df)

import pytest


def test_reference_is_a_hilbert_curve():
    from daskberg_spark.iceberg.hilbert import hilbert_index

    for n, bits in ((2, 5), (3, 3)):
        side = 1 << bits
        cells = {}
        coords = [[]]
        for _ in range(n):
            coords = [c + [v] for c in coords for v in range(side)]
        for c in coords:
            cells[hilbert_index(c, bits)] = tuple(c)
        # bijection onto [0, side^n)
        assert sorted(cells) == list(range(side**n))
        # unit steps: consecutive indices differ by 1 in exactly 1 axis
        prev = cells[0]
        for h in range(1, side**n):
            cur = cells[h]
            assert sum(abs(a - b) for a, b in zip(cur, prev)) == 1, (
                n,
                h,
                prev,
                cur,
            )
            prev = cur


def test_catalyst_matches_reference(spark):
    from daskberg_spark.iceberg.hilbert import hilbert_attach, hilbert_index

    rng = random.Random(7)
    bits = 8
    rows = [
        (
            i,
            rng.randrange(1 << bits),
            rng.randrange(1 << bits),
            rng.randrange(1 << bits),
        )
        for i in range(400)
    ]
    # corner rows pin min-max normalization to the identity map
    rows += [(9001, 0, 0, 0), (9002, 255, 255, 255)]
    df = spark.createDataFrame(rows, ["rid", "a", "b", "c"])
    for cols in (["a", "b"], ["a", "b", "c"]):
        out = hilbert_attach(df, cols, out_col="hv", bits=bits)
        got = {r["rid"]: r["hv"] for r in out.collect()}
        exp = {
            r[0]: hilbert_index([r[1 + i] for i in range(len(cols))], bits)
            for r in rows
        }
        assert got == exp, cols


def test_sql_generator_matches_reference():
    import duckdb
    import pandas as pd

    from daskberg_spark.iceberg.hilbert import hilbert_index, sql_hilbert_ctes

    rng = random.Random(11)
    bits = 6
    rows = [
        (i, rng.randrange(1 << bits), rng.randrange(1 << bits))
        for i in range(300)
    ]
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["rid", "a", "b"]))
    ctes = sql_hilbert_ctes("base", ["a", "b"], bits, carry=["rid"])
    got = dict(
        con.execute(
            f"WITH base AS (SELECT rid, a, b FROM t),\n{ctes}\n"
            "SELECT rid, hval FROM h_out"
        ).fetchall()
    )
    assert got == {rid: hilbert_index([a, b], bits) for rid, a, b in rows}


def test_validation():
    from daskberg_spark.iceberg.hilbert import default_bits, hilbert_attach

    assert default_bits(2) == 10 and default_bits(7) == 8
    with pytest.raises(ValueError, match=">= 2 columns"):
        hilbert_attach(None, ["x"])
    with pytest.raises(ValueError, match="64-bit"):
        hilbert_attach(None, ["x", "y", "z"], bits=21)


def test_hilbert_composes_with_rank_normalization(spark, tmp_path):
    """curve="hilbert" under zorder_rank_normalize: the skewed axis
    maps through its measured CDF before the curve transform — content
    identical, rewrite commits, and the head-band query still prunes."""
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        compact_files_spark,
    )

    w = IcebergWriter(
        str(tmp_path / "t"),
        [
            {"id": 1, "name": "x", "type": "long", "required": False},
            {"id": 2, "name": "y", "type": "long", "required": False},
        ],
    )
    rows = [
        {
            "x": ((i * 37) % 100) if i % 20 else 1000 + (i * 9973) % 1_000_000,
            "y": (i * 13) % 1000,
        }
        for i in range(4000)
    ]
    for b in range(4):
        w.append(rows[b::4])
    before = sorted(
        (r["x"], r["y"]) for r in IcebergTable(w.path).to_df(spark).collect()
    )
    assert (
        compact_files_spark(
            w,
            spark,
            target_partitions=16,
            zorder_by=["x", "y"],
            zorder_rank_normalize=True,
            curve="hilbert",
        )
        is not None
    )
    t = IcebergTable(w.path)
    after = sorted((r["x"], r["y"]) for r in t.to_df(spark).collect())
    assert after == before
    pred = [("x", ">=", 20), ("x", "<=", 29), ("y", ">=", 100), ("y", "<=", 199)]
    assert len(t.plan_files(pred)) < 16  # head band prunes despite skew
    got = sorted(
        (r["x"], r["y"]) for r in t.to_df(spark, filters=pred).collect()
    )
    assert got == [
        p for p in before if 20 <= p[0] <= 29 and 100 <= p[1] <= 199
    ]


def test_compaction_hilbert_never_prunes_worse_than_morton(spark, tmp_path):
    """Same uniform 2-D data, same normalization, same 16 output files:
    over a sweep of box queries the Hilbert rewrite plans <= the Morton
    rewrite's file total (unit-step locality -> tighter per-file
    bounds), is strictly better on at least one box, and content is
    identical either way."""
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        compact_files_spark,
    )

    def build(name):
        w = IcebergWriter(
            str(tmp_path / name),
            [
                {"id": 1, "name": "x", "type": "long", "required": False},
                {"id": 2, "name": "y", "type": "long", "required": False},
            ],
        )
        rows = [
            {"x": (i * 37) % 256, "y": (i * 13) % 256} for i in range(4096)
        ]
        for b in range(4):
            w.append(rows[b::4])
        return w

    boxes = [
        [("x", ">=", lo), ("x", "<=", lo + 31), ("y", ">=", lo2), ("y", "<=", lo2 + 31)]
        for lo in (0, 64, 160)
        for lo2 in (32, 128, 224)
    ]
    planned = {}
    rowsets = {}
    for name, curve in (("mort", "morton"), ("hilb", "hilbert")):
        w = build(name)
        assert (
            compact_files_spark(
                w,
                spark,
                target_partitions=16,
                zorder_by=["x", "y"],
                curve=curve,
            )
            is not None
        )
        t = IcebergTable(w.path)
        planned[name] = [len(t.plan_files(b)) for b in boxes]
        rowsets[name] = sorted(
            (r["x"], r["y"]) for r in t.to_df(spark).collect()
        )
    assert rowsets["hilb"] == rowsets["mort"]  # clustering never edits data
    assert sum(planned["hilb"]) < sum(planned["mort"]), planned
    assert all(h <= m + 1 for h, m in zip(planned["hilb"], planned["mort"])), (
        planned
    )


def test_fold_form_matches_reference_at_deep_bits(spark):
    """bits >= FOLD_MIN_BITS routes to the constant-depth aggregate()
    fold (r12) — same bijection as the pure-Python reference at a grid
    depth the unrolled chain cannot afford to plan (16 bits took ~37 s
    to analyze; the fold plans in constant time)."""
    import time

    from daskberg_spark.iceberg.hilbert import hilbert_attach, hilbert_index

    rng = random.Random(11)
    bits = 16
    top = (1 << bits) - 1
    rows = [
        (i, rng.randrange(1 << bits), rng.randrange(1 << bits))
        for i in range(300)
    ]
    rows += [(9001, 0, 0), (9002, top, top)]  # pin min-max to identity
    df = spark.createDataFrame(rows, ["rid", "a", "b"])
    t0 = time.perf_counter()
    out = hilbert_attach(df, ["a", "b"], out_col="hv", bits=bits)
    got = {r["rid"]: r["hv"] for r in out.collect()}
    elapsed = time.perf_counter() - t0
    exp = {r[0]: hilbert_index([r[1], r[2]], bits) for r in rows}
    assert got == exp
    # generous wall guard: the chain took ~37 s here; the fold must be
    # nowhere near that (typically ~2 s incl. the job itself)
    assert elapsed < 15, f"fold path took {elapsed:.1f}s"


def test_fold_form_equals_unrolled_chain(spark):
    """At a depth both forms afford, the fold and the unrolled chain
    produce the identical index for every row — the two Catalyst
    implementations never diverge."""
    from pyspark.sql import functions as F

    from daskberg_spark.iceberg.hilbert import _attach_fold, hilbert_attach

    rng = random.Random(23)
    bits = 8
    rows = [
        (
            i,
            rng.randrange(1 << bits),
            rng.randrange(1 << bits),
            rng.randrange(1 << bits),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["rid", "a", "b", "c"])
    for cols in (["a", "b"], ["a", "b", "c"]):
        chain = hilbert_attach(
            df, cols, out_col="hv", bits=bits, normalize=False
        )
        names = [f"__hx{i}" for i in range(len(cols))]
        staged = df.select(
            "*",
            *[F.col(c).cast("long").alias(nm) for c, nm in zip(cols, names)],
        )
        fold = _attach_fold(staged, names, bits, len(cols), "hv")
        a = {r["rid"]: r["hv"] for r in chain.collect()}
        b = {r["rid"]: r["hv"] for r in fold.collect()}
        assert a == b, cols
