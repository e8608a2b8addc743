"""Statistics-driven join ordering (``iceberg/cbo.py``): the consumer
of the theta NDV blobs + manifest counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from daskberg_spark.iceberg.cbo import (
    JoinDim,
    cbo_join,
    estimated_rows,
    plan_star_join,
)
from daskberg_spark.iceberg.fixtures import ensure_cbo_fixture
from daskberg_spark.iceberg.metadata import IcebergTable


@pytest.fixture(scope="module")
def cbo_tables(spark):
    paths = ensure_cbo_fixture(spark)
    return {k: IcebergTable(v) for k, v in paths.items()}


def test_estimated_rows_uses_ndv(cbo_tables):
    big = cbo_tables["big"]
    total = estimated_rows(big)
    assert total == 1000.0
    # equality on a stats column refines by 1/ndv (bcat has 20 values)
    est = estimated_rows(big, [("bcat", "==", "c3")])
    assert est == pytest.approx(1000.0 / 20, rel=0.01)
    # range predicate: classic 1/3 default
    est_r = estimated_rows(big, [("bid", "<", 10_000)])
    assert est_r == pytest.approx(1000.0 / 3, rel=0.01)


def test_plan_orders_most_selective_first(cbo_tables):
    plan = plan_star_join(
        cbo_tables["fact"],
        [
            JoinDim(cbo_tables["small"], "k_small", "sid", name="small"),
            JoinDim(
                cbo_tables["big"],
                "k_big",
                "bid",
                filters=[("bcat", "==", "c3")],
                name="big",
            ),
        ],
    )
    # filtered big: ~50 rows / ndv 1000 = 0.05 growth;
    # unfiltered small: 10 / 10 = 1.0 growth -> big joins first
    assert plan.order == ["big", "small"]
    assert plan.estimates["big"] < plan.estimates["small"]
    # both dims are metadata-small -> broadcast hints
    assert set(plan.broadcasts) == {"big", "small"}


def test_cbo_join_matches_naive_order(spark, cbo_tables):
    import daskberg_spark.iceberg.scan  # noqa: F401

    dims = [
        JoinDim(cbo_tables["small"], "k_small", "sid", name="small"),
        JoinDim(
            cbo_tables["big"],
            "k_big",
            "bid",
            filters=[("bcat", "==", "c3")],
            name="big",
        ),
    ]
    opt = (
        cbo_join(spark, cbo_tables["fact"], dims)
        .groupBy("sname")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("amt"))
    )
    # naive: literal order, no hints
    f = cbo_tables["fact"].to_df(spark)
    s = cbo_tables["small"].to_df(spark)
    b = cbo_tables["big"].to_df(spark, filters=[("bcat", "==", "c3")])
    naive = (
        f.join(s, f["k_small"] == s["sid"])
        .join(b, f["k_big"] == b["bid"])
        .groupBy("sname")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("amt"))
    )
    got = {(r["sname"], r["n"], round(r["amt"], 6)) for r in opt.collect()}
    ref = {(r["sname"], r["n"], round(r["amt"], 6)) for r in naive.collect()}
    assert got == ref and got
    # the chosen plan is observable
    assert cbo_tables["fact"].last_join_plan.order == ["big", "small"]
    # broadcast hints reached the physical plan
    phys = opt._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in phys


def test_proved_empty_estimate(cbo_tables):
    assert estimated_rows(cbo_tables["big"], [("bid", ">", 10_000)]) == 0.0


def _join_ref(spark, fact, dim):
    f = fact.to_df(spark)
    d = dim.table.to_df(spark, filters=dim.filters)
    return {
        tuple(r)
        for r in f.join(
            d, f[dim.fact_key] == d[dim.dim_key], "inner"
        ).collect()
    }


@pytest.mark.parametrize(
    "max_keys,bloom_max,expected",
    [
        (1000, 5_000_000, "key-prune"),
        (5, 5_000_000, "bloom-prefilter"),
        (5, 8, "shuffle"),
    ],
)
def test_auto_join_dispatch(spark, cbo_tables, max_keys, bloom_max, expected):
    from daskberg_spark.iceberg.cbo import auto_join

    fact = cbo_tables["fact"]
    dim = JoinDim(cbo_tables["small"], "k_small", "sid", name="small")
    out = auto_join(
        spark, fact, dim, max_keys=max_keys, bloom_max_rows=bloom_max
    )
    assert fact.last_join_strategy == expected
    assert {tuple(r) for r in out.collect()} == _join_ref(spark, fact, dim)


def test_sketch_overlap_refines_ordering(spark, tmp_path):
    # a dim whose keys BARELY overlap the fact's scores near zero via
    # the measured sketch intersection, where containment says 1.0 —
    # the ordering flips to join it first
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        write_table_statistics,
    )

    fact = IcebergWriter(
        str(tmp_path / "f"),
        [
            {"id": 1, "name": "k", "type": "long", "required": False},
            {"id": 2, "name": "k2", "type": "long", "required": False},
        ],
    )
    fact.append([{"k": i % 1000, "k2": i % 1000} for i in range(5000)])
    # disjoint-keyed dim: containment growth = 500/1000 = 0.5
    disj = IcebergWriter(
        str(tmp_path / "d1"),
        [{"id": 1, "name": "did", "type": "long", "required": False}],
    )
    disj.append([{"did": 50_000 + i} for i in range(500)])
    # fully-overlapping smaller dim: containment growth = 300/1000 = 0.3
    over = IcebergWriter(
        str(tmp_path / "d2"),
        [{"id": 1, "name": "oid", "type": "long", "required": False}],
    )
    over.append([{"oid": i} for i in range(300)])
    for w in (fact, disj, over):
        write_table_statistics(w, spark)
    plan = plan_star_join(
        IcebergTable(str(tmp_path / "f")),
        [
            JoinDim(IcebergTable(str(tmp_path / "d1")), "k", "did",
                    name="disjoint"),
            JoinDim(IcebergTable(str(tmp_path / "d2")), "k2", "oid",
                    name="overlap"),
        ],
    )
    # without sketches the containment order would be [overlap,
    # disjoint]; the measured zero overlap puts disjoint first
    assert plan.order == ["disjoint", "overlap"]
    assert "disjoint" in plan.sketch_refined
    # a FILTERED fact disables the refinement (review finding: the
    # whole-table sketch no longer describes the surviving keys)
    plan_f = plan_star_join(
        IcebergTable(str(tmp_path / "f")),
        [
            JoinDim(IcebergTable(str(tmp_path / "d1")), "k", "did",
                    name="disjoint"),
            JoinDim(IcebergTable(str(tmp_path / "d2")), "k2", "oid",
                    name="overlap"),
        ],
        fact_filters=[("k", "<", 500)],
    )
    assert plan_f.sketch_refined == []
    assert plan.estimates["disjoint"] == 0.0 or (
        plan.estimates["disjoint"] < plan.estimates["overlap"] / 100
    )


def test_duplicate_labels_refused(cbo_tables):
    # two dims resolving to one label would silently drop a join and
    # run the other twice — refuse loudly (review finding)
    with pytest.raises(ValueError, match="duplicate join labels"):
        plan_star_join(
            cbo_tables["fact"],
            [
                JoinDim(cbo_tables["small"], "k_small", "sid"),
                JoinDim(cbo_tables["small"], "k_big", "sid"),
            ],
        )


def test_estimate_no_selectivity_double_count(spark, tmp_path):
    # identity-partitioned eq filter: the planner already prunes to the
    # partition, so the NDV refinement must not multiply AGAIN — the
    # estimate is min(planned, total/ndv), never their product
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        write_table_statistics,
    )

    w = IcebergWriter(
        str(tmp_path / "t"),
        [
            {"id": 1, "name": "id", "type": "long", "required": False},
            {"id": 2, "name": "grp", "type": "string", "required": False},
        ],
        [{"name": "grp", "transform": "identity", "source": "grp"}],
    )
    w.append(
        [{"id": i, "grp": "ab"[0 if i % 10 else 1]} for i in range(1000)]
    )
    write_table_statistics(w, spark)
    t = IcebergTable(str(tmp_path / "t"))
    planned = sum(
        f["record_count"] for f in t.plan_files([("grp", "==", "a")])
    )
    est = estimated_rows(t, [("grp", "==", "a")])
    assert est == min(float(planned), 1000.0 / 2)
    assert est > planned / 2  # the old product shape


def test_auto_join_rejects_outer(spark, cbo_tables):
    # left is accepted since r15 (fact-preserving routing); right and
    # full stay refused — no strategy can preserve the dim side
    from daskberg_spark.iceberg.cbo import auto_join

    for bad in ("right", "full", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="inner/semi/left"):
            auto_join(
                spark,
                cbo_tables["fact"],
                JoinDim(cbo_tables["small"], "k_small", "sid"),
                how=bad,
            )


def test_cbo_join_same_named_keys(spark, tmp_path):
    # ADVICE r10: resolving the fact key as out[fact_key] raised
    # AMBIGUOUS_REFERENCE once an earlier dim carried a same-named key
    # column (fact_key == dim_key); the join condition must resolve
    # against the ORIGINAL fact DataFrame by expression id.
    from daskberg_spark.iceberg.cbo import cbo_join
    from daskberg_spark.iceberg.writer import IcebergWriter

    f = IcebergWriter(
        str(tmp_path / "f"),
        [
            {"id": 1, "name": "sid", "type": "long", "required": False},
            {"id": 2, "name": "tid", "type": "long", "required": False},
            {"id": 3, "name": "v", "type": "double", "required": False},
        ],
    )
    f.append(
        [{"sid": i % 5, "tid": i % 3, "v": float(i)} for i in range(60)]
    )
    d1 = IcebergWriter(
        str(tmp_path / "d1"),
        [
            {"id": 1, "name": "sid", "type": "long", "required": False},
            {"id": 2, "name": "sname", "type": "string", "required": False},
        ],
    )
    d1.append([{"sid": i, "sname": f"s{i}"} for i in range(5)])
    d2 = IcebergWriter(
        str(tmp_path / "d2"),
        [
            {"id": 1, "name": "tid", "type": "long", "required": False},
            {"id": 2, "name": "tname", "type": "string", "required": False},
        ],
    )
    d2.append([{"tid": i, "tname": f"t{i}"} for i in range(3)])
    out = cbo_join(
        spark,
        IcebergTable(str(tmp_path / "f")),
        [
            JoinDim(IcebergTable(str(tmp_path / "d1")), "sid", "sid",
                    name="d1"),
            JoinDim(IcebergTable(str(tmp_path / "d2")), "tid", "tid",
                    name="d2"),
        ],
    )
    assert out.count() == 60


def test_q9_cbo_star_plan_and_result(spark):
    # r10 verdict item 2: the registry's Q9-shaped star plans through
    # the CBO.  The filtered part dim must join FIRST (containment
    # growth ~0.2 vs 1.0 for supplier/orders), every metadata-small dim
    # broadcasts, and the result equals the naive literal-order join.
    from daskberg_spark.iceberg.cbo import cbo_join
    from daskberg_spark.iceberg.fixtures import ensure_tpch_star_iceberg
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    paths = ensure_tpch_star_iceberg(spark, sf)
    fact = IcebergTable(paths["lineitem"])
    dims = [
        JoinDim(IcebergTable(paths["part"]), "l_partkey", "p_partkey",
                filters=[("p_retailprice", "<", 920.0)], name="part"),
        JoinDim(IcebergTable(paths["supplier"]), "l_suppkey", "s_suppkey",
                name="supplier"),
        JoinDim(IcebergTable(paths["orders"]), "l_orderkey", "o_orderkey",
                name="orders"),
    ]
    out = cbo_join(spark, fact, dims)
    plan = fact.last_join_plan
    assert plan.order[0] == "part", plan.order
    assert set(plan.broadcasts) >= {"part", "supplier"}, plan.broadcasts
    got = out.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    # naive literal-order join over the same fixture tables
    li = fact.to_df(spark)
    p = IcebergTable(paths["part"]).to_df(
        spark, filters=[("p_retailprice", "<", 920.0)]
    )
    s = IcebergTable(paths["supplier"]).to_df(spark)
    o = IcebergTable(paths["orders"]).to_df(spark)
    ref = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, ref))


def test_pair_keyed_ndv_conditional(spark, tmp_path):
    """r14: a grouped theta blob keyed on a PAIR of pinned columns
    measures 1/ndv(col | g1, g2) — tighter than any single-column
    conditional when values nest inside the joint grouping.  2 x 3
    joint groups each own their own 5 u-values (i % 2 == 1 forces
    i % 10 odd — 30 global): the independence model scores
    g1==..,g2==..,u==.. at 1/2 * 1/3 * 1/30 (= N/180 = 20 rows); the
    pair conditional reads 1/ndv(u | g1,g2) = 1/5 (= N/30 = 120 rows
    — the true count)."""
    from daskberg_spark.iceberg.cbo import (
        _grouped_ndv_eq_selectivity,
        estimated_rows,
    )
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.theta import write_grouped_theta_statistics
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        write_table_statistics,
    )

    w = IcebergWriter(
        str(tmp_path / "pk"),
        [
            {"id": 1, "name": "g1", "type": "long", "required": False},
            {"id": 2, "name": "g2", "type": "long", "required": False},
            {"id": 3, "name": "u", "type": "long", "required": False},
        ],
    )
    # joint group (a, b) owns u in [10*(3a+b), 10*(3a+b)+10)
    w.append(
        [
            {
                "g1": i % 2,
                "g2": i % 3,
                "u": 10 * (3 * (i % 2) + i % 3) + i % 10,
            }
            for i in range(3600)
        ]
    )
    write_table_statistics(w, spark)
    write_grouped_theta_statistics(w, spark, ["g1", "g2"], ["u"])
    t = IcebergTable(w.path)
    conj = [("g1", "==", 1), ("g2", "==", 2), ("u", "==", 55)]
    got = _grouped_ndv_eq_selectivity(t, "u", conj)
    assert got == (0.2, ("g1", "g2")), got
    est = estimated_rows(t, conj)
    # truth: 3600 / 30 = 120 rows; the independence model says 20
    assert 90 <= est <= 150, est
    # a key absent from the pair blob falls to the marginal, not zero
    miss = _grouped_ndv_eq_selectivity(
        t, "u", [("g1", "==", 1), ("g2", "==", 99), ("u", "==", 55)]
    )
    assert miss is None, miss


def test_eq_plus_range_pin_pair_blob(spark, tmp_path):
    """r14: a grouped quantile blob keyed on (a, b) with ``a == x AND
    b <op> y`` reads the row-weighted conditional CDF of the groups the
    eq pin selects and the range admits — the shape that previously
    fell to the single-eq rung and ignored the range's interaction.
    Fixture: within a == 1, the value v is LOW (< 100) exactly when
    b <= 1 and HIGH otherwise, so P(v < 100 | a == 1, b <= 1) = 1.0
    while the single-pin conditional P(v < 100 | a == 1) is ~0.5."""
    from daskberg_spark.iceberg.cbo import _grouped_quantile_selectivity
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.quantiles import (
        write_grouped_quantile_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    w = IcebergWriter(
        str(tmp_path / "er"),
        [
            {"id": 1, "name": "a", "type": "long", "required": False},
            {"id": 2, "name": "b", "type": "long", "required": False},
            {"id": 3, "name": "v", "type": "long", "required": False},
        ],
    )
    rows = []
    for i in range(4000):
        a, b = i % 2, i % 4
        v = (i % 90) if (a == 1 and b <= 1) else 1000 + i % 90
        rows.append({"a": a, "b": b, "v": v})
    w.append(rows)
    write_grouped_quantile_statistics(w, spark, ["a", "b"], ["v"])
    t = IcebergTable(w.path)
    conj = [("a", "==", 1), ("b", "<=", 1), ("v", "<", 100)]
    s = _grouped_quantile_selectivity(t, "v", "<", 100, conj)
    assert s is not None and s > 0.95, s
    # flipping the range to the HIGH half flips the conditional
    conj2 = [("a", "==", 1), ("b", ">=", 2), ("v", "<", 100)]
    s2 = _grouped_quantile_selectivity(t, "v", "<", 100, conj2)
    assert s2 is not None and s2 < 0.05, s2
    # single-pin-only conjunction still works (lower rung unchanged)
    s3 = _grouped_quantile_selectivity(
        t, "v", "<", 100, [("a", "==", 1), ("v", "<", 100)]
    )
    assert s3 is None or 0.3 < s3 < 0.7, s3


def test_census_driven_skew_salting(spark, tmp_path):
    """r14 stretch: the engine's exact per-key row census (the grouped
    quantile blob keyed on the join key) flags skewed keys BEFORE the
    join, and auto_join's shuffle branch salts them — the hot key's
    partition splits salt-ways in the plan itself instead of relying
    on AQE's runtime detection.  Result-identical to the plain join;
    estimate-neutral (no census → plain shuffle, unchanged)."""
    from daskberg_spark.iceberg.cbo import (
        JoinDim,
        auto_join,
        salted_join,
        skewed_join_keys,
    )
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.quantiles import (
        write_grouped_quantile_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    fact = IcebergWriter(
        str(tmp_path / "f"),
        [
            {"id": 1, "name": "fk", "type": "long", "required": False},
            {"id": 2, "name": "amt", "type": "long", "required": False},
        ],
    )
    # 60% of rows land on key 7 — a census-visible hot key
    fact.append(
        [
            {"fk": 7 if i % 5 < 3 else i % 40, "amt": i}
            for i in range(5000)
        ]
    )
    write_grouped_quantile_statistics(fact, spark, ["fk"], ["amt"])
    dim = IcebergWriter(
        str(tmp_path / "d"),
        [
            {"id": 1, "name": "k", "type": "long", "required": False},
            {"id": 2, "name": "name", "type": "string", "required": False},
        ],
    )
    dim.append([{"k": i, "name": f"n{i}"} for i in range(40)])
    ft = IcebergTable(fact.path)
    dt = IcebergTable(dim.path)

    hot = skewed_join_keys(ft, "fk")
    assert hot == [7], hot
    # dispatch: force the shuffle branch; the census flags key 7
    out = auto_join(
        spark,
        ft,
        JoinDim(dt, "fk", "k"),
        max_keys=0,
        bloom_max_rows=0,
    )
    assert ft.last_join_strategy == "salted-shuffle"
    assert ft.last_skewed_keys == [7]
    fdf = ft.to_df(spark)
    ddf = dt.to_df(spark)
    plain = fdf.join(ddf, fdf["fk"] == ddf["k"], "inner")
    got = sorted(map(tuple, out.select("fk", "amt", "k", "name").collect()))
    want = sorted(
        map(tuple, plain.select("fk", "amt", "k", "name").collect())
    )
    assert got == want and len(got) == 5000
    # the salted plan shuffles on (key, salt) — the hot key splits
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__fsalt" in plan and "__dsalt" in plan, plan[:2000]
    # semi flavor stays result-identical too
    semi = salted_join(
        spark,
        ft.to_df(spark),
        dt.to_df(spark).where("k >= 20"),
        "fk",
        "k",
        [7],
        how="left_semi",
    )
    truth = ft.to_df(spark).where("fk >= 20").count()
    assert semi.count() == truth
    assert "__fsalt" not in semi.columns
    # estimate-neutral: a fact WITHOUT a census takes the plain branch
    fact2 = IcebergWriter(
        str(tmp_path / "f2"),
        [
            {"id": 1, "name": "fk", "type": "long", "required": False},
            {"id": 2, "name": "amt", "type": "long", "required": False},
        ],
    )
    fact2.append([{"fk": i % 40, "amt": i} for i in range(100)])
    ft2 = IcebergTable(fact2.path)
    auto_join(
        spark, ft2, JoinDim(dt, "fk", "k"), max_keys=0, bloom_max_rows=0
    )
    assert ft2.last_join_strategy == "shuffle"


def test_star_join_salts_census_flagged_shuffle_leg(spark, tmp_path):
    """r14: cbo_join salts the NON-broadcast shuffle legs the same way
    auto_join does — a census-flagged hot fact key splits salt-ways
    mid-chain (fact-key resolution against the ORIGINAL fact frame, so
    a same-named earlier dim column cannot ambiguate) — while
    broadcast legs stay untouched (no lopsided exchange to fix).
    Results equal the naive join bit-for-bit."""
    from daskberg_spark.iceberg.cbo import JoinDim, cbo_join
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.quantiles import (
        write_grouped_quantile_statistics,
    )
    from daskberg_spark.iceberg.writer import (
        IcebergWriter,
        write_table_statistics,
    )

    fact = IcebergWriter(
        str(tmp_path / "sf"),
        [
            {"id": 1, "name": "fk", "type": "long", "required": False},
            {"id": 2, "name": "fk2", "type": "long", "required": False},
            {"id": 3, "name": "amt", "type": "long", "required": False},
        ],
    )
    fact.append(
        [
            {
                "fk": 3 if i % 2 == 0 else i % 30,
                "fk2": i % 10,
                "amt": i,
            }
            for i in range(4000)
        ]
    )
    write_table_statistics(fact, spark)
    write_grouped_quantile_statistics(fact, spark, ["fk"], ["amt"])
    dim1 = IcebergWriter(
        str(tmp_path / "sd1"),
        [
            {"id": 1, "name": "k", "type": "long", "required": False},
            {"id": 2, "name": "n1", "type": "string", "required": False},
        ],
    )
    dim1.append([{"k": i, "n1": f"a{i}"} for i in range(30)])
    dim2 = IcebergWriter(
        str(tmp_path / "sd2"),
        [
            {"id": 1, "name": "k2", "type": "long", "required": False},
            {"id": 2, "name": "n2", "type": "string", "required": False},
        ],
    )
    dim2.append([{"k2": i, "n2": f"b{i}"} for i in range(10)])
    for w in (dim1, dim2):
        write_table_statistics(w, spark)
    ft = IcebergTable(fact.path)
    dims = [
        JoinDim(IcebergTable(dim1.path), "fk", "k", name="d1"),
        JoinDim(IcebergTable(dim2.path), "fk2", "k2", name="d2"),
    ]
    # broadcast_bytes=0 forces BOTH legs onto the shuffle path; only
    # fk carries a census, so only d1 salts
    out = cbo_join(spark, ft, dims, broadcast_bytes=0)
    plan = ft.last_join_plan
    assert plan.broadcasts == [] and plan.salted == ["d1"], (
        plan.broadcasts,
        plan.salted,
        plan.order,
    )
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "__fsalt" in phys and "__dsalt" in phys
    fdf = ft.to_df(spark)
    d1 = dims[0].table.to_df(spark)
    d2 = dims[1].table.to_df(spark)
    naive = fdf.join(d1, fdf["fk"] == d1["k"]).join(
        d2, fdf["fk2"] == d2["k2"]
    )
    cols = ["fk", "fk2", "amt", "n1", "n2"]
    got = sorted(map(tuple, out.select(*cols).collect()))
    want = sorted(map(tuple, naive.select(*cols).collect()))
    assert got == want and len(got) == 4000
    # with broadcasts allowed, NOTHING salts (no shuffle leg exists)
    out2 = cbo_join(spark, ft, dims)
    plan2 = ft.last_join_plan
    assert set(plan2.broadcasts) == {"d1", "d2"} and plan2.salted == []
    assert out2.count() == 4000


def test_salted_join_validates_how_and_left_anti_identity(spark, tmp_path):
    """r15 (verdict nit + brief): salted_join refuses non-fact-
    preserving flavors INSIDE the helper, and the newly-supported
    left/anti flavors are result-identical to the plain join on a
    skewed fixture — including unmatched skewed keys (the exact case
    a right/full flavor would corrupt)."""
    import pytest as _pytest

    from daskberg_spark.iceberg.cbo import salted_join

    fact = spark.createDataFrame(
        [(7 if i % 3 else 99, i) for i in range(600)], "fk long, amt long"
    )
    # dim lacks key 99: unmatched skewed fact rows must null-extend ONCE
    dim = spark.createDataFrame(
        [(k, f"n{k}") for k in range(0, 50)], "k long, name string"
    )
    for bad in ("right", "full", "right_outer", "full_outer", "cross"):
        with _pytest.raises(ValueError, match="fact-preserving"):
            salted_join(spark, fact, dim, "fk", "k", [7, 99], how=bad)
    for flavor in ("left", "left_anti", "inner"):
        got = salted_join(
            spark, fact, dim, "fk", "k", [7, 99], how=flavor
        )
        want = fact.join(dim, fact["fk"] == dim["k"], flavor)
        cols = want.columns
        assert sorted(got.columns) == sorted(cols), (flavor, got.columns)
        assert (
            sorted(map(tuple, got.select(*cols).collect()))
            == sorted(map(tuple, want.select(*cols).collect()))
        ), flavor


def test_census_proportional_salt_widths(spark, tmp_path):
    """r15 (brief #5): salt width per key follows the census — a
    dominant key splits wide (ceil(rows/target) capped at
    shuffle.partitions), a marginal key splits narrow (floor 2) —
    and the widened join stays result-identical at both skew
    levels."""
    from daskberg_spark.iceberg.cbo import (
        JoinDim,
        auto_join,
        skewed_join_widths,
    )
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.quantiles import (
        write_grouped_quantile_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    fact = IcebergWriter(
        str(tmp_path / "fw"),
        [
            {"id": 1, "name": "fk", "type": "long", "required": False},
            {"id": 2, "name": "amt", "type": "long", "required": False},
        ],
    )
    # key 7: 60% of 5000 rows; key 8: ~22% — both flag at 0.2, with
    # very different weights
    def key(i):
        m = i % 50
        if m < 30:
            return 7
        if m < 41:
            return 8
        return m
    fact.append([{"fk": key(i), "amt": i} for i in range(5000)])
    write_grouped_quantile_statistics(fact, spark, ["fk"], ["amt"])
    ft = IcebergTable(fact.path)
    widths = skewed_join_widths(spark, ft, "fk")
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    total, r7, r8 = 5000.0, 3000.0, 1100.0
    import math

    want7 = max(2, min(parts, math.ceil(r7 / (total / parts))))
    want8 = max(2, min(parts, math.ceil(r8 / (total / parts))))
    assert widths == {7: want7, 8: want8}, (widths, want7, want8)
    assert widths[7] > widths[8] >= 2, widths
    # end-to-end through auto_join's shuffle branch: identical rows
    dim = IcebergWriter(
        str(tmp_path / "dw"),
        [
            {"id": 1, "name": "k", "type": "long", "required": False},
            {"id": 2, "name": "name", "type": "string", "required": False},
        ],
    )
    dim.append([{"k": i, "name": f"n{i}"} for i in range(50)])
    dt = IcebergTable(dim.path)
    out = auto_join(
        spark, ft, JoinDim(dt, "fk", "k"), max_keys=0, bloom_max_rows=0
    )
    assert ft.last_join_strategy == "salted-shuffle"
    assert ft.last_skew_widths == widths
    fdf, ddf = ft.to_df(spark), dt.to_df(spark)
    want = fdf.join(ddf, fdf["fk"] == ddf["k"])
    assert out.count() == 5000
    got = sorted(map(tuple, out.select("fk", "amt", "k", "name").collect()))
    exp = sorted(
        map(tuple, want.select("fk", "amt", "k", "name").collect())
    )
    assert got == exp
    # LEFT flavor routes through the fact-preserving branch only
    outl = auto_join(
        spark,
        ft,
        JoinDim(dt, "fk", "k"),
        max_keys=10**9,  # would pick key-prune for inner — must not
        bloom_max_rows=10**9,
        how="left",
    )
    assert ft.last_join_strategy == "salted-shuffle"
    assert outl.count() == 5000
