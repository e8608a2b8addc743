"""Deterministic sketch / sampling / statistics operators (Tier B5/B12+).

The engine-native sketches (``approx_count_distinct`` = HLL++,
``approx_quantiles`` = Greenwald-Khanna) are rows-only by design: their
internals differ per engine.  This module adds the *deterministic*
counterparts a cross-engine pipeline actually wants — sketches whose
output is a pure function of the data, so they are oracle-exact AND
restart/replay-stable at 100 TB:

- ``distinct_kmv_estimate``: K-Minimum-Values distinct-count sketch
  (Bar-Yossef et al. 2002).  Both engines hash rows with the same
  md5-prefix→48-bit integer map, so the k-th minimum — and therefore the
  estimate — is bit-identical.
- ``sampled_agg_deterministic``: Bernoulli sampling by content hash
  (md5 first hex digit), the replayable twin of ``TABLESAMPLE``.
- ``events_corr_matrix``: grouped Pearson correlation assembled from
  decimal-exact moment sums (the same trick as ``stats_moments``),
  with the final formula evaluated in IEEE double identically on both
  engines (sqrt and / are correctly-rounded, so same inputs → same bits).

Reference parity note: the reference delegates aggregation to Dask
(`/root/reference/daskberg/core.py` hands back a dataframe); these are
beyond-parity analytics staples re-expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daskberg_spark.operators.registry import (
    DEC,
    dsum,
    literal_df,
    query,
    sql_dsum,
    table,
)

KMV_K = 64
HASH_BITS = 48
HASH_SPACE = 1 << HASH_BITS  # 2^48; (k-1)*2^48 and every hash fit a BIGINT
_HEX = "0123456789abcdef"

# DuckDB has no base-conversion builtin; fold the 12 hex chars through a
# transform+reduce (list_reduce's first-element seeding == the zero-seeded
# fold because acc*16+x with acc=0 is x).  Spark uses conv() — both parse
# the identical md5 prefix, so the 48-bit values agree bit-for-bit.
_SQL_H48 = """list_reduce(
      list_transform(range(1,13),
        i -> CAST(strpos('{hex}', substr(md5(CAST({col} AS VARCHAR)),i,1))-1
             AS BIGINT)),
      (acc,x) -> acc*16 + x)"""


def _h48_spark(col) -> F.Column:
    """48-bit md5 hash of a column (name or Column) — the ONE Spark-side
    definition every sketch and its SQL oracle (_sql_h48) must agree
    with bit-exactly; streaming twins reuse it rather than re-deriving."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(c.cast("string")), 1, 12), 16, 10
    ).cast("long")


def _sql_h48(col: str) -> str:
    return _SQL_H48.format(hex=_HEX, col=col)


@query(
    "distinct_kmv_estimate",
    f"""
    WITH hashes AS (
      SELECT DISTINCT {_sql_h48('o_custkey')} AS h
      FROM orders
    ), mins AS (
      SELECT h FROM hashes ORDER BY h LIMIT {KMV_K}
    ), sk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k_seen,
             CAST(MAX(h) AS BIGINT) AS kth_min
      FROM mins
    )
    SELECT k_seen, kth_min,
           CASE WHEN k_seen < {KMV_K} THEN CAST(k_seen AS DOUBLE)
                ELSE CAST(({KMV_K} - 1) * {HASH_SPACE} AS DOUBLE)
                     / CAST(kth_min AS DOUBLE) END AS est_distinct,
           (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
             AS exact_distinct
    FROM sk
    """,
)
def distinct_kmv_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5+: K-Minimum-Values distinct sketch, deterministic across engines.

    Keep the ``k`` smallest *distinct* 48-bit hashes; the k-th minimum
    ``m`` estimates cardinality as ``(k-1) * 2^48 / m`` (the classic KMV
    unbiased estimator).  Unlike HLL the result is a pure function of the
    data — mergeable (union of min-k sets), replay-stable, and
    oracle-checkable.

    Scale: the hash is a narrow map; ``distinct`` is one shuffle of an
    8-byte column; the min-k is TakeOrderedAndProject (per-partition
    top-k, k-row driver merge) — no full sort, no sketch state bigger
    than k*8 bytes anywhere.  The exact count (for the error column) is
    the same shuffle's byproduct."""
    orders = table(spark, sf_dir, "orders")
    # ONE distinct shuffle feeds both the sketch and the exact count
    # (hashing after the dedup gives the same min-k; countDistinct on
    # the raw table was a second full scan + shuffle)
    d = orders.select("o_custkey").distinct().localCheckpoint()
    h = d.select(_h48_spark("o_custkey").alias("h"))
    mins = h.orderBy("h").limit(KMV_K)
    sk = mins.agg(
        F.count("*").alias("k_seen"), F.max("h").alias("kth_min")
    )
    exact = d.agg(F.count("*").alias("exact_distinct"))
    est = F.when(
        F.col("k_seen") < KMV_K, F.col("k_seen").cast("double")
    ).otherwise(
        F.lit(float((KMV_K - 1) * HASH_SPACE)) / F.col("kth_min").cast("double")
    )
    return sk.crossJoin(exact).select(
        "k_seen", "kth_min", est.alias("est_distinct"), "exact_distinct"
    )


@query(
    "sampled_agg_deterministic",
    f"""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           {sql_dsum('o_totalprice', 'sample_revenue')},
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) * 8
                AS DECIMAL(25,6)) AS DOUBLE) AS est_total_revenue
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    GROUP BY o_orderstatus
    """,
)
def sampled_agg_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12+: content-hash Bernoulli sampling (p = 2/16) + scaled estimate —
    the deterministic twin of the engine-native ``sampled_agg``
    (TABLESAMPLE), which stays registered as rows-only.

    Hash-gating on md5(key) makes the sample replayable across engines,
    retries, and partitionings — the property TABLESAMPLE loses the
    moment a task is re-executed on different splits.  Scale: the gate is
    a pushed-down narrow filter (no shuffle added); the estimate is the
    exact decimal sum scaled by 1/p."""
    orders = table(spark, sf_dir, "orders")
    gate = F.substring(
        F.md5(F.col("o_orderkey").cast("string")), 1, 1
    ).isin("0", "1")
    dec = F.sum(F.col("o_totalprice").cast(DEC))
    return (
        orders.where(gate)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_sampled"),
            dec.cast("double").alias("sample_revenue"),
            (dec * 8).cast(DEC).cast("double").alias("est_total_revenue"),
        )
    )


# Pearson correlation from exact moment sums.  Per-row terms are rounded
# to DECIMAL(25,6) (deterministic), summed exactly, and the closed-form
# correlation is evaluated in double with the same operation order on
# both engines — sqrt and / are IEEE-correctly-rounded, so the doubles
# match bit-for-bit.
_CORR_NUM = "(n * sxy - sx * sy)"
# greatest(…, 0): on near-constant large-mean data the rounded variance
# term can land fractionally NEGATIVE, where DuckDB hard-errors on sqrt
# while Spark yields NaN — clamp identically on both engines
_CORR_DEN = (
    "(sqrt(greatest(n * sxx - sx * sx, 0.0)) * "
    "sqrt(greatest(n * syy - sy * sy, 0.0)))"
)


@query(
    "events_corr_matrix",
    f"""
    WITH terms AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(25,6)) AS DOUBLE) AS x,
             CAST(hour(ts) AS DOUBLE) AS y
      FROM events
      WHERE value IS NOT NULL
    ), moments AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(25,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(25,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(25,6))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x * y AS DECIMAL(25,6))) AS DOUBLE) AS sxy
      FROM terms GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           {_CORR_NUM} / {_CORR_DEN} AS corr_value_hour
    FROM moments
    ORDER BY event_type
    """,
)
def events_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4+: grouped Pearson correlation (value vs hour-of-day) assembled
    from one pass of exact decimal moment sums — no second pass, no
    ``corr()`` builtin (whose summation order differs per engine).

    Scale: single partial-agg shuffle keyed by group; six numbers of
    state per group.  This is the moment-sketch pattern every
    distributed stats library uses (mergeable across partitions)."""
    ev = table(spark, sf_dir, "events")
    x = F.col("value").cast(DEC).cast("double")
    y = F.hour("ts").cast("double")
    # NULL values must not enter ANY moment: with n = COUNT(*) the x
    # sums would skip the NULL rows while n and the y sums counted
    # them — a wrong correlation BOTH engines would agree on, invisible
    # to the oracle harness
    terms = ev.where(F.col("value").isNotNull()).select(
        "event_type", x.alias("x"), y.alias("y")
    )

    def dsum_term(c: F.Column, alias: str) -> F.Column:
        # registry.dsum with the ROUNDED-per-row term convention this
        # moment pipeline documents
        return dsum(c, alias)

    moments = terms.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        dsum_term(F.col("x"), "sx"),
        dsum_term(F.col("y"), "sy"),
        dsum_term(F.col("x") * F.col("x"), "sxx"),
        dsum_term(F.col("y") * F.col("y"), "syy"),
        dsum_term(F.col("x") * F.col("y"), "sxy"),
    )
    corr = F.expr(f"{_CORR_NUM} / {_CORR_DEN}")
    return moments.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        corr.alias("corr_value_hour"),
    ).orderBy("event_type")


# --- Z-order (Morton) curve locality -------------------------------------
# 8 bits per dimension over (l_partkey % 256, l_suppkey % 256); bit b of
# dim c lands at position 2b+c.  Non-overlapping bit positions mean the
# interleave is a plain sum — exact integer arithmetic on both engines.
ZQ_BITS = 8


def _sql_zvalue(p: str, s: str) -> str:
    terms = []
    for b in range(ZQ_BITS):
        terms.append(f"((({p} >> {b}) & 1) * {1 << (2 * b)})")
        terms.append(f"((({s} >> {b}) & 1) * {1 << (2 * b + 1)})")
    return " + ".join(terms)


def _spark_zvalue(p: F.Column, s: F.Column) -> F.Column:
    z = F.lit(0).cast("long")
    for b in range(ZQ_BITS):
        z = z + F.shiftright(p, b).bitwiseAND(F.lit(1)).cast("long") * (
            1 << (2 * b)
        )
        z = z + F.shiftright(s, b).bitwiseAND(F.lit(1)).cast("long") * (
            1 << (2 * b + 1)
        )
    return z


@query(
    "zorder_cluster_stats",
    f"""
    WITH d AS (
      SELECT CAST(l_partkey % 256 AS BIGINT) AS p,
             CAST(l_suppkey % 256 AS BIGINT) AS s
      FROM lineitem
    ), z AS (
      SELECT p, s, CAST({_sql_zvalue('p', 's')} AS BIGINT) AS zval FROM d
    )
    SELECT CAST(zval >> 12 AS BIGINT) AS tile,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(p) AS BIGINT) AS p_min, CAST(MAX(p) AS BIGINT) AS p_max,
           CAST(MIN(s) AS BIGINT) AS s_min, CAST(MAX(s) AS BIGINT) AS s_max
    FROM z GROUP BY tile ORDER BY tile
    """,
)
def zorder_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14+/A6+: Z-order curve locality census — the math behind
    ``compact_files_spark(zorder_by=...)`` (writer.py) made
    oracle-checkable.  Interleaves 8-bit (partkey, suppkey) planes into a
    Morton value and aggregates per top-4-bit tile: every tile's min/max
    shows BOTH dimensions bounded to a 64-wide band — exactly why
    z-clustered files get selective footer bounds on every z column,
    where a lexicographic sort serves only its leading column.

    Scale: narrow integer map (whole-stage codegen, no UDF) + one
    partial-agg shuffle over 16 tiles."""
    li = table(spark, sf_dir, "lineitem")
    d = li.select(
        (F.col("l_partkey") % 256).cast("long").alias("p"),
        (F.col("l_suppkey") % 256).cast("long").alias("s"),
    )
    z = d.withColumn("zval", _spark_zvalue(F.col("p"), F.col("s")))
    return (
        z.groupBy(F.shiftright("zval", 12).cast("long").alias("tile"))
        .agg(
            F.count("*").alias("n"),
            F.min("p").alias("p_min"),
            F.max("p").alias("p_max"),
            F.min("s").alias("s_min"),
            F.max("s").alias("s_max"),
        )
        .orderBy("tile")
    )


def _hilbert_oracle_sql() -> str:
    from daskberg_spark.iceberg.hilbert import sql_hilbert_ctes

    ctes = sql_hilbert_ctes("d", ["p", "s"], 6, carry=["p", "s"])
    return f"""
    WITH d AS (
      SELECT CAST(l_partkey % 64 AS BIGINT) AS p,
             CAST(l_suppkey % 64 AS BIGINT) AS s
      FROM lineitem
    ),
    {ctes}
    SELECT CAST(hval >> 8 AS BIGINT) AS tile,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(p) AS BIGINT) AS p_min, CAST(MAX(p) AS BIGINT) AS p_max,
           CAST(MIN(s) AS BIGINT) AS s_min, CAST(MAX(s) AS BIGINT) AS s_max
    FROM h_out GROUP BY tile ORDER BY tile
    """


@query("hilbert_cluster_stats", _hilbert_oracle_sql())
def hilbert_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve locality census — ``zorder_cluster_stats``'s twin
    for ``compact_files_spark(curve="hilbert")`` (r11,
    ``iceberg/hilbert.py``): 6-bit (partkey, suppkey) grid coordinates
    through the unrolled Skilling axes→index transform, aggregated per
    256-cell tile.  Every tile's min/max shows BOTH dimensions bounded
    to a 16-wide band — and unlike Morton, CONSECUTIVE tiles are also
    edge-adjacent (the unit-step property ``tests/test_hilbert.py``
    pins), which is why Hilbert-clustered files prune box queries
    at least as hard at the same file count.  The DuckDB oracle runs
    the SAME transform independently as a generated 13-CTE SQL chain
    (``sql_hilbert_ctes``) — three implementations (Python reference,
    Catalyst, SQL) pinned equal.

    Scale: a linear chain of integer projections inside whole-stage
    codegen (no UDF) + one partial-agg shuffle over 16 tiles."""
    from daskberg_spark.iceberg.hilbert import hilbert_attach

    li = table(spark, sf_dir, "lineitem")
    d = li.select(
        (F.col("l_partkey") % 64).cast("long").alias("p"),
        (F.col("l_suppkey") % 64).cast("long").alias("s"),
    )
    h = hilbert_attach(d, ["p", "s"], out_col="hval", bits=6, normalize=False)
    return (
        h.groupBy(F.shiftright("hval", 8).cast("long").alias("tile"))
        .agg(
            F.count("*").alias("n"),
            F.min("p").alias("p_min"),
            F.max("p").alias("p_max"),
            F.min("s").alias("s_min"),
            F.max("s").alias("s_max"),
        )
        .orderBy("tile")
    )


@query(
    "winsorized_stats",
    f"""
    WITH nn AS (
      SELECT event_type, value FROM events WHERE value IS NOT NULL
    ), q AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM nn GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('e.value', 'sum_raw')},
           {sql_dsum('least(greatest(e.value, q.lo), q.hi)', 'sum_winsor')}
    FROM nn e JOIN q USING (event_type)
    GROUP BY e.event_type ORDER BY e.event_type
    """,
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5+: winsorized aggregation — clip each group's values at its own
    exact [p05, p95] before summing, the robust-mean treatment for
    heavy-tailed metrics (a single 1e9 outlier otherwise owns the mean).

    Scale: pass 1 computes per-group EXACT quantiles with a distributed
    sort-rank formulation — row_number within group, pick the two rows
    bracketing q·(n-1), linear-interpolate — replacing the percentile()
    aggregate, whose state buffers every group value (fails the
    no-unbounded-aggs plan contract; sort shuffles spill, agg buffers
    don't).  The group→(lo,hi) table is group-cardinality-sized and
    broadcast into pass 2's clip+sum, so the data is read twice but never
    shuffled beyond the sort and the two partial aggs."""
    from pyspark.sql import Window as W

    # NULL values are excluded from EVERY stage uniformly: least/
    # greatest on both engines SKIP a NULL argument, so an unfiltered
    # clip would fabricate a lo-valued data point per NULL row into
    # sum_winsor (while sum_raw skipped it) — a wrong number both
    # engines would agree on; and an all-NULL group must vanish on
    # both sides rather than only where the rank filter drops it.
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    wrank = W.partitionBy("event_type").orderBy("value")
    wall = W.partitionBy("event_type")
    # NULL values must not enter the rank: row_number orders NULLs first
    # and count('*') would count them, shifting every quantile position,
    # while quantile_cont/percentile skip NULLs — filter to match.
    ranked = (
        ev.select("event_type", "value")
        .select(
            "event_type",
            "value",
            (F.row_number().over(wrank) - 1).alias("rn"),
            F.count("*").over(wall).alias("n"),
        )
    )

    def _exact_q(qv: float, name: str):
        # Spark percentile()/DuckDB quantile_cont both read position
        # q·(n-1) with linear interpolation: lo + frac·(hi - lo)
        pos = F.lit(qv) * (F.col("n") - 1).cast("double")
        lo_v = F.max(F.when(F.col("rn") == F.floor(pos), F.col("value")))
        hi_v = F.max(F.when(F.col("rn") == F.ceil(pos), F.col("value")))
        frac = F.max(pos - F.floor(pos).cast("double"))
        return (lo_v + frac * (hi_v - lo_v)).alias(name)

    q = ranked.groupBy("event_type").agg(
        _exact_q(0.05, "lo"), _exact_q(0.95, "hi")
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_raw"),
            F.sum(clipped.cast(DEC)).cast("double").alias("sum_winsor"),
        )
        .orderBy("event_type")
    )


# --- deterministic HyperLogLog ---------------------------------------------
# 256 registers over the shared 48-bit md5 hash: top 8 bits pick the
# register, the low 40 bits feed the leading-zero rank.  The harmonic sum
# is kept as the INTEGER T = Σⱼ 2^(41-Mⱼ)  (Mⱼ=0 for empty registers), so
# the only floating-point step is the final alpha·m²·2⁴¹/T — identical
# IEEE ops on both engines.  The small-range linear-counting correction
# (m·ln(m/V)) is deliberately left to the caller: ln() is libm-specific
# and would break bit-exactness; n_empty is emitted for it.
HLL_P = 8
HLL_M = 1 << HLL_P  # 256
HLL_REM_BITS = HASH_BITS - HLL_P  # 40
HLL_ALPHA = 0.7182725932495458  # 0.7213/(1+1.079/256), shared literal


def _sql_rho(rem: str) -> str:
    """CASE computing 1 + leading-zeros of the 40-bit value (integer-only,
    no log2) — the identical text runs on Spark SQL and DuckDB."""
    whens = [
        f"WHEN {rem} >= {1 << (HLL_REM_BITS - 1 - z)} THEN {z + 1}"
        for z in range(HLL_REM_BITS)
    ]
    return f"CASE {' '.join(whens)} ELSE {HLL_REM_BITS + 1} END"


@query(
    "approx_distinct_hll",
    f"""
    WITH parts AS (
      SELECT {_sql_h48('o_custkey')} >> {HLL_REM_BITS} AS idx,
             {_sql_h48('o_custkey')} & {(1 << HLL_REM_BITS) - 1} AS rem
      FROM orders
    ), regs AS (
      SELECT idx, MAX({_sql_rho('rem')}) AS r FROM parts GROUP BY idx
    ), sk AS (
      SELECT CAST(SUM(CAST(1 AS BIGINT) << ({HLL_REM_BITS + 1} - r))
                  AS BIGINT) AS t_present,
             CAST(COUNT(*) AS BIGINT) AS n_present
      FROM regs
    )
    SELECT CAST({HLL_M} - n_present AS BIGINT) AS n_empty,
           CAST(t_present + ({HLL_M} - n_present) * {1 << (HLL_REM_BITS + 1)}
                AS BIGINT) AS t_sum,
           CAST({HLL_ALPHA * float(HLL_M * HLL_M) * float(1 << (HLL_REM_BITS + 1))!r}
                AS DOUBLE)
             / CAST(t_present + ({HLL_M} - n_present) * {1 << (HLL_REM_BITS + 1)}
                    AS DOUBLE) AS est_distinct,
           (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
             AS exact_distinct
    FROM sk
    """,
)
def approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5+: HyperLogLog (Flajolet et al. 2007) built from scratch with an
    integer-exact harmonic sum — the deterministic, oracle-checkable twin
    of ``approx_count_distinct`` (whose HLL++ internals are per-engine).

    Scale: one narrow hash map, one 256-group partial-agg shuffle (the
    per-partition MAX combine IS the HLL merge — registers are the only
    state, 256 bytes), and a single-row finish.  This is the sketch shape
    that lets 1000 executors count distincts with no re-shuffle of data.
    KMV (``distinct_kmv_estimate``) needs a distinct-shuffle; HLL does
    not — that is the 100 TB difference between them."""
    orders = table(spark, sf_dir, "orders")
    h = _h48_spark("o_custkey")
    parts = orders.select(
        F.shiftright(h, HLL_REM_BITS).alias("idx"),
        h.bitwiseAND(F.lit((1 << HLL_REM_BITS) - 1)).alias("rem"),
    )
    regs = parts.groupBy("idx").agg(
        F.max(F.expr(_sql_rho("rem"))).alias("r")
    )
    sk = regs.agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_REM_BITS + 1} - r)"))
        .cast("long")
        .alias("t_present"),
        F.count("*").alias("n_present"),
    )
    exact = orders.agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    t_sum = F.col("t_present") + (HLL_M - F.col("n_present")) * (
        1 << (HLL_REM_BITS + 1)
    )
    est = (
        F.lit(HLL_ALPHA * float(HLL_M * HLL_M) * float(1 << (HLL_REM_BITS + 1)))
        / t_sum.cast("double")
    )
    return sk.crossJoin(exact).select(
        (F.lit(HLL_M) - F.col("n_present")).cast("long").alias("n_empty"),
        t_sum.cast("long").alias("t_sum"),
        est.alias("est_distinct"),
        "exact_distinct",
    )


# --- deterministic histogram quantile sketch -------------------------------
HIST_BINS = 1024
_HQ = [0.5, 0.9, 0.99]


@query(
    "approx_quantiles_histogram",
    f"""
    WITH st AS (
      SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem
    ), binned AS (
      SELECT LEAST({HIST_BINS - 1},
                   CAST(floor((l_extendedprice - st.mn)
                              / (st.mx - st.mn) * {HIST_BINS}) AS BIGINT))
               AS bin
      FROM lineitem, st
    ), hist AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS c FROM binned GROUP BY bin
    ), cum AS (
      SELECT bin, c, SUM(c) OVER (ORDER BY bin) AS cum FROM hist
    ), qs AS (
      SELECT qi, q FROM (VALUES
        {', '.join(f'({i + 1}, CAST({q!r} AS DOUBLE))' for i, q in enumerate(_HQ))}
      ) AS t(qi, q)
    ), est AS (
      SELECT qs.qi, qs.q, MIN(cum.bin) AS bin
      FROM qs JOIN cum
        ON CAST(cum.cum AS DOUBLE) >=
           qs.q * (SELECT CAST(n AS DOUBLE) FROM st)
      GROUP BY qs.qi, qs.q
    )
    SELECT CAST(est.qi AS INTEGER) AS qi, est.q AS q,
           st.mn + CAST(est.bin AS DOUBLE) * (st.mx - st.mn) / {HIST_BINS}
             AS est_value,
           st.mn + (CAST(est.bin AS DOUBLE)
                    + (est.q * CAST(st.n AS DOUBLE)
                       - CAST(cum.cum - cum.c AS DOUBLE))
                      / CAST(cum.c AS DOUBLE))
                 * (st.mx - st.mn) / {HIST_BINS}
             AS interp_value
    FROM est JOIN cum ON cum.bin = est.bin, st
    ORDER BY qi
    """,
)
def approx_quantiles_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5+: deterministic quantile sketch — fixed 1024-bin histogram with
    lower-edge readout, the oracle-checkable sibling of
    ``approx_quantiles`` (whose Greenwald-Khanna internals are
    per-engine).  Error is bounded by one bin width (range/1024);
    ``interp_value`` refines the readout by linear interpolation INSIDE
    the selected bin — derived from the same 1024-bin state, so there is
    no second pass over the data.  (An earlier version computed an exact
    ``percentile()`` rider, which buffers every value of the column in a
    single aggregation state — a driver-sized-memory scale-killer;
    removed.)

    Scale: pass 1 is a 3-number min/max/count agg; pass 2 is one
    partial-agg shuffle with ≤1024 groups — bin counts are the mergeable
    state, so this sketch distributes/streams exactly like the HLL
    registers.  No sort of the data anywhere (the cumsum window runs
    over 1024 bins), and no per-group state exceeds the fixed bin
    count."""
    li = table(spark, sf_dir, "lineitem")
    # 1-row stats frame, checkpointed: it feeds the binning pass, the
    # readout threshold, AND the final value reconstruction — without the
    # checkpoint Catalyst re-derives it per use (3 extra scans/exchanges)
    st = li.agg(
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
        F.count("*").alias("n"),
    ).localCheckpoint()
    binned = li.crossJoin(F.broadcast(st)).select(
        F.least(
            F.lit(HIST_BINS - 1),
            F.floor(
                (F.col("l_extendedprice") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * HIST_BINS
            ).cast("long"),
        ).alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count("*").alias("c"))
    from pyspark.sql import Window as W

    cum = hist.withColumn(
        "cum", F.sum("c").over(W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0))
    )
    qs = literal_df(
        spark, [(i + 1, q) for i, q in enumerate(_HQ)], "qi int, q double"
    )
    # min of (bin, c, cum) structs == the qualifying row with the smallest
    # bin, carrying its count and cumulative alongside — no join back to
    # the histogram, so `cum` is computed exactly once in the plan.
    est = (
        qs.crossJoin(F.broadcast(cum))
        .crossJoin(F.broadcast(st.select(F.col("n").alias("n_total"))))
        .where(
            F.col("cum").cast("double")
            >= F.col("q") * F.col("n_total").cast("double")
        )
        .groupBy("qi", "q")
        .agg(F.min(F.struct("bin", "c", "cum")).alias("s"))
        .select("qi", "q", "s.bin", "s.c", "s.cum")
    )
    width = (F.col("mx") - F.col("mn"))
    interp_pos = F.col("bin").cast("double") + (
        F.col("q") * F.col("n").cast("double")
        - (F.col("cum") - F.col("c")).cast("double")
    ) / F.col("c").cast("double")
    return (
        est.crossJoin(F.broadcast(st))
        .select(
            "qi",
            "q",
            (
                F.col("mn")
                + F.col("bin").cast("double") * width / HIST_BINS
            ).alias("est_value"),
            (F.col("mn") + interp_pos * width / HIST_BINS).alias("interp_value"),
        )
        .orderBy("qi")
    )


# --- deterministic count-min heavy hitters ---------------------------------
# DEPTH salted rows of WIDTH counters over the shared 48-bit md5 hash:
# est(term) = min_d sketch[d][h_d(term) % WIDTH] >= true count, with the
# overestimate bounded by collisions in the narrowest row.  The sketch is
# DEPTH*WIDTH mergeable integer state — the heavy-hitter analogue of the
# HLL registers, and the same deterministic-hash construction makes it
# oracle-exact across engines (engine-native frequent-item sketches are
# not comparable bit-for-bit).
CM_DEPTH = 4
CM_WIDTH = 1024
CM_TOPK = 20


def _cm_salted(col_sql: str, d: int) -> str:
    return f"({col_sql} || '#' || {d})"


@query(
    "approx_topk_countmin",
    f"""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ),
    sketch AS (
      SELECT ds.d,
             CASE ds.d
               {' '.join(f"WHEN {d} THEN {_sql_h48(_cm_salted('term', d))} % {CM_WIDTH}" for d in range(CM_DEPTH))}
             END AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM toks CROSS JOIN (SELECT unnest(range({CM_DEPTH})) AS d) ds
      GROUP BY 1, 2
    ),
    top AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM toks GROUP BY term
      ORDER BY exact_n DESC, term LIMIT {CM_TOPK}
    ),
    probes AS (
      SELECT top.term, top.exact_n, ds.d,
             CASE ds.d
               {' '.join(f"WHEN {d} THEN {_sql_h48(_cm_salted('top.term', d))} % {CM_WIDTH}" for d in range(CM_DEPTH))}
             END AS bucket
      FROM top CROSS JOIN (SELECT unnest(range({CM_DEPTH})) AS d) ds
    )
    SELECT p.term, p.exact_n, CAST(MIN(s.c) AS BIGINT) AS est_n
    FROM probes p JOIN sketch s ON s.d = p.d AND s.bucket = p.bucket
    GROUP BY p.term, p.exact_n
    ORDER BY p.exact_n DESC, p.term
    """,
)
def approx_topk_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5+/C4: heavy hitters via a deterministic count-min sketch —
    DEPTH×WIDTH mergeable counters, probed for the exact top-K terms so
    the driver can check both the sketch arithmetic and the guarantee
    est ≥ exact.

    Scale: the sketch build is one explode (terms × DEPTH salted hashes)
    into a ≤DEPTH·WIDTH-group partial-agg shuffle — fixed-size state that
    merges/streams like the HLL registers; the exact top-K pass is a
    term-cardinality shuffle + TakeOrdered (already required by any
    exact-verification harness) and the probe join broadcasts the
    4096-row sketch."""

    # the ONE shared 48-bit hash (its contract: every sketch must agree
    # bit-exactly with _sql_h48) — a local re-spelling here had already
    # started to drift risk
    h48_expr = _h48_spark

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), "[ \\t\\n\\f\\r]+")).alias("term")
    )
    # ONE corpus tokenization pass: the per-term exact counts feed BOTH
    # branches, because a count-min cell is exactly the SUM of the term
    # counts hashing into it — so the ×DEPTH salted-hash explode runs
    # over the VOCABULARY-sized count table, not the corpus token
    # stream (guide §2.3: aggregate before you shuffle; the former
    # shape exploded every corpus token DEPTH ways and tokenized the
    # corpus twice).  Bit-identical: integer sums commute.
    tf = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .localCheckpoint()
    )
    salted = [
        F.struct(
            F.lit(d).alias("d"),
            (
                h48_expr(F.concat(F.col("term"), F.lit(f"#{d}")))
                % CM_WIDTH
            ).alias("bucket"),
        )
        for d in range(CM_DEPTH)
    ]
    sketch = (
        tf.select("exact_n", F.explode(F.array(*salted)).alias("s"))
        .groupBy(F.col("s.d").alias("d"), F.col("s.bucket").alias("bucket"))
        .agg(F.sum("exact_n").alias("c"))
    )
    top = (
        tf.orderBy(F.col("exact_n").desc(), "term")
        .limit(CM_TOPK)
    )
    probes = top.select(
        "term",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (
                            h48_expr(F.concat(F.col("term"), F.lit(f"#{d}")))
                            % CM_WIDTH
                        ).alias("bucket"),
                    )
                    for d in range(CM_DEPTH)
                ]
            )
        ).alias("p"),
    ).select("term", "exact_n", F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("term", "exact_n")
        .agg(F.min("c").cast("long").alias("est_n"))
        .orderBy(F.col("exact_n").desc(), "term")
    )
