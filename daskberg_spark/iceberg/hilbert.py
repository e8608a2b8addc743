"""Hilbert-curve clustering — the locality-tighter alternative to the
Morton (Z-order) curve for multi-dimensional compaction.

Morton interleaving is cheap but its curve JUMPS: consecutive indices
can be far apart in space at every power-of-two boundary (the z's
diagonal stroke), so a range-partitioned rewrite puts spatially
distant rows in one file and inflates its footer bounds.  The Hilbert
curve visits every cell of the 2^bits × … grid in UNIT steps (each
successive cell differs in exactly one axis by exactly 1), so equal
index ranges are compact blobs and the same file count yields tighter
per-file min/max on every clustered column — measurably fewer files
planned for box queries (``tests/test_hilbert.py`` pins the witness).

The axes→index transform is John Skilling's ("Programming the Hilbert
curve", AIP Conf. Proc. 707, 2004 — public algorithm): an in-place
bit-plane sweep (invert/exchange per level) followed by a Gray-code
fixup, then plain bit interleaving of the transposed axes.  It is
implemented twice here from that public description:

- ``hilbert_index`` — pure-Python reference (tests pin the bijection
  and the unit-step property over the full 2-D grid, the defining
  characterization of the curve);
- ``hilbert_attach`` — the distributed form: the SAME unrolled steps
  as Catalyst integer expressions.  Each step materializes its axis
  registers as real projection columns rather than nesting one giant
  expression — X[0] is referenced ~3× per step, so a single-expression
  form would grow 3^(bits·n) nodes and hang analysis; the column chain
  stays linear and whole-stage codegen fuses it.  No UDF, no shuffle.

``compact_files_spark(zorder_by=..., curve="hilbert")`` swaps the
curve under the identical normalization (min-max or rank/histogram —
``writer.normalized_axes``) and range-partition machinery.
"""

from __future__ import annotations

from typing import Any

# interleaved index must fit a signed 64-bit long
MAX_TOTAL_BITS = 62

# above this per-axis depth the unrolled projection chain switches to
# the constant-depth fold form: the chain's analyze/codegen cost
# roughly doubles per level (2.4 s at 10 bits, 3.4 s at 12, 36.8 s at
# 16 on this harness — default_bits docstring), while the fold's plan
# is O(n) regardless of bits (r12)
FOLD_MIN_BITS = 13


def default_bits(n_dims: int) -> int:
    """10 bits/axis: 1024 curve cells per dimension — orders of
    magnitude above any realistic output-file count, so cluster
    quality is unaffected, while the unrolled plan stays cheap to
    analyze/compile (measured on this harness: 2.4 s at 10 bits,
    3.4 s at 12, 36.8 s at 16 — Catalyst collapses the projection
    chain and the codegen'd expression roughly doubles per level).
    Callers needing finer cells pass ``bits`` explicitly; at
    ``FOLD_MIN_BITS`` and above the attach switches to the
    constant-depth fold form (r12: 16-bit attach 1.6 s, 24-bit 1.6 s),
    trading ~1.8× per-row throughput for a plan that no longer grows
    with depth."""
    return min(10, MAX_TOTAL_BITS // n_dims)


def hilbert_index(coords: list[int], bits: int) -> int:
    """Pure-Python Hilbert index of one grid cell (Skilling's
    AxesToTranspose + bit interleave).  Reference for the differential
    test; the distributed path never calls this."""
    n = len(coords)
    x = list(coords)
    m = 1 << (bits - 1)
    # inverse undo excess work
    q = m
    while q > 1:
        p = q - 1
        for i in range(n):
            if x[i] & q:
                x[0] ^= p  # invert
            else:  # exchange
                t = (x[0] ^ x[i]) & p
                x[0] ^= t
                x[i] ^= t
        q >>= 1
    # Gray encode
    for i in range(1, n):
        x[i] ^= x[i - 1]
    t = 0
    q = m
    while q > 1:
        if x[n - 1] & q:
            t ^= q - 1
        q >>= 1
    for i in range(n):
        x[i] ^= t
    # transpose → index: bit j of axis i lands at j*n + (n-1-i)
    h = 0
    for j in range(bits):
        for i in range(n):
            h |= ((x[i] >> j) & 1) << (j * n + (n - 1 - i))
    return h


def _attach_fold(df: Any, names: list[str], bits: int, n: int, out_col: str):
    """CONSTANT-DEPTH Hilbert transform (r12): the same Skilling steps
    as three ``F.aggregate`` folds whose lambdas iterate at RUNTIME
    over the bit levels, so the plan is O(n) nodes no matter how many
    bits — the unrolled chain's analyze cost doubles per level and
    hits ~37 s at 16 bits, this form plans in constant time.  Four
    fixed projections materialize each stage once (the fold results
    would otherwise re-evaluate per reference):

    1. level sweep (invert/exchange) folding over q = 2^(bits-1)..2
       with the axis registers as an ``array<long>`` accumulator;
    2. Gray encode + the q-fold fixup mask;
    3. bit interleave folding high-to-low with a ``struct(h, x)``
       accumulator — axes shift LEFT by one (literal shift) each step
       so no column-valued shift distance is ever needed.

    Differential tests pin it equal to the pure-Python bijection and
    to the unrolled chain."""
    from pyspark.sql import functions as F

    zero = F.lit(0).cast("long")
    levels = F.array(
        *[F.lit(1 << b).cast("long") for b in range(bits - 1, 0, -1)]
    )

    def level_step(acc, q):
        p = q - F.lit(1).cast("long")
        new = [acc[i] for i in range(n)]
        cond0 = new[0].bitwiseAND(q) != 0
        new[0] = new[0].bitwiseXOR(F.when(cond0, p).otherwise(zero))
        for i in range(1, n):
            cond = new[i].bitwiseAND(q) != 0
            t = new[0].bitwiseXOR(new[i]).bitwiseAND(p)
            n0 = new[0].bitwiseXOR(F.when(cond, p).otherwise(t))
            ni = new[i].bitwiseXOR(F.when(cond, zero).otherwise(t))
            new[0], new[i] = n0, ni
        return F.array(*new)

    df = df.withColumn(
        "__hxa",
        F.aggregate(
            levels,
            F.array(*[F.col(nm).cast("long") for nm in names]),
            level_step,
        ),
    )
    xs = [F.col("__hxa")[i] for i in range(n)]
    for i in range(1, n):
        xs[i] = xs[i].bitwiseXOR(xs[i - 1])
    df = df.withColumn("__hxg", F.array(*xs))
    last = F.col("__hxg")[n - 1]
    df = df.withColumn(
        "__hxt",
        F.aggregate(
            levels,
            zero,
            lambda acc, q: F.when(
                last.bitwiseAND(q) != 0,
                acc.bitwiseXOR(q - F.lit(1).cast("long")),
            ).otherwise(acc),
        ),
    )
    df = df.withColumn(
        "__hxf",
        F.array(
            *[
                F.col("__hxg")[i].bitwiseXOR(F.col("__hxt"))
                for i in range(n)
            ]
        ),
    )
    mask = F.lit((1 << bits) - 1).cast("long")

    def interleave(acc, _e):
        x = acc["x"]
        tops = [
            F.shiftright(x[i], bits - 1).bitwiseAND(F.lit(1)).cast("long")
            for i in range(n)
        ]
        h = acc["h"] * F.lit(1 << n).cast("long")
        for i in range(n):
            h = h + tops[i] * F.lit(1 << (n - 1 - i)).cast("long")
        shifted = F.array(
            *[F.shiftleft(x[i], 1).bitwiseAND(mask) for i in range(n)]
        )
        return F.struct(h.alias("h"), shifted.alias("x"))

    df = df.withColumn(
        out_col,
        F.aggregate(
            F.array(*[F.lit(0)] * bits),
            F.struct(zero.alias("h"), F.col("__hxf").alias("x")),
            interleave,
            lambda s: s["h"],
        ),
    )
    return df.drop("__hxa", "__hxg", "__hxt", "__hxf", *names)


def hilbert_attach(
    rows: Any,
    cols: list[str],
    out_col: str = "__h",
    bits: int | None = None,
    histograms: dict[str, list[float]] | None = None,
    normalize: bool = True,
) -> Any:
    """``rows`` with ``out_col`` = the Hilbert index over ``cols``,
    computed by the unrolled Skilling transform as a chain of cheap
    integer projections (see module docstring for why a chain, not one
    expression).  ``normalize=False`` takes the columns as raw grid
    coordinates already in ``[0, 2^bits)`` — the caller's contract."""
    from pyspark.sql import functions as F

    from daskberg_spark.iceberg.writer import normalized_axes

    n = len(cols)
    if n < 2:
        raise ValueError("hilbert clustering needs >= 2 columns")
    bits = bits or default_bits(n)
    if bits * n > MAX_TOTAL_BITS:
        raise ValueError(
            f"{bits} bits x {n} dims exceeds a 64-bit index"
        )
    names = [f"__hx{i}" for i in range(n)]
    axes = (
        normalized_axes(rows, cols, bits, histograms)
        if normalize
        else [F.col(c).cast("long") for c in cols]
    )
    df = rows.select(
        "*", *[a.alias(nm) for a, nm in zip(axes, names)]
    )
    if bits >= FOLD_MIN_BITS:
        # deep grids: the constant-depth fold form — the unrolled
        # chain's plan cost doubles per level (module constant)
        return _attach_fold(df, names, bits, n, out_col)

    def X(i):
        return F.col(names[i])

    zero = F.lit(0).cast("long")
    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(n):
            cond = X(i).bitwiseAND(F.lit(q)) != 0
            if i == 0:
                # exchange with itself is a no-op; only invert applies
                df = df.withColumn(
                    names[0],
                    X(0).bitwiseXOR(F.when(cond, F.lit(p)).otherwise(zero)),
                )
                continue
            # x ^= when(...) keeps each register referenced ONCE per
            # step (x0 twice, via t) — the otherwise-branch form
            # references it 3x and the collapsed/codegen'd plan then
            # grows ~3^(bits*n) instead of ~2^(bits*n)
            t = X(0).bitwiseXOR(X(i)).bitwiseAND(F.lit(p))
            df = df.withColumns(
                {
                    names[0]: X(0).bitwiseXOR(
                        F.when(cond, F.lit(p)).otherwise(t)
                    ),
                    names[i]: X(i).bitwiseXOR(
                        F.when(cond, zero).otherwise(t)
                    ),
                }
            )
        q >>= 1
    for i in range(1, n):
        df = df.withColumn(names[i], X(i).bitwiseXOR(X(i - 1)))
    t_expr = F.lit(0).cast("long")
    q = 1 << (bits - 1)
    while q > 1:
        t_expr = F.when(
            X(n - 1).bitwiseAND(F.lit(q)) != 0,
            t_expr.bitwiseXOR(F.lit(q - 1)),
        ).otherwise(t_expr)
        q >>= 1
    df = df.withColumn("__ht", t_expr)
    df = df.withColumns(
        {nm: F.col(nm).bitwiseXOR(F.col("__ht")) for nm in names}
    )
    h = F.lit(0).cast("long")
    for j in range(bits):
        for i in range(n):
            bit = F.shiftright(X(i), j).bitwiseAND(F.lit(1)).cast("long")
            h = h.bitwiseOR(F.shiftleft(bit, j * n + (n - 1 - i)))
    return df.withColumn(out_col, h).drop("__ht", *names)


def sql_hilbert_ctes(
    base_cte: str,
    cols: list[str],
    bits: int,
    carry: list[str],
    out: str = "hval",
) -> str:
    """The SAME unrolled transform as portable ANSI-SQL CTE steps (for
    DuckDB oracles): ``WITH <base_cte> AS (...), <returned> SELECT ...
    FROM h_out``.  ``carry`` columns ride through every step.  A
    third, independently-evaluated implementation — the oracle never
    shares the Spark code path."""
    n = len(cols)
    names = [f"hx{i}" for i in range(n)]
    keep = ", ".join(carry)
    steps = [
        f"h0 AS (SELECT {keep}, "
        + ", ".join(f"{c} AS {nm}" for c, nm in zip(cols, names))
        + f" FROM {base_cte})"
    ]
    k = 0
    cur = "h0"

    def emit(select_exprs: list[str]) -> None:
        nonlocal k, cur
        k += 1
        steps.append(
            f"h{k} AS (SELECT {keep}, "
            + ", ".join(select_exprs)
            + f" FROM {cur})"
        )
        cur = f"h{k}"

    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(n):
            cond = f"({names[i]} & {q}) <> 0"
            if i == 0:
                exprs = [
                    f"CASE WHEN {cond} THEN xor({names[0]}, {p}) "
                    f"ELSE {names[0]} END AS {names[0]}"
                ] + [f"{nm} AS {nm}" for nm in names[1:]]
            else:
                t = f"(xor({names[0]}, {names[i]}) & {p})"
                exprs = []
                for j, nm in enumerate(names):
                    if j == 0:
                        exprs.append(
                            f"CASE WHEN {cond} THEN xor({nm}, {p}) "
                            f"ELSE xor({nm}, {t}) END AS {nm}"
                        )
                    elif j == i:
                        exprs.append(
                            f"CASE WHEN {cond} THEN {nm} "
                            f"ELSE xor({nm}, {t}) END AS {nm}"
                        )
                    else:
                        exprs.append(f"{nm} AS {nm}")
                exprs = exprs
            emit(exprs)
        q >>= 1
    for i in range(1, n):
        emit(
            [
                (
                    f"xor({nm}, {names[i - 1]}) AS {nm}"
                    if j == i
                    else f"{nm} AS {nm}"
                )
                for j, nm in enumerate(names)
            ]
        )
    # gray fixup mask from the last axis
    q = 1 << (bits - 1)
    t_sql = "0"
    while q > 1:
        t_sql = (
            f"CASE WHEN ({names[n - 1]} & {q}) <> 0 "
            f"THEN xor({t_sql}, {q - 1}) ELSE {t_sql} END"
        )
        q >>= 1
    emit([f"{nm} AS {nm}" for nm in names] + [f"{t_sql} AS ht"])
    emit([f"xor({nm}, ht) AS {nm}" for nm in names])
    parts = []
    for j in range(bits):
        for i in range(n):
            parts.append(
                f"((({names[i]} >> {j}) & 1) << {j * n + (n - 1 - i)})"
            )
    steps.append(
        f"h_out AS (SELECT {keep}, (" + " | ".join(parts) + f") AS {out} "
        f"FROM {cur})"
    )
    return ",\n".join(steps)
