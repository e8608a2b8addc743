"""Runtime Bloom-filter join prefilter (``operators.bloomjoin``).

Contracts: the build collects at most m/64 word rows regardless of dim
size; membership is a SUPERSET of the true key set (no matching row is
ever dropped); the bloom join is bit-identical to the plain join; outer
joins are refused; the probe stays inside whole-stage codegen (no
Python in the hot path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from daskberg_spark.operators.bloomjoin import (
    bloom_build_words,
    bloom_join,
    bloom_membership,
    bloom_prefilter,
)

M = 1 << 12  # small m to make false positives likely at n=500


def _frames(spark):
    fact = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    dim = spark.range(0, 5000).where(F.col("id") % 10 == 3).select(
        F.col("id").alias("dk")
    )
    return fact, dim


def test_no_matching_row_ever_dropped(spark):
    fact, dim = _frames(spark)
    pre = bloom_prefilter(fact, dim, "k", "dk", m_bits=M)
    kept = {r.k for r in pre.collect()}
    true_keys = {r.dk for r in dim.collect()}
    assert true_keys <= kept  # superset: every real key survives


def test_join_bit_identical_to_plain_join(spark):
    fact, dim = _frames(spark)
    plain = sorted(
        map(tuple, fact.join(dim, fact.k == dim.dk, "inner").collect())
    )
    bloomed = sorted(
        map(tuple, bloom_join(fact, dim, "k", "dk").collect())
    )
    assert bloomed == plain


def test_prefilter_actually_reduces(spark):
    fact, dim = _frames(spark)
    pre = bloom_prefilter(fact, dim, "k", "dk", m_bits=1 << 16)
    n_pre, n_fact = pre.count(), fact.count()
    n_true = fact.join(dim, fact.k == dim.dk, "semi").count()
    # with m=2^16 over 500 keys the fp rate is tiny: the prefilter must
    # sit near the true match count, far below the full fact
    assert n_true <= n_pre < n_fact * 0.2


def test_word_collect_is_bounded(spark):
    _, dim = _frames(spark)
    words = bloom_build_words(dim, "dk", m_bits=M)
    assert len(words) == M // 64
    assert any(words)  # something was set


def test_outer_join_refused(spark):
    fact, dim = _frames(spark)
    with pytest.raises(ValueError, match="inner/semi"):
        bloom_join(fact, dim, "k", "dk", how="left")


def test_null_fact_keys_never_break_inner_semantics(spark):
    fact = spark.createDataFrame(
        [(None,), (3,), (4,)], "k bigint"
    )
    dim = spark.createDataFrame([(3,)], "dk bigint")
    out = sorted(r.k for r in bloom_join(fact, dim, "k", "dk").collect())
    assert out == [3]


def test_probe_is_codegen_only(spark):
    """The membership predicate must compile into the scan's
    WholeStageCodegen span — no BatchEvalPython / ArrowEvalPython."""
    fact, dim = _frames(spark)
    words = bloom_build_words(dim, "dk", m_bits=M)
    plan = (
        fact.where(bloom_membership(F.col("k"), words, m_bits=M))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    # '*(n)' prefixes mark WholeStageCodegen spans in the tree rendering
    import re

    assert re.search(r"\*\(\d+\) Filter", plan)


def test_mismatched_key_types_still_bit_identical(spark):
    """Regression: xxhash64 hashes by physical type — an int fact key
    against a bigint dim key must cast before probing or every true
    match silently drops."""
    fact = spark.range(0, 100).selectExpr("CAST(id AS INT) AS k")
    dim = spark.range(0, 100).where(F.col("id") % 10 == 3).select(
        F.col("id").alias("dk")
    )
    plain = sorted(
        r.k for r in fact.join(dim, fact.k == dim.dk, "semi").collect()
    )
    bloomed = sorted(
        r.k for r in bloom_join(fact, dim, "k", "dk", how="semi").collect()
    )
    assert bloomed == plain and len(plain) == 10
