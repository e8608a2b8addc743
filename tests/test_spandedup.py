"""Semantic tests for cross-document span dedup (spandedup.py).  The
oracle harness proves engine-vs-engine equality; these prove the
properties a curation pipeline relies on: coverage bounds, island
disjointness, the keep-one-canonical trim policy, and exact
reconstruction on synthetic corpora with known duplication."""

from __future__ import annotations

from pyspark.sql import functions as F

from daskberg_spark.operators.registry import table
from daskberg_spark.operators.spandedup import (
    SPAN_N,
    gram_occurrences,
    span_dedup_stats,
    span_dedup_trim,
)

SF = "/root/testdata/sf0.001"


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_stats_bounds_and_span_disjointness(spark):
    """dup_tokens never exceeds n_tokens; every span covers >= SPAN_N
    tokens, so n_spans * SPAN_N <= dup_tokens; ratio is consistent."""
    rows = span_dedup_stats(spark, SF).collect()
    assert rows, "fixture contains duplicated docs; stats must be non-empty"
    for r in rows:
        assert 0 < r["dup_tokens"] <= r["n_tokens"]
        assert r["n_spans"] >= 1
        assert r["n_spans"] * SPAN_N <= r["dup_tokens"]
        assert abs(r["dup_ratio"] - r["dup_tokens"] / r["n_tokens"]) < 1e-12


def test_gram_occurrences_full_width_only(spark):
    """Documents shorter than SPAN_N emit no grams; others emit exactly
    n_tokens - SPAN_N + 1 positioned grams of SPAN_N tokens each."""
    short = " ".join(f"w{i}" for i in range(SPAN_N - 1))
    long = " ".join(f"w{i}" for i in range(SPAN_N + 3))
    occ = gram_occurrences(
        _docs_df(spark, [(1, short), (2, long), (3, "")])
    ).collect()
    by_doc = {}
    for r in occ:
        by_doc.setdefault(r["doc_id"], []).append(r)
        assert len(r["gram"].split(" ")) == SPAN_N
    assert 1 not in by_doc and 3 not in by_doc
    assert sorted(r["pos"] for r in by_doc[2]) == list(range(4))


def test_trim_keeps_canonical_and_removes_copy(spark):
    """Two docs sharing an identical SPAN_N-token passage: the lower
    doc_id keeps its text (absent from output); the higher one comes
    back with exactly the shared passage removed."""
    shared = " ".join(f"s{i}" for i in range(SPAN_N))
    rows = _docs_df(
        spark,
        [
            (1, f"alpha beta {shared} gamma"),
            (2, f"delta {shared} epsilon zeta"),
        ],
    )
    # run the pipeline bodies directly over an ad-hoc frame via the
    # registered function's building blocks: write to a temp view is
    # overkill — monkey-table through parquet
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        rows.write.parquet(f"{td}/documents.parquet")
        out = {r["doc_id"]: r for r in span_dedup_trim(spark, td).collect()}
    assert list(out) == [2]
    r = out[2]
    assert r["trimmed_text"] == "delta epsilon zeta"
    assert r["kept_tokens"] == 3
    assert r["n_tokens"] == 3 + SPAN_N


def test_trim_fully_duplicated_doc_empties(spark):
    """A document that is a verbatim copy of an earlier one trims to
    empty text, zero kept tokens — the doc-level-dedup signal."""
    body = " ".join(f"t{i}" for i in range(SPAN_N + 5))
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        _docs_df(spark, [(10, body), (20, body)]).write.parquet(
            f"{td}/documents.parquet"
        )
        out = {r["doc_id"]: r for r in span_dedup_trim(spark, td).collect()}
    assert list(out) == [20]
    assert out[20]["kept_tokens"] == 0
    assert out[20]["trimmed_text"] == ""


def test_overlapping_grams_merge_into_one_span(spark):
    """A shared passage longer than SPAN_N produces many overlapping
    duplicated grams but exactly ONE merged span covering the passage."""
    passage = " ".join(f"p{i}" for i in range(3 * SPAN_N))
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        _docs_df(
            spark, [(1, f"u1 u2 {passage}"), (2, f"{passage} v1 v2")]
        ).write.parquet(f"{td}/documents.parquet")
        stats = {
            r["doc_id"]: r for r in span_dedup_stats(spark, td).collect()
        }
    assert stats[1]["n_spans"] == 1 and stats[2]["n_spans"] == 1
    assert stats[1]["dup_tokens"] == 3 * SPAN_N
    assert stats[2]["dup_tokens"] == 3 * SPAN_N


def test_stats_and_trim_agree_on_affected_docs(spark):
    """Every trimmed doc lost exactly the tokens some non-canonical
    coverage accounts for: kept + removed == n_tokens, and trim's
    affected set is a subset of stats' flagged set."""
    stats = {r["doc_id"]: r for r in span_dedup_stats(spark, SF).collect()}
    trim = span_dedup_trim(spark, SF).collect()
    assert trim
    for r in trim:
        assert r["doc_id"] in stats
        assert 0 <= r["kept_tokens"] < r["n_tokens"]
        if r["kept_tokens"]:
            assert len(r["trimmed_text"].split(" ")) == r["kept_tokens"]
        else:
            assert r["trimmed_text"] == ""
