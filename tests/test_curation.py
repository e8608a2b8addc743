"""Curation operators: domain cap, unigram quality, chunk dedup."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _q(name):
    import __spark_entry__ as e

    return e.queries()[name]


def test_domain_cap_respects_cap_and_counts(spark):
    from daskberg_spark.operators.curation import DOMAIN_CAP

    rows = _q("domain_cap_sample")(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_kept <= DOMAIN_CAP
        assert r.n_kept <= r.n_total
        if r.n_total <= DOMAIN_CAP:
            assert r.n_kept == r.n_total


def test_domain_cap_partition_invariant(spark):
    a = {r.source: r.n_kept for r in _q("domain_cap_sample")(spark, SF_SMALL).collect()}
    # same logic over a repartitioned source must pick identical survivors
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").repartition(13)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    b = (
        docs.select("source", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 8)
        .groupBy("source")
        .count()
    )
    assert {r.source: r["count"] for r in b.collect()} == a


def test_unigram_meanprob_orders_rare_vocab_first(spark):
    rows = _q("quality_unigram_meanprob")(spark, SF_SMALL).collect()
    assert len(rows) == 10
    scores = [r.mean_tok_prob for r in rows]
    assert scores == sorted(scores)
    assert all(0.0 < s <= 1.0 for s in scores)


def test_chunk_dedup_finds_planted_duplicates(spark):
    # the documents fixture carries near/exact duplicate pairs; at least
    # one 8-word block must repeat across documents
    rows = _q("dedup_chunks_exact")(spark, SF_SMALL).collect()
    assert rows
    assert rows[0].dup_frac >= rows[-1].dup_frac
    assert any(r.n_dup > 0 for r in rows)
    for r in rows:
        assert 0 <= r.n_dup <= r.n_chunks
