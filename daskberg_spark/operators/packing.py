"""Sequence-assembly operators: packing, chunking, repetition filtering.

The steps between a cleaned corpus and a training batch: pack documents
into fixed-token-budget context windows, split long documents into
overlapping chunks, and measure within-document repetition (the classic
quality gate on crawl text).  All three are pure Catalyst with DuckDB SQL
twins — no Python in the hot path.

Scale notes per docstring; the common theme is that every shuffle key
includes a bounded shard component so no single partition grows with the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daskberg_spark.operators.registry import (
    davg,
    query,
    sql_davg,
    table,
)

CTX_TOKENS = 512  # context-window token budget per packed sequence
PACK_SHARDS = 8  # deterministic shard fan-out inside each source


@query(
    "sequence_packing",
    f"""
    WITH tok AS (
      SELECT source, doc_id % {PACK_SHARDS} AS shard, doc_id,
             CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
                  AS BIGINT) AS n_tok
      FROM documents
    ), cum AS (
      SELECT source, shard, n_tok,
             COALESCE(SUM(n_tok) OVER (
               PARTITION BY source, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM tok
    )
    SELECT source, shard, CAST(cum_before // {CTX_TOKENS} AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS tokens
    FROM cum GROUP BY source, shard, bin
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy concat-and-chunk sequence packing: stream documents in
    doc_id order and assign each to the CTX_TOKENS-budget bin in which
    its first token lands, reporting per-bin document and token counts
    (the fill-rate census a batching pipeline monitors).  Document
    boundaries are preserved — a doc belongs to the bin where it starts,
    the deterministic variant of packing-with-boundaries.

    Scale: the running total is a window per (source, shard) where
    ``shard = doc_id % PACK_SHARDS`` — each packing stream is an
    independent, bounded partition, so a 100 TB corpus packs as
    sources × shards parallel streams instead of one global cumsum
    (a single-partition window is the classic packing scale trap).
    One shuffle on the compacted (doc, n_tok) projection, then a hash
    agg whose output is O(total_tokens / CTX_TOKENS)."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        "doc_id",
        F.size(F.split(F.lower(F.trim("text")), "[ \\t\\n\\f\\r]+"))
        .cast("long")
        .alias("n_tok"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = tok.withColumn(
        "cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    )
    return cum.groupBy(
        "source",
        "shard",
        F.expr(f"cum_before DIV {CTX_TOKENS}").alias("bin"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("tokens"),
    )


CHUNK_CHARS = 120
CHUNK_STRIDE = 90
CHUNK_DOCS = 100  # emit chunk rows for this doc_id prefix


@query(
    "doc_chunking",
    f"""
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(len(substr(text, i * {CHUNK_STRIDE} + 1, {CHUNK_CHARS}))
                AS BIGINT) AS chunk_len,
           md5(substr(text, i * {CHUNK_STRIDE} + 1, {CHUNK_CHARS}))
             AS chunk_md5
    FROM documents,
         unnest(range(0, 1 + (len(text) - 1) // {CHUNK_STRIDE})) AS t(i)
    WHERE doc_id < {CHUNK_DOCS} AND len(text) > 0
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunking (RAG / long-context split): each
    document explodes into CHUNK_CHARS-character windows advancing by
    CHUNK_STRIDE, so consecutive chunks share CHUNK_CHARS−CHUNK_STRIDE
    characters of overlap.  Chunk content is proven, not just counted —
    the oracle matches the md5 of every chunk, byte for byte.

    Scale: a narrow generate-and-explode map, no shuffle at all (the
    1→N fan-out happens inside the scan stage); output size is
    corpus_chars / CHUNK_STRIDE rows.  The doc_id < CHUNK_DOCS emit
    filter is pushed to the parquet scan."""
    docs = table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < CHUNK_DOCS) & (F.length("text") > 0)
    )
    chunk = F.col("text").substr(
        F.col("i").cast("int") * CHUNK_STRIDE + 1, F.lit(CHUNK_CHARS)
    )
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.expr(f"(length(text) - 1) DIV {CHUNK_STRIDE}"),
                )
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").alias("chunk_idx"),
            F.length(chunk).cast("long").alias("chunk_len"),
            F.md5(chunk.cast("binary")).alias("chunk_md5"),
        )
    )


REP_THRESHOLD = 0.2  # Gopher-style duplicate-token-fraction gate


@query(
    "repetition_stats",
    f"""
    WITH per_doc AS (
      SELECT lang,
             1.0 - CAST(len(list_distinct(
                     string_split_regex(lower(trim(text)), '\\s+')))
                   AS DOUBLE)
                 / len(string_split_regex(lower(trim(text)), '\\s+'))
               AS rep_frac
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           {sql_davg('rep_frac', 'avg_rep_frac')},
           CAST(SUM(CASE WHEN rep_frac > {REP_THRESHOLD} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_over_threshold
    FROM per_doc GROUP BY lang
    """,
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition census (the Gopher duplicate-token
    filter): per document, the fraction of token occurrences that are
    repeats of an earlier token — ``1 − distinct/total`` — then per
    language the average fraction and how many documents exceed the
    REP_THRESHOLD gate.  The per-doc fraction is one divide on two
    integer counts, bit-identical across engines; the average uses the
    decimal-exact sum convention.

    Scale: narrow map (tokenize + two array ops per row, no explode) +
    a languages-sized hash agg — one shuffle of O(langs) partial rows."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), "[ \\t\\n\\f\\r]+")
    rep = (
        F.lit(1.0)
        - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    ).alias("rep_frac")
    return (
        docs.select("lang", rep)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            davg("rep_frac", "avg_rep_frac"),
            F.sum(
                (F.col("rep_frac") > REP_THRESHOLD).cast("int")
            )
            .cast("long")
            .alias("n_over_threshold"),
        )
    )


SHARD_MULT = 2654435761  # Knuth multiplicative constant
SHARD_SEED = 42
N_TRAIN_SHARDS = 16


@query(
    "training_shards",
    f"""
    SELECT ((doc_id * {SHARD_MULT} + {SHARD_SEED}) % 4294967296)
             % {N_TRAIN_SHARDS} AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM documents
    GROUP BY shard
    """,
)
def training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment — the epoch-sharding step
    of a training-data pipeline: every document maps to one of
    N_TRAIN_SHARDS shards via a seeded multiplicative hash of its id, so
    the split is reproducible across engines, runs, and partitionings
    (rand()-free), and sequential ids decorrelate instead of clumping.
    Per shard: document count, total characters (token-budget proxy for
    balance checks), and id range.

    Scale: one narrow two-column scan + one hash aggregation keyed on a
    16-value shard id — O(shards) result rows, no skew (the multiplier
    spreads any id distribution)."""
    docs = table(spark, sf_dir, "documents")
    shard = F.pmod(
        F.pmod(
            F.col("doc_id") * F.lit(SHARD_MULT) + F.lit(SHARD_SEED),
            F.lit(4294967296),
        ),
        F.lit(N_TRAIN_SHARDS),
    ).alias("shard")
    return (
        docs.select(shard, "doc_id", "n_chars")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )
