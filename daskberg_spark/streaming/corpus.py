"""Structured-streaming corpus ingestion (SURVEY §2 C-tier × streaming):
the LLM-pipeline shapes — quality gate, bounded-state exact dedup —
run as a STREAM, the way a crawl feed actually arrives.

``dropDuplicatesWithinWatermark`` is the scale story: plain
``dropDuplicates`` keys state forever (unbounded on an endless crawl),
while the watermark bound lets the engine evict fingerprints older
than the lateness window — state is O(docs per window), not O(corpus).
The fixture fits entirely inside the window, so the batch oracle (one
row per surviving (lang, fingerprint) group) pins the result exactly.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daskberg_spark.operators.registry import query
from daskberg_spark.streaming.events import _run_to_memory


def _docs_stream(spark: SparkSession, sf_dir: str):
    """readStream over documents.parquet (the events stream's symlink
    pattern: a stable per-sf dir so checkpoint-free memory-sink runs
    re-resolve the same source)."""
    import hashlib
    import tempfile

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    link_dir = os.path.join(
        tempfile.gettempdir(),
        "daskberg_docstream_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8],
    )
    os.makedirs(link_dir, exist_ok=True)
    link = os.path.join(link_dir, "documents.parquet")
    target = os.path.abspath(f"{sf_dir}/documents.parquet")
    if (
        not os.path.lexists(link)
        or os.path.realpath(link) != os.path.realpath(target)
    ):
        tmp = link + f".tmp-{os.getpid()}-{uuid.uuid4().hex[:6]}"
        os.symlink(target, tmp)
        os.replace(tmp, link)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(link_dir)
    )


@query(
    "streaming_corpus_dedup",
    """
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT lang,
             md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp,
             MIN(n_chars) AS n_chars
      FROM documents
      WHERE len(CASE WHEN length(trim(text)) = 0 THEN []
                     ELSE string_split_regex(trim(text), '\\s+') END) >= 10
      GROUP BY lang, fp
    )
    GROUP BY lang
    """,
)
def streaming_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus ingestion: quality-gate (≥10 tokens) →
    BOUNDED-STATE exact dedup (``dropDuplicatesWithinWatermark`` on
    (lang, fingerprint) under a 1-hour event-time watermark — state
    evicts with the window instead of accumulating forever) → per-lang
    running counts.  The dedup key includes ``lang`` so identical text
    appearing under two languages keeps one doc PER language — without
    it the surviving language would be micro-batch-order-dependent and
    no exact oracle could exist.  ``n_chars`` is a pure function of the
    text, so summing it over survivors is order-independent too."""
    from daskberg_spark.operators.text import _tokens

    stream = _docs_stream(spark, sf_dir)
    fp = F.md5(
        F.encode(
            F.lower(F.regexp_replace("text", "[ \\t\\n\\f\\r]+", " ")),
            "UTF-8",
        )
    )
    # +1 day: a doc_id-0 event time of EXACTLY epoch 0 ties the sink's
    # initial watermark and is silently dropped as expired — the state
    # machinery treats ts <= watermark as late
    ts = F.timestamp_micros(
        (F.col("doc_id") + F.lit(86_400)) * F.lit(1_000_000)
    )
    gated = (
        stream.withColumn("ts", ts)
        .withColumn("fp", fp)
        .filter(F.size(_tokens(F.col("text"))) >= 10)
        .withWatermark("ts", "1 hour")
    )
    deduped = gated.dropDuplicatesWithinWatermark(["lang", "fp"])
    agg = deduped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    out = _run_to_memory(agg, spark)
    return out.select("lang", "n_docs", "total_chars")
