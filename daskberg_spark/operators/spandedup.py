"""Cross-document duplicated-span detection and removal (substring-level
dedup, the Lee-et-al "Deduplicating Training Data" granularity).

Document-level dedup (``dedup.py``) drops whole near-duplicate documents;
crawl corpora also carry *partial* duplication — boilerplate headers,
quoted passages, templated blocks — that survives doc-level filters.
These operators find token spans repeated across documents at word
``SPAN_N``-gram granularity and either report per-document duplication
stats or reconstruct the corpus with the non-canonical copies removed.

Pipeline shape (all pure Catalyst — no UDFs, no collects):

1. positioned word n-grams per document (``arrays_zip`` of shifted
   slices, the measured-fast shape from ``dedup.shingle_arrays``);
2. one hash-aggregate keyed on the gram finds grams occurring in >= 2
   distinct documents (at 100 TB you would key this shuffle on
   ``xxhash64(gram)`` and accept the 2^-64 collision odds; the oracle
   comparison here demands exact string grouping, which costs only
   shuffle width);
3. per-document interval merge of the duplicated occurrences — the
   classic gaps-and-islands window, partitioned BY DOCUMENT so no
   partition outgrows one document's gram count;
4. (trim) the canonical copy of each gram — its minimum ``doc_id``
   occurrence — is kept; every other coverage position is anti-joined
   away and the survivor tokens are reassembled in position order.

Scale: two shuffles (gram agg, per-doc window) plus one anti-join, every
key either corpus-distributed (gram) or bounded (doc_id).  No global
windows, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daskberg_spark.operators.registry import query, table

SPAN_N = 8  # word n-gram width; >= one sentence-ish, the usual 50-token
# span threshold scaled to this fixture's short documents

# shared token CTE — identical splitting to text._tokens but lowercased,
# so a gram matches case-insensitively on both engines
_SQL_LTOKS = (
    "CASE WHEN length(trim(text)) = 0 THEN [] "
    "ELSE string_split_regex(lower(trim(text)), '\\s+') END"
)

_SQL_GRAM_CTES = f"""
    toks AS (
      SELECT doc_id, {_SQL_LTOKS} AS t FROM documents
    ), grams AS (
      SELECT doc_id, i AS pos, array_to_string(t[i:i+{SPAN_N - 1}], ' ') AS gram
      FROM toks, unnest(range(1, len(t) - {SPAN_N} + 2)) AS u(i)
    )
"""

_SQL_ISLANDS = f"""
    isl AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev IS NULL OR pos - prev >= {SPAN_N}
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM (SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM occ)
    ), spans AS (
      SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + {SPAN_N} - 1 AS e
      FROM isl GROUP BY doc_id, island
    )
"""


def _ltokens(col):
    """Lowercased whitespace tokens, empty text -> empty array (the
    ``text._tokens`` shape; DuckDB twin: ``_SQL_LTOKS``)."""
    return F.when(
        F.length(F.trim(col)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.lower(F.trim(col)), "[ \\t\\n\\f\\r]+"))


def gram_occurrences(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, pos, gram): every full word-SPAN_N-gram with
    its 0-based token position.

    Same arrays_zip-of-slices construction as ``dedup.shingle_arrays``
    (the transform(sequence)-with-slice alternative re-inlines the
    split per element — measured ~8x slower there).  Slices are floored
    at length 1, so sub-SPAN_N documents emit short concat_ws grams;
    the position filter then keeps exactly the full-width grams,
    matching the oracle's ``range(1, len - N + 2)`` enumeration."""
    toks = docs.select("doc_id", _ltokens(F.col("text")).alias("toks"))
    tc = F.col("toks")
    m = F.greatest(F.size(tc) - SPAN_N + 1, F.lit(1))
    zipped = F.arrays_zip(
        *[F.slice(tc, 1 + k, m).alias(f"t{k}") for k in range(SPAN_N)]
    )
    grams = F.transform(
        zipped,
        lambda x: F.concat_ws(" ", *[x[f"t{k}"] for k in range(SPAN_N)]),
    )
    return toks.select(
        "doc_id",
        F.size(tc).alias("n_tokens"),
        F.posexplode(grams).alias("pos", "gram"),
    ).filter(F.col("pos") + SPAN_N <= F.col("n_tokens"))


def _merged_spans(occ: DataFrame) -> DataFrame:
    """Merge per-document duplicated-gram occurrences into disjoint
    covered intervals: (doc_id, s, e) inclusive token positions.

    Gaps-and-islands: occurrences sorted by position within the
    document; a new island starts when the previous occurrence's
    interval [prev, prev + SPAN_N) cannot reach this one.  Windows
    partition by doc_id — per-partition state is one document's
    occurrence list, never corpus-sized."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("pos").over(w)
    new_island = F.when(
        prev.isNull() | (F.col("pos") - prev >= SPAN_N), 1
    ).otherwise(0)
    isl = occ.select(
        "doc_id", "pos", F.sum(new_island).over(wrun).alias("island")
    )
    return isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + SPAN_N - 1).alias("e"),
    )


@query(
    "span_dedup_stats",
    f"""
    WITH {_SQL_GRAM_CTES},
    dup AS (
      SELECT gram FROM grams GROUP BY gram
      HAVING COUNT(DISTINCT doc_id) >= 2
    ), occ AS (
      SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)
    ), {_SQL_ISLANDS}
    SELECT t.doc_id,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           CAST(COUNT(s.island) AS BIGINT) AS n_spans,
           CAST(COALESCE(SUM(s.e - s.s + 1), 0) AS BIGINT) AS dup_tokens,
           CAST(COALESCE(SUM(s.e - s.s + 1), 0) AS DOUBLE)
             / greatest(len(t.t), 1) AS dup_ratio
    FROM toks t JOIN spans s USING (doc_id)
    GROUP BY t.doc_id, len(t.t)
    """,
)
def span_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span census: for every document sharing
    at least one word-SPAN_N-gram with another document, the number of
    merged duplicated spans, the token count they cover, and the covered
    fraction — the report a curation pipeline thresholds on before
    span-trimming or down-weighting.

    Scale: gram hash-agg (one shuffle, corpus-distributed key) +
    semi-join back + per-document island windows.  Integer-exact
    aggregates; the ratio divides two exact integers, bit-identical
    across engines."""
    docs = table(spark, sf_dir, "documents")
    occ = gram_occurrences(docs)
    # "gram appears in >= 2 distinct documents" ⟺ min(doc_id) !=
    # max(doc_id) — computed as a WINDOW over the gram partition, not an
    # aggregate joined back: the agg+semi-join shape shuffles the full
    # occurrence frame TWICE (once into the aggregate, once into the
    # join), the window shuffles it once and sorts in place (interleaved
    # micro-bench at sf0.1, downstream islands included: 2.69 s → 1.50 s
    # min-of-4)
    wg = Window.partitionBy("gram")
    kept = (
        occ.select(
            "doc_id",
            "pos",
            F.min("doc_id").over(wg).alias("mn"),
            F.max("doc_id").over(wg).alias("mx"),
        )
        .filter(F.col("mn") != F.col("mx"))
        .select("doc_id", "pos")
    )
    spans = _merged_spans(kept)
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("dup_tokens"),
    )
    base = docs.select(
        "doc_id", F.size(_ltokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    return base.join(per_doc, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_spans",
        "dup_tokens",
        (
            F.col("dup_tokens").cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1))
        ).alias("dup_ratio"),
    )


@query(
    "span_dedup_trim",
    f"""
    WITH {_SQL_GRAM_CTES},
    own AS (
      SELECT gram, MIN(doc_id) AS own FROM grams
      GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ), occ AS (
      SELECT g.doc_id, g.pos FROM grams g JOIN own USING (gram)
      WHERE g.doc_id > own.own
    ), {_SQL_ISLANDS},
    cover AS (
      SELECT doc_id, unnest(range(s, e + 1)) AS pos FROM spans
    ), affected AS (
      SELECT DISTINCT doc_id FROM cover
    ), tokpos AS (
      SELECT t.doc_id, u.i AS pos, t.t[u.i] AS tok
      FROM toks t JOIN affected USING (doc_id),
           unnest(range(1, len(t.t) + 1)) AS u(i)
    ), kept AS (
      SELECT tp.doc_id, tp.pos, tp.tok
      FROM tokpos tp
      LEFT JOIN cover c ON c.doc_id = tp.doc_id AND c.pos = tp.pos
      WHERE c.pos IS NULL
    ), agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_tokens,
             string_agg(tok, ' ' ORDER BY pos) AS trimmed_text
      FROM kept GROUP BY doc_id
    )
    SELECT a.doc_id,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           CAST(COALESCE(g.kept_tokens, 0) AS BIGINT) AS kept_tokens,
           COALESCE(g.trimmed_text, '') AS trimmed_text
    FROM affected a
    JOIN toks t USING (doc_id)
    LEFT JOIN agg g USING (doc_id)
    """,
)
def span_dedup_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup with a keep-one policy: each duplicated gram's
    canonical copy lives in its minimum-doc_id document; every OTHER
    document's covered positions are removed and the surviving tokens
    reassembled in order.  Emits one row per affected document with its
    trimmed text — documents that were pure duplication come back empty
    (the doc-level-dedup signal), partial overlaps keep their unique
    remainder, canonical owners are untouched (and absent here).

    Scale: adds to the stats plan one position-level anti-join keyed on
    (doc_id, pos) and a per-document ordered reassembly via
    ``listagg(tok) WITHIN GROUP (ORDER BY pos)`` — partial-aggregating
    map-side, grouping state bounded by one document's length (the same
    bound the raw ``text`` value already imposes).  No UDFs."""
    docs = table(spark, sf_dir, "documents")
    occ = gram_occurrences(docs)
    # min != max ⟺ >= 2 distinct owners, and the canonical owner is the
    # minimum doc_id — both as a WINDOW over the gram partition rather
    # than an aggregate joined back (one shuffle of the occurrence frame
    # instead of two; see span_dedup_stats for the measurement)
    wg = Window.partitionBy("gram")
    nc = (
        occ.select(
            "doc_id",
            "pos",
            F.min("doc_id").over(wg).alias("own"),
            F.max("doc_id").over(wg).alias("mx"),
        )
        .filter(
            (F.col("own") != F.col("mx")) & (F.col("doc_id") > F.col("own"))
        )
        .select("doc_id", "pos")
    )
    # the merged-span frame is tiny (one row per duplicated span) but its
    # lineage is the whole gram pipeline; every downstream reference
    # (cover, affected, the final join) would re-scan the corpus through
    # it — checkpoint once, like dedup's shingle index
    spans = _merged_spans(nc).localCheckpoint()
    cover = spans.select(
        "doc_id",
        F.explode(F.sequence(F.col("s"), F.col("e"))).alias("pos"),
    )
    affected = spans.select("doc_id").distinct()
    tokpos = (
        docs.join(affected, "doc_id", "left_semi")
        .select("doc_id", F.posexplode(_ltokens(F.col("text"))).alias("pos", "tok"))
    )
    kept = tokpos.join(cover, ["doc_id", "pos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("kept_tokens"),
        F.expr("listagg(tok, ' ') WITHIN GROUP (ORDER BY pos)").alias(
            "trimmed_text"
        ),
    )
    base = docs.select(
        "doc_id", F.size(_ltokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    return (
        affected.join(base, "doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("kept_tokens"), F.lit(0))
            .cast("long")
            .alias("kept_tokens"),
            F.coalesce(F.col("trimmed_text"), F.lit("")).alias("trimmed_text"),
        )
    )
