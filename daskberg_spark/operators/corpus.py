"""Corpus-curation operators beyond the r2 set (Tier C extensions).

Training-data-pipeline staples that round out SURVEY §2 C1–C4: vocabulary
statistics (frequent n-grams), per-stratum deterministic downsampling,
TF-IDF keyword extraction, numeric profiling histograms, and applying a
trained BPE tokenizer to the corpus.

All but ``bpe_encode_corpus`` are oracle-exact (pure Catalyst, DuckDB SQL
twins); conventions from ``registry.py`` (decimal-exact sums, BIGINT
casts) apply throughout.  Scale notes per docstring — every operator here
is one corpus map plus bounded aggregation; nothing is all-pairs and
nothing materializes corpus-sized state on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daskberg_spark.operators.registry import (
    dsum,
    query,
    sql_dsum,
    table,
)

TOP_NGRAMS = 20


@query(
    "frequent_ngrams",
    f"""
    WITH tok AS (
      SELECT string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
      WHERE len(string_split_regex(lower(trim(text)), '\\s+')) >= 2
    ), big AS (
      SELECT unnest(list_transform(range(1, len(t)),
                    i -> concat_ws(' ', t[i], t[i+1]))) AS bigram
      FROM tok
    )
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM big GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT {TOP_NGRAMS}
    """,
)
def frequent_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: the TOP_NGRAMS most frequent word
    bigrams (count desc, bigram asc tie-break → deterministic set even
    at the rank boundary).

    Scale: bigram generation is a narrow map (no shuffle); the count is
    a partial-agg hash aggregate whose output is vocabulary-sized, and
    the global top-k is a TakeOrderedAndProject (per-partition top-k
    then a k-row merge on the driver) — no full sort of the vocabulary."""
    docs = table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.trim("text")), "[ \\t\\n\\f\\r]+")
    big = (
        docs.select(t.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("t", i), F.element_at("t", i + 1)
                    ),
                )
            ).alias("bigram")
        )
    )
    return (
        big.groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(TOP_NGRAMS)
    )


# Per-language md5-prefix keep thresholds (hex-string compare): the first
# two hex chars of md5(text) are uniform over 00..ff, so '20' ≈ 12.5 %,
# '40' ≈ 25 %, '80' ≈ 50 %.  Shared verbatim with the SQL oracle.
STRATA_THRESHOLDS = {"en": "20", "de": "40", "fr": "80"}
DEFAULT_THRESHOLD = "10"

_SQL_THR = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in STRATA_THRESHOLDS.items())
    + f" ELSE '{DEFAULT_THRESHOLD}' END"
)


@query(
    "stratified_sample",
    f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN substr(md5(text), 1, 2) < ({_SQL_THR})
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(SUM(CASE WHEN substr(md5(text), 1, 2) < ({_SQL_THR})
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS achieved_rate
    FROM documents GROUP BY lang
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic downsampling — rebalancing a corpus to
    target per-language rates (the mixture-adjustment step after
    ``corpus_mixing_weights`` decides the rates).  Membership is a pure
    function of content (md5-prefix threshold compare), so the sample is
    reproducible across engines, runs, and partitionings — unlike
    ``df.sample``'s per-partition RNG.  Pure Catalyst (JVM md5, no
    Python); one map + hash agg.  The oracle verifies the cohort itself,
    not just its size, because md5 is engine-identical."""
    docs = table(spark, sf_dir, "documents")
    thr = F.lit(DEFAULT_THRESHOLD)
    for k, v in reversed(STRATA_THRESHOLDS.items()):
        thr = F.when(F.col("lang") == k, v).otherwise(thr)
    keep = (F.substring(F.md5(F.col("text").cast("binary")), 1, 2) < thr).cast(
        "int"
    )
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(keep).cast("long").alias("n_sampled"),
        (F.sum(keep).cast("double") / F.count(F.lit(1))).alias("achieved_rate"),
    )


TFIDF_DOCS = 200  # emit keywords for this doc_id prefix (stats stay global)
TFIDF_K = 3


@query(
    "tfidf_top_terms",
    f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             (CAST(tf.tf AS DOUBLE) * n.n_docs) / d.df AS tfidf,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY (CAST(tf.tf AS DOUBLE) * n.n_docs) / d.df DESC,
                        tf.term
             ) AS rk
      FROM tf JOIN dfreq d USING (term), n
      WHERE tf.doc_id < {TFIDF_DOCS}
    )
    SELECT doc_id, term, tfidf, CAST(rk AS INTEGER) AS rk
    FROM scored WHERE rk <= {TFIDF_K}
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-TFIDF_K terms per document, scored
    tf × N/df with document frequency computed over the WHOLE corpus
    (the global-statistics + per-doc-ranking pattern).  The idf factor
    is the rational N/df rather than ln(N/df): same ranking, but pure
    IEEE multiply/divide so both engines agree bit-exactly (libm log
    may differ in the last ulp between JVM and C).

    Scale: tf is one corpus shuffle on (doc, term); df is vocabulary-
    sized and joined on term (AQE broadcasts it when small, shuffles
    when a 100 TB vocabulary isn't); the final per-doc top-k is a
    bounded window over the emitted doc subset.  Ties break on term asc
    → deterministic."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), "[ \\t\\n\\f\\r]+")).alias("term"),
    )
    # tf feeds BOTH the df branch and the scored branch; without a
    # checkpoint Catalyst re-derives it per branch (two corpus scans,
    # two (doc,term) shuffles).  Materializing tf once is the standard
    # TF-IDF persistence point — it is the corpus collapsed to the
    # sparse (doc,term) matrix, the last corpus-sized intermediate.
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint()
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (
        tf.filter(F.col("doc_id") < TFIDF_DOCS)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            (F.col("tf").cast("double") * F.col("n_docs")) / F.col("df"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_K)
        .select("doc_id", "term", "tfidf", "rk")
    )


HIST_BIN = 5.0


@query(
    "events_value_histogram",
    f"""
    SELECT event_type,
           CAST(FLOOR(value / {HIST_BIN}) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('value', 'sum_value')}
    FROM events GROUP BY event_type, bin
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-profiling histogram: fixed-width value buckets per event
    type — the distribution census that sits next to ``profile_table``
    in a data-quality sweep.  floor(x/width) is a single IEEE divide +
    floor, identical on both engines; counts and decimal-exact sums per
    bucket.  One map + hash agg; output is O(types × buckets)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.floor(F.col("value") / HIST_BIN).cast("long").alias("bin"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum("value", "sum_value"),
    )


ENCODE_MERGES = 20


@query("bpe_encode_corpus")  # iterative merge application → no SQL twin
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a trained BPE tokenizer to the corpus (the serving half of
    ``bpe_train_merges``): learn ENCODE_MERGES rules, broadcast the merge
    list, and encode every document executor-side, reporting per-source
    symbol counts before/after and the compression ratio.

    Scale: the merge table is tokenizer-sized (32k–100k rows → a few MB)
    and broadcast once; encoding is an Arrow-batched mapInPandas over the
    corpus — embarrassingly parallel, no shuffle before the final small
    agg.  Deterministic (merges applied in learned order) but iterative
    per-token, hence rows-only: no SQL engine can express the greedy
    merge loop.

    Encoding applies the LOWEST-RANK pair present each round (merge-rank
    dict, the GPT-2 pattern) instead of scanning the full rule list per
    word — cost scales with merges actually applied, not tokenizer size —
    and memoizes token counts per distinct word (a natural-language
    corpus repeats its vocabulary; the cache is vocabulary-sized, not
    corpus-sized).  Equivalent to sequential rule application because a
    trained rule's symbols are products of strictly earlier rules."""
    import pandas as pd

    from daskberg_spark.operators.text import bpe_train

    merges = [
        (r["left"], r["right"])
        for r in bpe_train(spark, sf_dir, n_merges=ENCODE_MERGES)
        .orderBy("step")
        .collect()
    ]

    def encode(batches, merges=merges):
        rank = {p: i for i, p in enumerate(merges)}
        cache: dict[str, int] = {}

        def n_tokens(word: str) -> int:
            n = cache.get(word)
            if n is not None:
                return n
            syms = list(word)
            while len(syms) > 1:
                best = None
                for i in range(len(syms) - 1):
                    r = rank.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best = r
                if best is None:
                    break
                a, b = merges[best]
                i, out = 0, []
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            n = len(syms)
            cache[word] = n
            return n

        for pdf in batches:
            rows = []
            for src, text in zip(pdf["source"], pdf["text"]):
                before = after = 0
                for word in text.lower().split():
                    before += len(word)
                    after += n_tokens(word)
                rows.append((src, before, after))
            yield pd.DataFrame(
                rows, columns=["source", "syms_before", "tokens_after"]
            )

    docs = table(spark, sf_dir, "documents").select("source", "text")
    enc = docs.mapInPandas(
        encode, "source string, syms_before long, tokens_after long"
    )
    return enc.groupBy("source").agg(
        F.sum("syms_before").cast("long").alias("total_syms"),
        F.sum("tokens_after").cast("long").alias("total_tokens"),
        (
            F.sum("tokens_after").cast("double") / F.sum("syms_before")
        ).alias("compression"),
    )


VOCAB_SIZE = 100


@query(
    "vocab_coverage",
    f"""
    WITH lt AS (
      SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT lang,
                   unnest(string_split_regex(lower(trim(text)), '\\s+'))
                     AS term
            FROM documents)
      GROUP BY lang, term
    ), tot AS (
      SELECT term, CAST(SUM(n) AS BIGINT) AS total FROM lt GROUP BY term
    ), vocab AS (
      SELECT term FROM tot ORDER BY total DESC, term LIMIT {VOCAB_SIZE}
    )
    SELECT lang,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.term IS NOT NULL THEN n ELSE 0 END)
                AS BIGINT) AS in_vocab,
           1.0 - CAST(SUM(CASE WHEN v.term IS NOT NULL THEN n ELSE 0 END)
                      AS DOUBLE) / SUM(n) AS oov_rate
    FROM lt LEFT JOIN vocab v USING (term)
    GROUP BY lang
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: build the top-VOCAB_SIZE term
    vocabulary (count desc, term asc — deterministic boundary) and
    report per-language token counts and out-of-vocabulary rate — the
    metric that decides whether a tokenizer needs retraining for a new
    corpus mix.

    Scale: ONE corpus pass collapses text to per-(lang, term) counts
    (`lt`, checkpointed — it feeds both the vocabulary build and the
    coverage join and is vocabulary×languages-sized, not corpus-sized).
    The vocabulary itself is VOCAB_SIZE rows → explicit broadcast join;
    the OOV census never re-reads the corpus."""
    docs = table(spark, sf_dir, "documents")
    lt = (
        docs.select(
            "lang",
            F.explode(
                F.split(F.lower(F.trim("text")), "[ \\t\\n\\f\\r]+")
            ).alias("term"),
        )
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()
    )
    vocab = (
        lt.groupBy("term")
        .agg(F.sum("n").cast("long").alias("total"))
        .orderBy(F.col("total").desc(), "term")
        .limit(VOCAB_SIZE)
        .select("term", F.lit(1).alias("__in_vocab"))
    )
    joined = lt.join(F.broadcast(vocab), "term", "left")
    in_vocab = F.sum(
        F.when(F.col("__in_vocab").isNotNull(), F.col("n")).otherwise(0)
    )
    return joined.groupBy("lang").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        in_vocab.cast("long").alias("in_vocab"),
        (
            F.lit(1.0)
            - in_vocab.cast("double") / F.sum("n")
        ).alias("oov_rate"),
    )
