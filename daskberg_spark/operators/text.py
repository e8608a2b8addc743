"""Tier-C text-analysis operators over the ``documents`` table (SURVEY §2 C4).

Everything here is pure Catalyst (JVM codegen, no Python in the hot path)
except the rolling-hash fingerprint, which demonstrates the Arrow-batched
pandas-UDF escape hatch.  All expressions are integer/deterministic-double
so the DuckDB oracles match bit-exactly.

Scale: every operator is a narrow map over the corpus followed by an
optional small hash-agg — embarrassingly parallel at 100 TB, no shuffles
except the final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daskberg_spark.operators.registry import (
    davg,
    literal_df,
    query,
    sql_davg,
    table,
)

# Tiny deterministic stopword lists shared verbatim with the SQL oracles.
STOP_EN = ["the", "a", "and", "of", "to", "in", "is"]
STOP_DE = ["der", "die", "das", "und", "ist", "zu", "ein"]
STOP_FR = ["le", "la", "et", "de", "un", "est", "en"]

# BPE-ish token classes: letter runs, digit runs, single non-space symbols.
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def _tokens(col):
    """Whitespace tokens of trimmed text (empty text → empty array).

    Splits on the ``[ \\t\\n\\f\\r]+`` character class directly.  r10
    replaced this with ``translate``-to-spaces + a ``' +'`` split on the
    theory that the class regex was the r9 control regression — but the
    r11 isolated A/B measured the translate form 1.2–1.4x SLOWER inside
    every consuming query (text_quality 1.39x, langid 1.23x, text_stats
    1.25x at sf0.1, interleaved min-of-5: ``' +'`` is still a regex
    split, so translate added a whole extra string pass and bought
    nothing).  Reverted; SCALING.md round 11 carries the measurement."""
    t = F.trim(col)
    return F.when(
        F.length(t) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(t, "[ \\t\\n\\f\\r]+"))


_SQL_TOKENS = (
    "CASE WHEN length(trim(text)) = 0 THEN [] "
    "ELSE string_split_regex(trim(text), '\\s+') END"
)


@query(
    "text_stats",
    f"""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           {sql_davg('CAST(n_chars AS DOUBLE)', 'avg_chars')},
           CAST(SUM(len({_SQL_TOKENS})) AS BIGINT) AS total_tokens
    FROM documents GROUP BY lang, source
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: corpus statistics per (lang, source) — token counting via
    whitespace split, single map + hash agg."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.withColumn("n_tokens", F.size(_tokens(F.col("text"))))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg(F.col("n_chars").cast("double"), "avg_chars"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


@query(
    "text_quality",
    f"""
    SELECT doc_id,
           CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_words,
           CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS BIGINT)
             AS n_punct,
           CAST(len(list_filter({_SQL_TOKENS},
                 t -> list_contains({STOP_EN}, t))) AS BIGINT) AS n_stop,
           CAST(len(list_filter({_SQL_TOKENS},
                 t -> list_contains({STOP_EN}, t))) AS DOUBLE)
             / len({_SQL_TOKENS}) AS stop_ratio,
           CAST(length(text) AS DOUBLE) / len({_SQL_TOKENS}) AS chars_per_word
    FROM documents
    WHERE len({_SQL_TOKENS}) > 0
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: per-document quality signals (word count, punctuation count,
    stopword ratio, chars/word) — the classic pretraining-filter features.
    """
    docs = table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(w) for w in STOP_EN])
    n_words = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.length("text") - F.length(F.regexp_replace("text", "[.!?,;:]", ""))
    return (
        docs.select(
            "doc_id",
            n_words.cast("long").alias("n_words"),
            n_punct.cast("long").alias("n_punct"),
            n_stop.cast("long").alias("n_stop"),
            (n_stop.cast("double") / n_words).alias("stop_ratio"),
            (F.length("text").cast("double") / n_words).alias("chars_per_word"),
        )
        .filter(F.col("n_words") > 0)
    )


@query(
    "langid_heuristic",
    f"""
    WITH scored AS (
      SELECT lang,
             len(list_filter({_SQL_TOKENS}, t -> list_contains({STOP_EN}, t))) AS en_hits,
             len(list_filter({_SQL_TOKENS}, t -> list_contains({STOP_DE}, t))) AS de_hits,
             len(list_filter({_SQL_TOKENS}, t -> list_contains({STOP_FR}, t))) AS fr_hits
      FROM documents
    )
    SELECT lang,
           CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                WHEN de_hits >= fr_hits THEN 'de'
                ELSE 'fr' END AS predicted,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM scored GROUP BY 1, 2
    """,
)
def langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: stopword-hit language ID (the n-gram-heuristic family) —
    confusion counts of labeled vs predicted language."""
    docs = table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))

    def hits(words: list[str]):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    en, de, fr = hits(STOP_EN), hits(STOP_DE), hits(STOP_FR)
    predicted = (
        F.when((en >= de) & (en >= fr), "en").when(de >= fr, "de").otherwise("fr")
    )
    return (
        docs.select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "token_count_bpe",
    f"""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))) AS BIGINT)
             AS total_subtokens,
           {sql_davg(f"CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS DOUBLE)", 'avg_subtokens')}
    FROM documents GROUP BY lang
    """,
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: BPE-ish subtoken counting via a class-based regex (letter runs /
    digit runs / single symbols) — the cheap pre-tokenizer cost model."""
    docs = table(spark, sf_dir, "documents")
    n = F.regexp_count(F.lower("text"), F.lit(TOKEN_RE))
    return docs.groupBy("lang").agg(
        F.sum(n).cast("long").alias("total_subtokens"),
        davg(n.cast("double"), "avg_subtokens"),
    )


@query(
    "fingerprint_md5",
    """
    SELECT doc_id,
           md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def fingerprint_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/C1: canonical document fingerprint — md5 of whitespace-normalized
    lowercased text; engine-portable (identical string in DuckDB)."""
    docs = table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace("text", "[ \\t\\n\\f\\r]+", " "))
    return docs.select("doc_id", F.md5(F.encode(norm, "UTF-8")).alias("fp"))


# Rolling-hash parameters shared verbatim with the DuckDB oracle.  The
# Mersenne prime 2^31-1 keeps every (acc * BASE + codepoint) product under
# 2^41, inside BIGINT for DuckDB's list_reduce and int64 everywhere.
ROLL_MOD = (1 << 31) - 1
ROLL_BASE = 257


@query(
    "fingerprint_rolling",
    f"""
    SELECT doc_id,
           CASE WHEN length(lower(regexp_replace(text, '\\s+', ' ', 'g'))) = 0
                THEN CAST(0 AS BIGINT)
                ELSE list_reduce(
                  list_transform(
                    string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ''),
                    c -> CAST(ascii(c) AS BIGINT)),
                  (acc, x) -> (acc * {ROLL_BASE} + x) % {ROLL_MOD})
           END AS fp
    FROM documents
    """,
)
def fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: polynomial rolling-hash fingerprint as an Arrow-batched pandas
    UDF — the pattern for fingerprints Catalyst can't express natively.

    h = fold(codepoints, (acc, c) -> (acc*BASE + c) mod P) over the
    whitespace-normalized lowercased text.  The DuckDB oracle mirrors the
    identical fold via list_reduce (whose first-element seeding equals the
    zero-seeded fold, since h after one step is just c₁ mod P)."""
    import pandas as pd

    def _roll(texts):
        out = []
        for t in texts:
            h = 0
            for ch in t:
                h = (h * ROLL_BASE + ord(ch)) % ROLL_MOD
            out.append(h)
        return pd.Series(out, dtype="int64")

    roll = F.pandas_udf(_roll, "long")
    docs = table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace("text", "[ \\t\\n\\f\\r]+", " "))
    return docs.select("doc_id", roll(norm).alias("fp"))


@query(
    "pipeline_quality_filter",
    f"""
    WITH sig AS (
      SELECT doc_id, lang,
             len({_SQL_TOKENS}) AS n_words,
             CASE WHEN len({_SQL_TOKENS}) = 0 THEN 0.0
                  ELSE CAST(len(list_filter({_SQL_TOKENS},
                       t -> list_contains({STOP_EN}, t))) AS DOUBLE)
                       / len({_SQL_TOKENS}) END AS stop_ratio,
             CASE WHEN len({_SQL_TOKENS}) = 0 THEN 0.0
                  ELSE CAST(length(text) AS DOUBLE) / len({_SQL_TOKENS}) END
               AS chars_per_word
      FROM documents
    )
    SELECT lang,
           CASE WHEN n_words < 20 THEN 'too_short'
                WHEN stop_ratio > 0.5 THEN 'too_stoppy'
                WHEN chars_per_word < 3 OR chars_per_word > 12 THEN 'weird_words'
                ELSE 'keep' END AS verdict,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM sig GROUP BY 1, 2
    """,
)
def pipeline_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 pipeline: the keep/drop quality gate of a pretraining corpus —
    per-doc signals → first-failing-rule verdict → survival census per
    language.  Pure Catalyst; at 100 TB this is a single map + small agg,
    and the verdict column is what downstream sampling joins against."""
    docs = table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(w) for w in STOP_EN])
    n_words = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    stop_ratio = F.when(n_words == 0, 0.0).otherwise(
        n_stop.cast("double") / n_words
    )
    cpw = F.when(n_words == 0, 0.0).otherwise(
        F.length("text").cast("double") / n_words
    )
    verdict = (
        F.when(n_words < 20, "too_short")
        .when(stop_ratio > 0.5, "too_stoppy")
        .when((cpw < 3) | (cpw > 12), "weird_words")
        .otherwise("keep")
    )
    return (
        docs.select("lang", verdict.alias("verdict"))
        .groupBy("lang", "verdict")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "profile_table",
    """
    SELECT 'o_orderstatus' AS col,
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
           CAST(MIN(LENGTH(o_orderstatus)) AS BIGINT) AS min_len,
           CAST(MAX(LENGTH(o_orderstatus)) AS BIGINT) AS max_len
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(MIN(LENGTH(o_orderpriority)) AS BIGINT),
           CAST(MAX(LENGTH(o_orderpriority)) AS BIGINT)
    FROM orders
    """,
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling operator: per-column null counts, distinct counts,
    and length bounds — the pre-ingestion quality census every pipeline
    runs before training-data acceptance.  One pass per profiled column
    group via conditional aggregation; at 100 TB distinct counts swap to
    approx_count_distinct (exact here for the oracle)."""
    orders = table(spark, sf_dir, "orders")

    def prof(col: str) -> DataFrame:
        return orders.agg(
            F.lit(col).alias("col"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(F.length(col)).cast("long").alias("min_len"),
            F.max(F.length(col)).cast("long").alias("max_len"),
        )

    return prof("o_orderstatus").unionByName(prof("o_orderpriority"))


BPE_MERGES = 40
BPE_BATCH = 8  # merges learned per driver round-trip


def bpe_train(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = BPE_MERGES,
    batch_size: int = BPE_BATCH,
) -> DataFrame:
    """Distributed BPE tokenizer training: learn ``n_merges`` merge rules
    from the corpus, ``batch_size`` per driver round-trip.

    Scale shape: the corpus collapses FIRST to the (word, count)
    vocabulary (one shuffle, output is vocabulary-sized — thousands of
    rows per million docs, not corpus-sized); every iteration then runs
    on the vocabulary alone: explode weighted adjacent symbol pairs →
    ranked counts → greedily take the top ``batch_size`` pairwise
    symbol-disjoint pairs (the standard batched-BPE trick — disjoint
    merges are independent, so one vectorized pandas pass applies them
    all) → localCheckpoint to truncate lineage.  A 32k–100k-merge
    tokenizer therefore costs n_merges/batch_size driver round-trips,
    not n_merges.  ``batch_size=1`` reduces exactly to classic
    sequential BPE (top-1 by count, lexicographic ties), which the
    equivalence test pins.  Reported pair_count is the count at
    selection time (before the batch's other merges apply), matching
    sequential BPE for the batch head and approximating it for the
    rest."""
    import pandas as pd

    docs = table(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(F.split(F.lower(F.trim("text")), "[ \\t\\n\\f\\r]+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.split("w", "").alias("syms"), "n")
        # lazy: the first round's ranked-pairs collect materializes it —
        # an eager checkpoint here is one extra driver round-trip
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        pairs = vocab.select(
            "n",
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, F.greatest(F.size("syms") - 1, F.lit(0))),
                    F.slice("syms", 2, F.greatest(F.size("syms") - 1, F.lit(0))),
                    lambda a, b: F.concat_ws("\x00", a, b),
                )
            ).alias("pair"),
        )
        want = min(batch_size, n_merges - len(merges))
        # over-fetch so overlap skips can still fill the batch
        ranked = (
            pairs.groupBy("pair")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pair")
            .limit(max(want * 4, want))
            .collect()
        )
        batch: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for row in ranked:
            a, b = row["pair"].split("\x00")
            # symbol-disjointness guarantees simultaneous == sequential
            # application; overlapping candidates wait for a later round
            if a in used or b in used:
                continue
            batch.append((a, b, int(row["cnt"])))
            used.update((a, b))
            if len(batch) >= want:
                break
        if not batch:
            break
        for a, b, cnt in batch:
            merges.append((len(merges), a, b, cnt))
        merge_set = {(a, b) for a, b, _ in batch}

        def apply_merges(batches, merge_set=merge_set):
            for pdf in batches:
                out = []
                for syms in pdf["syms"]:
                    merged, i = [], 0
                    while i < len(syms):
                        if i + 1 < len(syms) and (syms[i], syms[i + 1]) in merge_set:
                            merged.append(syms[i] + syms[i + 1])
                            i += 2
                        else:
                            merged.append(syms[i])
                            i += 1
                    out.append(merged)
                yield pd.DataFrame({"syms": out, "n": pdf["n"]})

        # lazy checkpoint: still truncates lineage, but materializes
        # inside the NEXT round's ranked collect instead of as its own
        # job — halves the per-round job count, and the FINAL round's
        # never-consumed vocab pass is skipped outright
        vocab = vocab.mapInPandas(
            apply_merges, "syms array<string>, n long"
        ).localCheckpoint(eager=False)
    return literal_df(
        spark, merges, "step int, left string, right string, pair_count long"
    )


@query("bpe_train_merges")  # iterative algorithm → no SQL twin, rows-only
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: distributed BPE tokenizer training (see ``bpe_train``) —
    BPE_MERGES rules at BPE_BATCH per driver round-trip."""
    return bpe_train(spark, sf_dir)


SAMPLE_MOD = 10  # keep fp % SAMPLE_MOD == 0 → deterministic ~10% sample

_SQL_ROLL = f"""
    CASE WHEN length(lower(regexp_replace(text, '\\s+', ' ', 'g'))) = 0
         THEN CAST(0 AS BIGINT)
         ELSE list_reduce(
           list_transform(
             string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ''),
             c -> CAST(ascii(c) AS BIGINT)),
           (acc, x) -> (acc * {ROLL_BASE} + x) % {ROLL_MOD})
    END"""


@query(
    "sample_deterministic",
    f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           {sql_davg('CAST(n_chars AS DOUBLE)', 'avg_chars')}
    FROM documents
    WHERE ({_SQL_ROLL}) % {SAMPLE_MOD} = 0
    GROUP BY lang
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash deterministic sampling — the reproducible alternative
    to rand()-based sampling for training-data pipelines: membership
    depends only on the document text (same sample across engines, runs,
    and partitionings; survives repartition and re-ingestion, and a
    changed document changes cohort atomically).  Keep-set = rolling
    hash % SAMPLE_MOD == 0 (~10%), mirrored exactly by the DuckDB
    list_reduce twin, so the sample itself is oracle-verified — unlike
    `sampled_agg` (engine-specific RNG, rows-only)."""
    import pandas as pd

    def _roll(texts):
        out = []
        for t in texts:
            h = 0
            for ch in t:
                h = (h * ROLL_BASE + ord(ch)) % ROLL_MOD
            out.append(h)
        return pd.Series(out, dtype="int64")

    roll = F.pandas_udf(_roll, "long")
    docs = table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace("text", "[ \\t\\n\\f\\r]+", " "))
    return (
        docs.withColumn("fp", roll(norm))
        .filter(F.col("fp") % SAMPLE_MOD == 0)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            davg(F.col("n_chars").cast("double"), "avg_chars"),
        )
    )


# PII-ish patterns sharing semantics between Java regex (Spark) and RE2
# (DuckDB): email-like tokens and long digit runs (phone/SSN stand-ins).
PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PII_DIGITS = "[0-9]{6,}"


@query(
    "pii_redaction_stats",
    f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(lower(text), '{PII_EMAIL}'))) AS BIGINT)
             AS n_emails,
           CAST(SUM(len(regexp_extract_all(text, '{PII_DIGITS}'))) AS BIGINT)
             AS n_digit_runs,
           CAST(SUM(length(text)
                    - length(regexp_replace(regexp_replace(lower(text),
                        '{PII_EMAIL}', '<EMAIL>', 'g'),
                        '{PII_DIGITS}', '<NUM>', 'g'))) AS BIGINT)
             AS chars_removed
    FROM documents GROUP BY source
    """,
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing accounting — the redaction pass every
    training-corpus pipeline runs before release: count email-like and
    long-digit-run matches per source and the net character delta of
    replacing them with placeholder tokens.  Pure Catalyst regex
    (patterns chosen for identical Java-regex/RE2 semantics), one map +
    small agg; the redacted TEXT itself stays executor-side at scale,
    only the audit numbers aggregate."""
    docs = table(spark, sf_dir, "documents")
    lower = F.lower("text")
    redacted = F.regexp_replace(
        F.regexp_replace(lower, PII_EMAIL, "<EMAIL>"), PII_DIGITS, "<NUM>"
    )
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.regexp_count(lower, F.lit(PII_EMAIL))).cast("long").alias("n_emails"),
        F.sum(F.regexp_count(F.col("text"), F.lit(PII_DIGITS)))
        .cast("long")
        .alias("n_digit_runs"),
        F.sum(F.length("text") - F.length(redacted))
        .cast("long")
        .alias("chars_removed"),
    )


BENCHMARK_DOCS = 20  # doc_id < 20 act as the held-out benchmark set


@query(
    "decontaminate_ngram_overlap",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, list_distinct(list_transform(
          range(1, greatest(len(t) - 2, 1) + 1),
          i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles
      FROM toks
    ), inv AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh
    )
    SELECT c.doc_id,
           CAST(COUNT(DISTINCT c.s) AS BIGINT) AS n_shared_shingles
    FROM inv c JOIN inv b ON c.s = b.s
    WHERE c.doc_id >= {BENCHMARK_DOCS} AND b.doc_id < {BENCHMARK_DOCS}
    GROUP BY c.doc_id
    HAVING COUNT(DISTINCT c.s) >= 3
    """,
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — flag corpus documents sharing >= 3
    distinct word-3-grams with the held-out set (doc_id < BENCHMARK_DOCS
    stands in for an eval benchmark).  The benchmark inverted index is
    tiny and broadcast, so the corpus is scanned once with no shuffle
    before the per-doc count — the exact shape of an eval-contamination
    sweep over a 100 TB pretraining corpus.  Oracle: the same
    inverted-index join in DuckDB."""
    from daskberg_spark.operators.dedup import shingle_arrays

    docs = table(spark, sf_dir, "documents")
    # measured: NOT checkpointing wins here — the benchmark branch
    # re-derives shingles for only BENCHMARK_DOCS rows after pushdown,
    # cheaper than materializing the whole corpus index
    sh = shingle_arrays(docs)
    inv = sh.select("doc_id", F.explode("shingles").alias("s"))
    bench = (
        inv.filter(F.col("doc_id") < BENCHMARK_DOCS)
        .select(F.col("s").alias("bs"))
        .distinct()
    )
    corpus = inv.filter(F.col("doc_id") >= BENCHMARK_DOCS)
    # shingle_arrays applies array_distinct, so (doc_id, s) pairs are
    # already unique and the semi-join keeps each at most once:
    # COUNT(s) == COUNT(DISTINCT s) per document — the plain count
    # skips the keyed-distinct aggregate phase (one exchange + dedup
    # pass over every surviving pair)
    return (
        corpus.join(F.broadcast(bench), corpus.s == bench.bs, "left_semi")
        .groupBy("doc_id")
        .agg(F.count("s").alias("n_shared_shingles"))
        .filter(F.col("n_shared_shingles") >= 3)
    )


@query(
    "corpus_mixing_weights",
    f"""
    WITH grp AS (
      SELECT lang, source,
             CAST(SUM(len({_SQL_TOKENS})) AS BIGINT) AS group_tokens
      FROM documents GROUP BY lang, source
    ), tot AS (
      SELECT CAST(SUM(group_tokens) AS BIGINT) AS total_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_groups
      FROM grp
    )
    SELECT lang, source, group_tokens,
           CAST(group_tokens AS DOUBLE) / total_tokens AS actual_share,
           (CAST(total_tokens AS DOUBLE) / n_groups) / group_tokens
             AS sample_weight
    FROM grp, tot
    """,
)
def corpus_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing weights — the reweighting step of training-data
    curation: per (lang, source) token counts, each group's share of the
    corpus, and the per-document sampling weight that would equalize the
    mixture (uniform target; any target vector is the same arithmetic).
    One corpus pass + a 1-row broadcast total, so the plan is the Q11/Q22
    scalar-subquery shape; downstream samplers join these weights by
    (lang, source)."""
    docs = table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    grp = (
        docs.withColumn("n_tokens", F.size(toks))
        .groupBy("lang", "source")
        .agg(F.sum("n_tokens").cast("long").alias("group_tokens"))
    )
    tot = grp.agg(
        F.sum("group_tokens").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
    )
    return grp.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "group_tokens",
        (F.col("group_tokens").cast("double") / F.col("total_tokens")).alias(
            "actual_share"
        ),
        (
            (F.col("total_tokens").cast("double") / F.col("n_groups"))
            / F.col("group_tokens")
        ).alias("sample_weight"),
    )


@query(
    "tokenizer_fertility",
    f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
           CAST(SUM(len({_SQL_TOKENS})) AS BIGINT) AS total_tokens,
           CAST(SUM(strlen(text)) AS DOUBLE)
             / SUM(len({_SQL_TOKENS})) AS bytes_per_token
    FROM documents
    GROUP BY lang
    """,
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: tokenizer fertility per language — UTF-8 BYTES per token
    (octet_length, not chars: CJK/diacritic languages cost more bytes
    per token, which is what sizes token budgets and flags when a
    tokenizer underserves a language).  The ratio divides two exact
    integer sums, so it is order-independent and engine-exact.  One
    narrow scan + one hash agg keyed by language — O(langs) rows."""
    docs = table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        F.octet_length("text").alias("n_bytes"),
        F.size(_tokens(F.col("text"))).alias("n_tokens"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (
            F.sum("n_bytes").cast("double") / F.sum("n_tokens")
        ).alias("bytes_per_token"),
    )


@query(
    "gopher_repetition_filters",
    f"""
    WITH t AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS total_chars,
             {_SQL_TOKENS} AS toks
      FROM documents
      WHERE len({_SQL_TOKENS}) > 0
    ),
    grams AS (
      SELECT doc_id, total_chars,
             list_transform(
               generate_series(1, greatest(len(toks) - 1, 0)),
               i -> toks[i] || ' ' || toks[i + 1]) AS bi,
             list_transform(
               generate_series(1, greatest(len(toks) - 4, 0)),
               i -> array_to_string(toks[i:i+4], ' ')) AS five
      FROM t
    ),
    bc AS (
      SELECT doc_id, g, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(bi) AS g FROM grams)
      GROUP BY 1, 2
    ),
    btop AS (
      SELECT doc_id, MAX(c * length(g)) AS top2_chars FROM bc GROUP BY 1
    ),
    fc AS (
      SELECT doc_id, g, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(five) AS g FROM grams)
      GROUP BY 1, 2
    ),
    fdup AS (
      SELECT doc_id,
             COALESCE(SUM(CASE WHEN c >= 2 THEN c * length(g) END), 0)
               AS dup5_chars
      FROM fc GROUP BY 1
    ),
    rowstats AS (
      SELECT doc_id, total_chars,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(len(list_filter(toks,
                   w -> regexp_matches(w, '[a-zA-Z]'))) AS DOUBLE)
               / len(toks) AS alpha_frac,
             CAST(list_sum(list_transform(toks, w -> length(w)))
                  AS DOUBLE) / len(toks) AS mean_word_len,
             (CAST(length(text) - length(replace(text, '#', ''))
                   AS DOUBLE)
              + (length(text) - length(replace(text, '...', ''))) / 3
             ) / len(toks) AS symbol_ratio
      FROM documents JOIN t USING (doc_id)
    )
    SELECT r.doc_id AS doc_id,
           r.n_words AS n_words,
           CAST(COALESCE(b.top2_chars, 0) AS DOUBLE) / r.total_chars
             AS top2_frac,
           CAST(COALESCE(f.dup5_chars, 0) AS DOUBLE) / r.total_chars
             AS dup5_frac,
           r.alpha_frac AS alpha_frac,
           r.mean_word_len AS mean_word_len,
           CAST(
             CAST(COALESCE(b.top2_chars, 0) AS DOUBLE) / r.total_chars
               <= 0.20
             AND CAST(COALESCE(f.dup5_chars, 0) AS DOUBLE) / r.total_chars
               <= 0.15
             AND r.alpha_frac >= 0.80
             AND r.mean_word_len BETWEEN 3 AND 10
             AND r.symbol_ratio <= 0.10
           AS BOOLEAN) AS passes
    FROM rowstats r
    LEFT JOIN btop b ON r.doc_id = b.doc_id
    LEFT JOIN fdup f ON r.doc_id = f.doc_id
    """,
)
def gopher_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: Gopher-style repetition/quality filters (Rae et al. 2021,
    Appendix A — the public pretraining-filter recipe): per document,
    the character fraction covered by the single heaviest word BIGRAM
    (``count * chars / total_chars`` — the max-coverage formulation is
    deterministic under count ties where "the most common gram" is
    not), the character fraction in DUPLICATED 5-grams (count >= 2,
    all occurrences, the standard public implementation), the
    alphabetic-word fraction, mean word length, and a symbol-to-word
    ratio ('#' and '...'), folded into one ``passes`` flag with the
    paper's thresholds.

    Scale: the n-gram legs are explode → two-level hash agg keyed by
    (doc_id, gram) then doc_id — combiner-friendly, no skew beyond
    document length, never a self-join; the scalar leg is a pure
    row-local map.  At 100 TB this is the shape repetition filtering
    actually runs as."""
    docs = table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    # text rides along for the row-local scalar leg below — the former
    # ``docs.join(base, "doc_id")`` self-join existed only to reattach
    # it (an exchange per side for a column the scan already had)
    base = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("total_chars"),
        toks.alias("toks"),
        "text",
    ).filter(F.size("toks") > 0)
    # posexplode the TOKEN ARRAY (an attribute, not a computed array):
    # `explode(transform(sequence(...), ...))` lets Catalyst collapse
    # the projection INTO the generator, re-evaluating the whole O(n)
    # gram-array expression for EVERY output row — O(n²) per document,
    # measured 6.1 s → 0.46 s at sf0.1 for the bigram leg alone.  With
    # posexplode each gram builds O(1) from the carried array AFTER
    # generation, so the leg is O(n) per document at any length.
    pos = base.select(
        "doc_id", "toks", F.posexplode("toks").alias("i", "_t")
    )
    # Two independent gram legs (bigram coverage, duplicated 5-grams).
    # A fused single-pass variant (each position emitting (width, gram)
    # structs into one (doc_id, w, g) aggregation) was tried in r15 and
    # MEASURED 1.88× SLOWER (interleaved isolated A/B, 3 rounds × 3
    # reps): the per-position struct-array build + higher-order filter
    # in the generator costs more than the saved aggregate phase, and
    # the two narrow legs pipeline concurrently inside one job anyway.
    btop = (
        pos.where(F.col("i") >= 1)
        .select(
            "doc_id",
            F.expr("concat(toks[i - 1], ' ', toks[i])").alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max(F.col("c") * F.length("g")).alias("top2_chars"))
    )
    fdup = (
        pos.where(F.col("i") >= 4)
        # 5-gram ENDING at 0-based i = 1-based slice start i - 3
        .select(
            "doc_id",
            F.expr("array_join(slice(toks, i - 3, 5), ' ')").alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("c") >= 2, F.col("c") * F.length("g"))
                ),
                F.lit(0),
            ).alias("dup5_chars")
        )
    )
    n_words = F.size("toks")
    alpha_frac = (
        F.size(F.filter(F.col("toks"), lambda w: w.rlike("[a-zA-Z]")))
        .cast("double")
        / n_words
    )
    mean_word_len = (
        F.aggregate(
            F.col("toks"), F.lit(0).cast("long"), lambda a, w: a + F.length(w)
        ).cast("double")
        / n_words
    )
    docs_t = base
    hashes = F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))
    dots = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit("...")))
    ) / 3
    symbol_ratio = (hashes.cast("double") + dots) / n_words
    rowstats = docs_t.select(
        "doc_id",
        "total_chars",
        n_words.cast("long").alias("n_words"),
        alpha_frac.alias("alpha_frac"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
    )
    out = (
        rowstats.join(btop, "doc_id", "left")
        .join(fdup, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            (
                F.coalesce(F.col("top2_chars"), F.lit(0)).cast("double")
                / F.col("total_chars")
            ).alias("top2_frac"),
            (
                F.coalesce(F.col("dup5_chars"), F.lit(0)).cast("double")
                / F.col("total_chars")
            ).alias("dup5_frac"),
            "alpha_frac",
            "mean_word_len",
            "symbol_ratio",
        )
    )
    return out.select(
        "doc_id",
        "n_words",
        "top2_frac",
        "dup5_frac",
        "alpha_frac",
        "mean_word_len",
        (
            (F.col("top2_frac") <= 0.20)
            & (F.col("dup5_frac") <= 0.15)
            & (F.col("alpha_frac") >= 0.80)
            & F.col("mean_word_len").between(3, 10)
            & (F.col("symbol_ratio") <= 0.10)
        ).alias("passes"),
    )


# BM25 parameters (Robertson et al.; public): k1 saturates term
# frequency, b scales length normalization
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ["dup", "vector", "spark"]


def _sql_bm25_term(term: str) -> str:
    tf = f"CAST(len(list_filter(toks, x -> x = '{term}')) AS DOUBLE)"
    idf = (
        f"(CAST(n_docs AS DOUBLE) - df_{term} + 0.5) / (df_{term} + 0.5)"
    )
    return (
        f"{idf} * ({tf} * 2.2)"
        f" / ({tf} + 1.2 * (0.25 + 0.75 * (dl / avgdl)))"
    )


@query(
    "keyword_rank_bm25",
    f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks,
             CAST(len({_SQL_TOKENS}) AS DOUBLE) AS dl
      FROM documents
      WHERE len({_SQL_TOKENS}) > 0
    ),
    g AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
             {", ".join(
                 f"CAST(SUM(CASE WHEN len(list_filter(toks, x -> x = '{m}'))"
                 f" > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{m}"
                 for m in _BM25_TERMS
             )}
      FROM t
    )
    SELECT doc_id,
           (({_sql_bm25_term('dup')} + {_sql_bm25_term('vector')})
             + {_sql_bm25_term('spark')}) AS score
    FROM t, g
    WHERE (({_sql_bm25_term('dup')} + {_sql_bm25_term('vector')})
             + {_sql_bm25_term('spark')}) > 0
    ORDER BY score DESC, doc_id
    LIMIT 10
    """,
)
def keyword_rank_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: BM25 keyword ranking (Robertson/Sparck Jones, the public
    Okapi formula) for a fixed 3-term query — tf saturation (k1=1.2),
    document-length normalization (b=0.75), and a LOG-FREE rational
    idf ``(N - df + 0.5)/(df + 0.5)``: every operation is an IEEE
    +,*,/ over exact integer inputs evaluated in the identical tree
    shape on both engines, so the scores (and therefore the top-10)
    are bit-deterministic — the classic ``ln`` idf differs between
    libm implementations in the last ulp and would make an exact
    oracle flaky by construction.  Rare terms still dominate (the
    rational idf is a monotone transform of the classic one per term).

    Scale: ONE narrow scan computes per-document tf/dl row-locally,
    one single-row global aggregate (N, avgdl, per-term df) broadcasts
    back, and the top-k is a TakeOrdered — no shuffle beyond the
    1-row aggregate, no explode, no join keyed on data."""
    docs = table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))

    def _tf(m: str) -> F.Column:
        # NB: the HOF lambda must take exactly ONE parameter — a second
        # positional (even a defaulted one) makes Spark pass the element
        # INDEX into it
        return F.size(
            F.filter(toks, lambda x: x == F.lit(m))
        ).cast("double")

    # ONE corpus tokenization pass: per-document (dl, tf per query term)
    # is computed row-locally and checkpointed as a 5-column numeric
    # frame, so the global aggregate (N, avgdl, df) and the scored pass
    # both read the tiny materialized frame — the former shape
    # re-tokenized the corpus and re-ran the three array filters for
    # each side (guide §2.3: aggregate/reduce before you re-use).
    base = (
        docs.select(
            "doc_id",
            F.size(toks).cast("double").alias("dl"),
            *[_tf(m).alias(f"tf_{i}") for i, m in enumerate(_BM25_TERMS)],
        )
        .filter(F.col("dl") > 0)
        .localCheckpoint()
    )
    tf = {
        m: F.col(f"tf_{i}") for i, m in enumerate(_BM25_TERMS)
    }
    glob = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((tf[m] > 0).cast("int")).cast("double").alias(f"df_{m}")
            for m in _BM25_TERMS
        ],
    )
    scored = base.crossJoin(F.broadcast(glob))

    def term_score(m: str) -> F.Column:
        idf = (
            F.col("n_docs").cast("double") - F.col(f"df_{m}") + F.lit(0.5)
        ) / (F.col(f"df_{m}") + F.lit(0.5))
        t = tf[m]
        return (
            idf
            * (t * F.lit(2.2))
            / (
                t
                + F.lit(1.2)
                * (
                    F.lit(0.25)
                    + F.lit(0.75) * (F.col("dl") / F.col("avgdl"))
                )
            )
        )

    score = (
        term_score(_BM25_TERMS[0]) + term_score(_BM25_TERMS[1])
    ) + term_score(_BM25_TERMS[2])
    return (
        scored.select("doc_id", score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )
