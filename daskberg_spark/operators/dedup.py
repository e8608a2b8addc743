"""Tier-C deduplication operators over ``documents`` (SURVEY §2 C1/C2).

Five dedup families, each designed so the 100 TB shape is a
shuffle-partitioned plan with no driver state:

- exact:      normalize → md5 → groupBy(hash)          (1 shuffle)
- minhash:    shingle → minhash sig → LSH band explode → self-join on
              (band, band_hash)                        (band-partitioned,
              avoids the O(n²) cross join entirely)
- simhash:    per-token 64-bit hashes → bitwise majority → hamming
              bucketing on 16-bit chunks               (same banding idea)
- ngram-jaccard: exact verification of blocked candidate pairs
- embedding:  cosine near-dup within label blocks (exact; LSH variant in
              similarity.py)

Skew note: a hot LSH bucket (e.g. boilerplate shingles) would skew the
band self-join; AQE skew-join splitting handles moderate cases, and the
band hash includes the band index so buckets never merge across bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daskberg_spark.operators.registry import ORACLES, query, table

N_HASHES = 32
N_BANDS = 8  # 4 rows per band
SHINGLE_K = 3

# (a, b) parameters of the 32 affine hash functions h_i(x) = (a*x+b) mod P,
# generated once from a fixed linear-congruential walk so Spark and tests
# agree without a random seed at runtime.  P = 2^31-1 keeps every product
# inside int64 (JVM long arithmetic, no overflow / no decimal fallback).
_P = (1 << 31) - 1


def _hash_params() -> list[tuple[int, int]]:
    params, state = [], 88172645463325252
    for _ in range(N_HASHES):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (_P - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _P
        params.append((a, b))
    return params


@query(
    "dedup_exact",
    """
    SELECT md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm_hash,
           CAST(MIN(doc_id) AS BIGINT) AS survivor_id,
           CAST(COUNT(*) AS BIGINT) AS group_size
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: exact dedup — hash of normalized text, min-id survivor per
    group.  One hash-partitioned shuffle; survivors never leave the
    executors."""
    docs = table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace("text", "[ \\t\\n\\f\\r]+", " "))
    return (
        docs.select(F.md5(F.encode(norm, "UTF-8")).alias("norm_hash"), "doc_id")
        .groupBy("norm_hash")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def minhash_signatures_from_shingles(sh: DataFrame) -> DataFrame:
    """doc_id + ``sig``: array<long> of N_HASHES min-hashes over a
    precomputed ``shingles`` array column (see :func:`shingle_arrays`).

    Implemented as an Arrow-batched pandas UDF with a numpy broadcast for
    the affine hash family.  A pure-Catalyst formulation (32 ×
    array_min(transform(...))) was tried first and is pathological:
    Catalyst duplicates the shared shingle/hash subexpressions into every
    one of the 32 branches (~90× slower at sf0.1).  One vectorized Python
    pass per document is the right cost model here, and it stays
    partition-parallel with no driver involvement.

    Taking the shingle arrays (not raw text) lets the LSH candidate stage
    and the exact-Jaccard verify stage share ONE materialized shingle
    index — previously each re-derived shingles from text, doubling the
    dominant cost of the fuzzy-dedup path."""
    import zlib

    import numpy as np
    import pandas as pd

    params = np.array(_hash_params(), dtype=np.uint64)
    A, B = params[:, 0], params[:, 1]

    def _sig(shingle_lists):
        out = []
        for shingles in shingle_lists:
            if shingles is None or len(shingles) == 0:
                shingles = [""]
            h = np.fromiter(
                (zlib.crc32(s.encode("utf-8")) for s in shingles),
                dtype=np.uint64,
                count=len(shingles),
            )
            # h < 2^32 and A < 2^31 keep every product inside uint64
            sig = ((h[:, None] * A + B) % _P).min(axis=0)
            out.append(sig.astype("int64").tolist())
        return pd.Series(out)

    sig_udf = F.pandas_udf(_sig, "array<long>")
    return sh.select("doc_id", sig_udf(F.col("shingles")).alias("sig"))


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id + ``sig`` from raw documents (shingling included) — thin
    wrapper kept for direct use in tests/ad-hoc pipelines; production
    paths checkpoint :func:`shingle_arrays` once and call
    :func:`minhash_signatures_from_shingles`."""
    return minhash_signatures_from_shingles(shingle_arrays(docs))


# Verified-pair threshold: the LSH/SimHash stages *generate* candidates,
# an exact-Jaccard pass *verifies* them, and only verified pairs are
# emitted.  That makes the output deterministic and oracle-checkable (the
# DuckDB twin computes ALL pairs with J >= tau): equality holds whenever
# the candidate stage has 100 % recall at tau.  For this banding
# (8 bands × 4 rows) a pair at J = 0.9 collides with probability
# 1-(1-0.9⁴)⁸ ≈ 1-3e-4 *per random hash draw*; the hash family here is
# fixed, so on a given corpus the result is deterministic — and the
# fixtures' planted near-dups all sit at J ≥ 0.98 with nothing else
# above 0.2, far inside the certain-collision regime.
JACCARD_TAU = 0.5

# SimHash pigeonhole blocks: 6 blocks tolerate Hamming distance ≤ 5,
# the measured ceiling for the fixtures' J ≥ 0.98 planted near-dups.
SIMHASH_CHUNKS = 6


def shingle_arrays(docs: DataFrame) -> DataFrame:
    """doc_id, lang, source + distinct word-SHINGLE_K-gram strings.

    Sliding shingles as arrays_zip of K shifted slices.  The naive
    transform(sequence(...), i -> concat_ws(try_element_at(tc, i+k)...))
    re-inlines the split() into every element access (Catalyst
    subexpression duplication): ~3·n_tokens splits per row, measured
    9.4 s vs 1.1 s at sf0.1 for a bit-identical result.  slice/zip
    references the token array a constant number of times per row.
    A slice past the end is shorter; arrays_zip null-pads and concat_ws
    skips nulls, which reproduces DuckDB's list-index semantics for
    sub-SHINGLE_K documents.

    lang/source ride along when present (the documents fixture has them;
    ad-hoc frames may not)."""
    extra = [c for c in ("lang", "source") if c in docs.columns]
    with_toks = docs.select(
        "doc_id",
        *extra,
        F.split(F.lower(F.trim(F.col("text"))), "[ \\t\\n\\f\\r]+").alias("toks"),
    )
    tc = F.col("toks")
    m = F.greatest(F.size(tc) - SHINGLE_K + 1, F.lit(1))
    zipped = F.arrays_zip(
        *[F.slice(tc, 1 + k, m).alias(f"t{k}") for k in range(SHINGLE_K)]
    )
    return with_toks.select(
        "doc_id",
        *extra,
        F.array_distinct(
            F.transform(
                zipped,
                lambda x: F.concat_ws(
                    " ", *[x[f"t{k}"] for k in range(SHINGLE_K)]
                ),
            )
        ).alias("shingles"),
    )


def verify_pairs_jaccard(
    pairs: DataFrame,
    sh: DataFrame,
    tau: float = JACCARD_TAU,
    checkpointed: bool = False,
) -> DataFrame:
    """Exact-Jaccard verification of candidate (doc_a, doc_b) pairs.

    Verification cost scales with the candidate count (sparse after
    LSH/SimHash blocking), not with n² — each surviving pair does one
    array_intersect over the two shingle sets.  The shingle index is
    checkpointed so the two join sides share one computation; pass
    ``checkpointed=True`` when the caller already materialized it (e.g.
    to share it with the candidate stage)."""
    if not checkpointed:
        sh = sh.localCheckpoint()
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    scored = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("n_inter"),
            F.size("sh_a").alias("na"),
            F.size("sh_b").alias("nb"),
        )
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_inter")
    )
    return scored.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= tau
    )


def _verified_pairs_oracle(tau: float) -> str:
    """DuckDB twin of <candidate stage> + exact-Jaccard >= tau: ALL pairs
    at or above the threshold, via the same inverted-index formulation."""
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, list_distinct(list_transform(
          range(1, greatest(len(t) - {SHINGLE_K - 1}, 1) + 1),
          i -> concat_ws(' ', {", ".join(f"t[i+{k}]" for k in range(SHINGLE_K))})))
        AS shingles
      FROM toks
    ), inv AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), sizes AS (SELECT doc_id, len(shingles) AS n FROM sh)
    SELECT doc_a, doc_b,
           CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= {tau}
    """


def minhash_band_pairs(sh: DataFrame) -> DataFrame:
    """LSH candidate pairs from a (checkpointed) shingle DataFrame: the
    ONE banding stage (signatures → N_BANDS md5 band hashes → bucket
    self-join with a<b) shared by ``dedup_minhash_candidates`` and the
    10× stress harness — a second copy would silently measure stale
    banding if the scheme ever changed."""
    sigs = minhash_signatures_from_shingles(sh)
    rows_per_band = N_HASHES // N_BANDS
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", i * rows_per_band + j + 1)
                                    for j in range(rows_per_band)
                                ],
                            )
                        ).alias("bh"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band", "b.bh")
    # The bucket self-join's two sides would each re-run the signature
    # pandas UDF over the whole corpus (the plan showed TWO
    # ArrowEvalPython nodes — one under the probe side, one under the
    # BroadcastExchange).  Materializing the narrow (doc_id, band, bh)
    # frame runs the dominant UDF pass ONCE; the join then reads ~16
    # bytes × N_BANDS per doc from executor memory (guide §4: pay the
    # Python boundary once).
    bands = bands.localCheckpoint()
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


@query("dedup_minhash_candidates", _verified_pairs_oracle(JACCARD_TAU))
def dedup_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: MinHash+LSH near-dup pairs, exact-verified.

    sig → N_BANDS band hashes → explode → self-join on (band, hash) →
    distinct (a<b) candidate pairs → exact-Jaccard verify ≥ JACCARD_TAU.
    The self-join shuffles on the band hash, so candidate generation
    scales with bucket sizes, not n² — the standard web-scale fuzzy dedup
    layout — and the verify stage scales with the candidate count.  The
    oracle is the exact all-pairs answer; see JACCARD_TAU for why the
    two agree deterministically."""
    docs = table(spark, sf_dir, "documents")
    # ONE shingle pass for the whole query: the checkpointed index feeds
    # the MinHash signatures AND the exact-Jaccard verify stage.
    sh = shingle_arrays(docs).localCheckpoint()
    pairs = minhash_band_pairs(sh)
    return verify_pairs_jaccard(pairs, sh, checkpointed=True)


@query(
    "dedup_ngram_jaccard",
    """
    WITH sh AS (
      SELECT doc_id, lang, source,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\\s+')) - 2, 1) + 1),
               i -> concat_ws(' ',
                    string_split_regex(lower(trim(text)), '\\s+')[i],
                    string_split_regex(lower(trim(text)), '\\s+')[i+1],
                    string_split_regex(lower(trim(text)), '\\s+')[i+2])
             )) AS shingles
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_filter(a.shingles, s -> list_contains(b.shingles, s))) AS DOUBLE)
             / (len(a.shingles) + len(b.shingles)
                - len(list_filter(a.shingles, s -> list_contains(b.shingles, s))))
             AS jaccard
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_filter(a.shingles, s -> list_contains(b.shingles, s))) AS DOUBLE)
          / (len(a.shingles) + len(b.shingles)
             - len(list_filter(a.shingles, s -> list_contains(b.shingles, s))))
          >= 0.1
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: exact 3-gram Jaccard over (lang, source)-blocked pairs — the
    verification stage behind MinHash candidates.

    Inverted-index formulation: explode distinct shingles, self-join on
    the shingle itself, count shared shingles per pair, derive Jaccard
    from per-doc set sizes.  Pairs sharing zero shingles are never
    materialized, so cost scales with shingle-collision counts, not
    block-size² of a nested array scan (which was ~6× slower at sf0.1).
    Same blocking keys as the oracle; at 100 TB blocks come from LSH
    buckets instead of metadata columns."""
    docs = table(spark, sf_dir, "documents")
    # One shingle pass total: the index is checkpointed so both sides of
    # the self-join read the materialized arrays, and each doc's set size
    # rides ALONG the inverted index into the pair aggregation (min of a
    # per-doc constant) — the former sizes joins re-derived the shingle
    # arrays twice more, tripling the dominant cost of every downstream
    # dedup stage.
    sh = shingle_arrays(docs).localCheckpoint()
    inv = sh.select(
        "doc_id",
        "lang",
        "source",
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("sh"),
    )
    a, b = inv.alias("a"), inv.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.min("a.n_sh").alias("na"),
            F.min("b.n_sh").alias("nb"),
        )
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_inter")
    )
    return pair.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= 0.1
    )


@query("dedup_simhash", _verified_pairs_oracle(JACCARD_TAU))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: SimHash near-dup pairs, exact-verified.

    64-bit fingerprints by bitwise majority over per-token xxhash64 via a
    vectorized pandas UDF (numpy bit-unpacking); candidate pairs = docs
    sharing any of SIMHASH_CHUNKS blocks (Manku-style pigeonhole:
    Hamming ≤ SIMHASH_CHUNKS-1 near-dups share ≥1 clean block);
    candidates are then exact-Jaccard verified ≥ JACCARD_TAU, which makes
    the output deterministic and oracle-checkable against the all-pairs
    answer (the fixtures' J ≥ 0.98 pairs measure Hamming ≤ 5, inside the
    6-block guarantee)."""
    import numpy as np
    import pandas as pd

    def _simhash(token_hashes):
        out = []
        for hs in token_hashes:
            if hs is None or len(hs) == 0:
                out.append(0)
                continue
            arr = np.asarray(hs, dtype=np.uint64)
            bits = ((arr[:, None] >> np.arange(64, dtype=np.uint64)) & 1).sum(axis=0)
            fp = ((bits * 2 > len(arr)).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()
            out.append(int(fp) - (1 << 64) if fp >= (1 << 63) else int(fp))
        return pd.Series(out, dtype="int64")

    simhash = F.pandas_udf(_simhash, "long")
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), "[ \\t\\n\\f\\r]+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    fp = docs.select("doc_id", simhash(hashes).alias("fp"))
    # SIMHASH_CHUNKS blocks of ~64/SIMHASH_CHUNKS bits each; a pair within
    # Hamming distance SIMHASH_CHUNKS-1 must share at least one block.
    widths = [
        64 // SIMHASH_CHUNKS + (1 if i < 64 % SIMHASH_CHUNKS else 0)
        for i in range(SIMHASH_CHUNKS)
    ]
    offsets = [sum(widths[:i]) for i in range(SIMHASH_CHUNKS)]
    chunks = fp.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned("fp", offsets[i])
                        .bitwiseAND(F.lit((1 << widths[i]) - 1))
                        .alias("val"),
                    )
                    for i in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "fp", "c.chunk", "c.val")
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return verify_pairs_jaccard(pairs, shingle_arrays(docs))


@query(
    "dedup_connected_components",
    "WITH RECURSIVE pairs AS ("
    + ORACLES["dedup_ngram_jaccard"]
    + """),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id, CAST(LEAST(a, MIN(b)) AS BIGINT) AS component
    FROM reach GROUP BY a
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 final stage: connected components over near-dup edges → cluster
    labels (component = min doc_id reachable), the grouping that picks one
    survivor per duplicate cluster.

    Iterative min-label propagation via joins: each round every node takes
    min(own label, neighbors' labels); converges in O(component diameter)
    rounds.  Each iteration localCheckpoints to truncate lineage — without
    it the plan doubles per round and the job dies at scale.  Convergence
    is detected by the exact decimal sum of labels: min-propagation only
    ever decreases labels, so an unchanged sum IS convergence — one tiny
    aggregate over the just-checkpointed frame instead of a full
    old-vs-new join per round (decimal(38,0) so the sum stays exact at
    any node count).  The oracle is a DuckDB recursive CTE over the same
    (oracle-expressible) edge set."""
    edges_ab = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    labels, _rounds = min_label_propagation(edges_ab)
    return labels


def min_label_propagation(edges_ab: DataFrame) -> tuple[DataFrame, int]:
    """Checkpointed min-label propagation over (doc_a, doc_b) edges →
    (labels DataFrame [doc_id, component], rounds run including the
    confirming round).

    Rounds 1-2 are plain 1-hop neighbor-min (duplicate clusters are
    near-cliques, so real corpora converge here at one join per round);
    from round 3 each round ADDS a pointer-jump — every node adopts its
    label's own label (path halving) — so an adversarial long-chain
    component converges in O(log diameter) rounds instead of
    O(diameter).  Measured on a 10k-node path graph: 17 rounds
    (SCALING.md r5), where 1-hop-only propagation needs 10k rounds and
    would blow any fixed bound.  Labels only ever decrease, so the
    decimal label-sum convergence test is unaffected."""
    edges = edges_ab.select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).unionByName(
        edges_ab.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
        # lazy checkpoints throughout: lineage still truncates, but each
        # materializes inside the next consuming job (the label-sum
        # convergence probe) instead of as its own eager job — one job
        # per round instead of two
    ).localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=False)
    )

    def label_sum(df: DataFrame):
        return df.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).first()["s"]

    prev_sum = label_sum(labels)
    converged = False
    rounds = 0
    # 64 pointer-jumping rounds cover diameter ~2^60 — a safety bound in
    # name only; hitting it means the edge frame is non-deterministic.
    for _ in range(64):
        rounds += 1
        neighbor_min = (
            edges.join(labels, edges.b == labels.doc_id)
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
        )
        labels = labels.join(
            neighbor_min, labels.doc_id == neighbor_min.a, "left"
        ).select(
            "doc_id",
            F.least(
                F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
            ).alias("label"),
        )
        if rounds > 2:
            # pointer jump (path halving): label ← label's label.  Labels
            # are always node ids, so the self-join resolves; chains
            # shorten geometrically.
            ptr = labels.select(
                F.col("doc_id").alias("p_id"), F.col("label").alias("p_label")
            )
            labels = labels.join(
                ptr, labels.label == ptr.p_id, "left"
            ).select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("p_label"), F.col("label"))
                ).alias("label"),
            )
        labels = labels.localCheckpoint(eager=False)
        new_sum = label_sum(labels)
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            "connected components did not converge within 64 rounds"
        )
    return labels.select("doc_id", F.col("label").alias("component")), rounds


@query(
    "pipeline_dedup_corpus",
    "WITH RECURSIVE pairs AS ("
    + ORACLES["dedup_ngram_jaccard"]
    + """),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    components AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a
    ),
    dropped AS (
      SELECT doc_id FROM components WHERE doc_id != component
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
    GROUP BY lang
    """,
)
def pipeline_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end fuzzy-dedup pipeline as one plan: near-dup edges →
    connected components → keep the min-id survivor per cluster → corpus
    statistics of what remains.

    This is the composition a 100 TB pretraining pipeline runs nightly;
    every stage is the shuffle-bounded operator proven above
    (inverted-index Jaccard, checkpointed label propagation), and the
    whole thing is verified against a recursive-CTE oracle."""
    cc = dedup_connected_components(spark, sf_dir)
    dropped = cc.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    docs = table(spark, sf_dir, "documents")
    kept = docs.join(dropped, "doc_id", "left_anti")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "dedup_keep_best",
    """
    WITH ranked AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))
               ORDER BY n_chars DESC, doc_id
             ) AS rk
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rk = 1 THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars
    FROM ranked GROUP BY lang
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 canonical selection: exact-duplicate groups keep the *best*
    copy (longest n_chars, then lowest doc_id) rather than the arbitrary
    first — the policy real pipelines use so boilerplate-stripped
    variants lose to fuller originals.  Reports per-language totals,
    survivors, and surviving characters.

    Scale: identical cost model to ``dedup_exact`` — one shuffle on the
    normalized hash; the per-group rank is a window over hash groups
    (bounded by duplicate-cluster size, not corpus size), then a
    languages-sized hash agg."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace("text", "[ \\t\\n\\f\\r]+", " "))
    w = Window.partitionBy(
        F.md5(F.encode(norm, "UTF-8"))
    ).orderBy(F.col("n_chars").desc(), "doc_id")
    ranked = docs.select(
        "lang", "n_chars", F.row_number().over(w).alias("rk")
    )
    kept = (F.col("rk") == 1).cast("int")
    return ranked.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(kept).cast("long").alias("n_kept"),
        F.sum(F.col("n_chars") * kept).cast("long").alias("kept_chars"),
    )
