"""Tier-C similarity search over ``embeddings`` (SURVEY §2 C3/C5).

Baseline: brute-force cosine top-k (broadcast query set, per-partition
JVM fold — exact, the oracle-checked path).  Scale path: random-hyperplane
LSH bucketing that cuts the candidate set before exact re-scoring.

Precision contract with the oracle: Spark computes the dot product as a
sequential ``aggregate`` fold over float→double casts; the DuckDB oracle
mirrors the same left-to-right order via ``list_dot_product`` on DOUBLE
lists.  Ranks are tie-broken by neighbor id so equal similarities cannot
flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daskberg_spark.operators.registry import DEC, davg, dsum, query, table

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors


def _dot(a, b):
    """Sequential left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


@query(
    "similarity_topk",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    c AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
    ),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.qv, c.cv)
               / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv)))
               AS cosine
      FROM q JOIN c ON q.query_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
      FROM scored) t
    WHERE rank <= {TOP_K}
    """,
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 baseline: exact cosine top-k for a small query set.

    The query side is broadcast (tiny), so the candidate scan never
    shuffles; per-query top-k runs through a window.  At 100 TB the same
    plan holds: broadcast queries, one pass over the corpus, partial
    top-k per partition via the window's partial TakeOrdered."""
    return exact_topk(table(spark, sf_dir, "embeddings"))


def _cosine(a, b, na=None, nb=None):
    """Cosine of two vector columns with EXPLICIT zero-norm semantics:
    Spark's double division yields NULL on /0 while DuckDB (ieee mode)
    yields NaN, and NULL vs NaN sort to OPPOSITE ends of a descending
    top-k — a single zero vector would silently desync every ranked
    oracle.  Emit NaN on the Spark side too: both engines then rank it
    identically (NaN greatest).

    ``na``/``nb``: PRECOMPUTED norm columns.  Pair-scoring sites must
    pass them, materialized per ROW before the join — inlining ``_norm``
    here puts an O(dim) fold inside the pair loop AND the ``when``
    guard duplicates the denominator subtree, so each pair paid ~4 dim
    folds instead of the two multiplications it needs (the r10→r11
    control regression on semdedup/neardup: 1.46x at bench scale, and
    O(pairs·dim) vs O(rows·dim) at 100 TB)."""
    na = _norm(a) if na is None else na
    nb = _norm(b) if nb is None else nb
    denom = na * nb
    return F.when(denom == 0.0, F.lit(float("nan"))).otherwise(
        _dot(a, b) / denom
    )


def exact_topk(emb: DataFrame) -> DataFrame:
    """Brute-force cosine top-TOP_K of vec_id < N_QUERIES over any
    (vec_id, embedding) frame — the ground-truth half of every ANN
    recall harness here."""
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        _norm(F.col("embedding")).alias("qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        _norm(F.col("embedding")).alias("cn"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine(
                F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank")
    )


@query(
    "embedding_neardup",
    """
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
          > 0.9
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2/C3: embedding-cosine near-duplicate pairs, blocked by label so
    the pair space is bounded (at scale the blocks come from LSH buckets
    — similarity_lsh_buckets below — not a metadata column)."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").alias("v"),
        _norm(F.col("embedding")).alias("n"),
    )
    a, b = emb.alias("a"), emb.alias("b")
    cos = _cosine(F.col("a.v"), F.col("b.v"), F.col("a.n"), F.col("b.n"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos > 0.9)
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (LCG-driven, no
    runtime RNG) shared by tests and the operator."""
    state = 0x9E3779B97F4A7C15
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(row)
    return planes


N_PLANES = 12
_DIM = 64  # embeddings fixture dimensionality


def _plane_lit(plane: list[float]) -> str:
    """DuckDB DOUBLE[] literal of a hyperplane.  repr() emits the shortest
    round-tripping decimal, so DuckDB's parser reconstructs bit-identical
    doubles and the sign of every dot product agrees with Spark."""
    return "[" + ", ".join(repr(x) for x in plane) + "]"


def _bucket_sql(planes: list[list[float]], bits: int, prefix: int = 0) -> str:
    """SQL twin of the packed-bit LSH signature over literal planes."""
    terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, {_plane_lit(p)}) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes[:bits])
    )
    return f"CAST(({terms}) + {prefix} AS BIGINT)"


@query(
    "similarity_lsh_buckets",
    f"""
    WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (SELECT {_bucket_sql(_hyperplanes(_DIM, N_PLANES), N_PLANES)} AS bucket
          FROM e)
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_vectors FROM b GROUP BY bucket
    """,
)
def similarity_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 scale path: random-hyperplane LSH.

    Each vector gets an N_PLANES-bit signature (sign of dot with fixed
    hyperplanes); near-neighbors collide with high probability, so ANN =
    exact cosine *within buckets*.  Output: bucket stats proving the
    partitioning (the candidate-join reuses embedding_neardup's shape).
    Pure Catalyst: hyperplanes are literal arrays, signature is a packed
    bit sum — no Python, no shuffle until the final small agg.  The
    oracle inlines the same plane literals into DuckDB
    ``list_dot_product`` calls; both engines fold the products
    sequentially in double, so every sign bit agrees."""
    emb = table(spark, sf_dir, "embeddings")
    planes = _hyperplanes(_DIM, N_PLANES)
    sig = _signature_col(F.col("embedding"), planes)
    return (
        emb.select(sig.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


N_TABLES = 4
BITS_PER_TABLE = 6


def _lsh_recall_oracle() -> str:
    planes = _hyperplanes(_DIM, N_TABLES * BITS_PER_TABLE)
    sigs = ", ".join(
        _bucket_sql(
            planes[t * BITS_PER_TABLE : (t + 1) * BITS_PER_TABLE],
            BITS_PER_TABLE,
            prefix=t << BITS_PER_TABLE,
        )
        for t in range(N_TABLES)
    )
    cos = (
        "list_dot_product({a}.v, {b}.v)"
        " / (sqrt(list_dot_product({a}.v, {a}.v))"
        " * sqrt(list_dot_product({b}.v, {b}.v)))"
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (SELECT vec_id, unnest([{sigs}]) AS bucket FROM e),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM b q JOIN b c ON q.bucket = c.bucket
       AND q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
    ),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id, {cos.format(a="qe", b="ce")} AS cosine
      FROM cand JOIN e qe ON qe.vec_id = cand.query_id
                JOIN e ce ON ce.vec_id = cand.neighbor_id
    ),
    ann AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS r
        FROM scored) WHERE r <= {TOP_K}
    ),
    ex_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {cos.format(a="q", b="c")} AS cosine
      FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS r
        FROM ex_scored) WHERE r <= {TOP_K}
    ),
    hits AS (
      SELECT query_id, count(*) AS n_hits
      FROM (SELECT query_id, neighbor_id FROM ann
            INTERSECT SELECT query_id, neighbor_id FROM exact)
      GROUP BY query_id
    ),
    k AS (SELECT query_id, count(*) AS k FROM exact GROUP BY query_id)
    SELECT k.query_id, COALESCE(n_hits, 0) / k.k AS recall
    FROM k LEFT JOIN hits ON hits.query_id = k.query_id
    """


@query("similarity_lsh_recall", _lsh_recall_oracle())
def similarity_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: ANN quality measurement — recall@TOP_K of multi-table-LSH
    search vs exact brute force, per query vector.

    Standard L-tables layout (N_TABLES independent BITS_PER_TABLE-bit
    signatures); a candidate is any vector colliding with the query in
    ≥1 table, re-scored with exact cosine.  Deterministic planes →
    deterministic recall, and the oracle replays the entire pipeline in
    DuckDB — plane literals, bucket join, exact re-score, ground-truth
    top-k — so the recall numbers are verified end-to-end, not trusted.

    NB the synthetic embeddings fixture is isotropic random (best
    neighbor cosine ≈0.37, no cluster structure), which is the
    worst case for LSH — measured recall here is a floor, not typical;
    clustered real embeddings collide far more often.  The value of this
    operator is the measurement harness: it quantifies the
    recall/candidate-count trade-off for any (tables, bits) setting."""
    emb = table(spark, sf_dir, "embeddings")
    planes = _hyperplanes(_DIM, N_TABLES * BITS_PER_TABLE)
    v = F.col("embedding")

    def table_sig(t: int):
        sig = _signature_col(
            v, planes[t * BITS_PER_TABLE : (t + 1) * BITS_PER_TABLE]
        )
        # disjoint bucket spaces per table: prefix with the table id
        return (sig + F.lit(t << BITS_PER_TABLE)).cast("long")

    with_b = emb.select(
        "vec_id",
        "embedding",
        F.explode(F.array(*[table_sig(t) for t in range(N_TABLES)])).alias("bucket"),
    )
    q = with_b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        _norm(F.col("embedding")).alias("qn"),
        F.col("bucket").alias("qb"),
    )
    c = with_b.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        _norm(F.col("embedding")).alias("cn"),
        F.col("bucket").alias("cb"),
    )
    cand = F.broadcast(q).join(
        c, (F.col("qb") == F.col("cb")) & (F.col("query_id") != F.col("neighbor_id"))
    ).dropDuplicates(["query_id", "neighbor_id"])
    cos = _cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    ann = (
        cand.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    exact = similarity_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = ann.intersect(exact).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("k")).alias("recall"),
        )
    )


# -- IVF (inverted-file) ANN: the cell-probed scale path ---------------------

N_CELLS = 16
N_PROBE = 4
KMEANS_ROUNDS = 3


def _sq_dist(v, cent: list[float]):
    """Squared L2 distance to a literal centroid, per-row JVM fold."""
    carr = F.array(*[F.lit(x) for x in cent])
    return F.aggregate(
        F.zip_with(v, carr, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cell_of(v, centroids: list[list[float]]):
    """argmin cell id over literal centroids — one expression, no shuffle.
    array_min over struct<d,cell> is lexicographic: min distance, ties to
    the lower cell id."""
    return F.array_min(
        F.array(
            *[
                F.struct(_sq_dist(v, c).alias("d"), F.lit(i).alias("cell"))
                for i, c in enumerate(centroids)
            ]
        )
    )["cell"]


def ivf_centroids(
    emb: DataFrame,
    n_cells: int = N_CELLS,
    rounds: int = KMEANS_ROUNDS,
    init: str = "first",
) -> list[list[float]]:
    """Distributed mini-kmeans coarse quantizer.

    Two deterministic inits:
    - ``first`` (default): the first ``n_cells`` vec_ids — cheap, and on
      structureless/isotropic data as good as anything;
    - ``greedy``: farthest-point / k-center (each next seed maximizes
      its distance to the chosen set, ties to the lower vec_id) — on
      clustered corpora this lands one seed per natural cluster before
      subdividing, which Lloyd rounds alone cannot fix from a bad
      start.  Costs one bounded argmax job per seed (on a 100 TB corpus
      run the init on a deterministic sample); on isotropic data it
      chases outliers, so it is opt-in.

    Each Lloyd round assigns every vector to its nearest centroid via a
    literal-expression argmin (zero shuffles over the corpus) and
    recomputes means with posexplode → groupBy(cell, dim).  Only the
    centroid table itself — ``n_cells × dim`` doubles, metadata-scale —
    ever reaches the driver, the same contract as MLlib's KMeans driver
    loop."""
    v = F.col("embedding")
    n_rows = emb.limit(n_cells).count()
    if n_rows == 0:
        raise ValueError("ivf_centroids: empty corpus")
    # fewer vectors than requested cells: clamp (an IndexError deep in
    # the Lloyd loop pointed nowhere)
    n_cells = min(n_cells, n_rows)
    if init == "greedy":
        first = emb.orderBy("vec_id").limit(1).select("embedding").collect()[0]
        centroids = [[float(x) for x in first["embedding"]]]
        while len(centroids) < n_cells:
            dmin = F.least(*[_sq_dist(v, c) for c in centroids]) if len(
                centroids
            ) > 1 else _sq_dist(v, centroids[0])
            far = (
                emb.select("vec_id", "embedding", dmin.alias("d"))
                .orderBy(F.col("d").desc(), "vec_id")
                .limit(1)
                .collect()[0]
            )
            centroids.append([float(x) for x in far["embedding"]])
    else:
        seeds = emb.orderBy("vec_id").limit(n_cells).select("embedding").collect()
        centroids = [[float(x) for x in r["embedding"]] for r in seeds]
    dim = len(centroids[0])
    for _ in range(rounds):
        assigned = emb.select(_cell_of(v, centroids).alias("cell"), "embedding")
        means = (
            assigned.select("cell", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cell", "pos")
            # decimal-exact mean (registry convention): a plain double
            # F.avg merges partials in shuffle-fetch order, so two runs
            # could differ in the last ulp and flip a boundary vector's
            # cell — breaking this function's determinism contract
            .agg(davg(F.col("x"), "m"))
            .collect()
        )
        by_cell: dict[int, list[float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], [0.0] * dim)[r["pos"]] = r["m"]
        # empty cells keep their previous centroid
        centroids = [by_cell.get(i, centroids[i]) for i in range(n_cells)]
    return centroids


@query("similarity_ivf_recall")  # kmeans cells have no SQL twin → rows-only
def similarity_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 scale path #2: IVF (inverted-file) ANN — kmeans-partition the
    corpus into N_CELLS cells, search only each query's N_PROBE nearest
    cells, exact cosine re-score, then measure recall@TOP_K vs brute
    force (same harness as similarity_lsh_recall).

    The 100 TB shape: cell assignment is a per-row expression (no
    shuffle); the probed join keys on cell id, so each query touches
    ~N_PROBE/N_CELLS of the corpus.  Output adds the measured candidate
    fraction so the recall/cost trade-off is visible per query.

    NB the raw embeddings fixture is isotropic (worst case for any
    partitioned ANN); ``similarity_ivf_clustered_recall`` measures the
    realistic clustered regime."""
    return _ivf_recall(table(spark, sf_dir, "embeddings"), N_PROBE)


def _ivf_recall(emb: DataFrame, n_probe: int, init: str = "first") -> DataFrame:
    """IVF ANN + exact re-ranking recall harness over any (vec_id,
    embedding) frame: kmeans cells, probe ``n_probe`` nearest, exact
    cosine re-score of ONLY the probed candidates, recall@TOP_K vs the
    brute-force ground truth plus the scanned corpus fraction."""
    centroids = ivf_centroids(emb, init=init)
    v = F.col("embedding")
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        _norm(F.col("embedding")).alias("cn"),
        _cell_of(v, centroids).alias("cell"),
    )
    # per-query probe cells: N_PROBE smallest distances (array_sort of
    # struct<d,cell> is lexicographic)
    probes = F.slice(
        F.array_sort(
            F.array(
                *[
                    F.struct(_sq_dist(v, c).alias("d"), F.lit(i).alias("cell"))
                    for i, c in enumerate(centroids)
                ]
            )
        ),
        1,
        n_probe,
    )
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            _norm(F.col("embedding")).alias("qn"),
            F.explode(probes).alias("p"),
        )
        .select("query_id", "qv", "qn", F.col("p.cell").alias("qcell"))
    )
    cand = F.broadcast(q).join(
        corpus,
        (F.col("qcell") == corpus["cell"]) & (F.col("query_id") != F.col("neighbor_id")),
    ).drop("qcell", "cell")
    cos = _cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    scored = cand.select("query_id", "neighbor_id", cos.alias("cosine"))
    ann = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    n_cand = scored.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_cand"))
    total = emb.count()
    exact = exact_topk(emb).select("query_id", "neighbor_id")
    hits = ann.intersect(exact).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .join(hits, "query_id", "left")
        .join(n_cand, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("k")).alias("recall"),
            (F.coalesce(F.col("n_cand"), F.lit(0)) / F.lit(float(total))).alias(
                "candidate_fraction"
            ),
        )
    )


@query(
    "embedding_quantize",
    """
    WITH q AS (
      SELECT vec_id,
             CAST(embedding AS DOUBLE[]) AS v,
             list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)))
               AS scale
      FROM embeddings
    ),
    dq AS (
      SELECT vec_id, v, scale,
             list_transform(v, x -> round(127.0 * x / scale) * scale / 127.0)
               AS vq
      FROM q
    )
    SELECT vec_id,
           scale,
           CAST(list_aggregate(list_transform(range(1, len(v) + 1),
                  i -> (v[i] - vq[i]) * (v[i] - vq[i])), 'sum')
                / len(v) AS DOUBLE) AS mse
    FROM dq
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 memory-scaling path: symmetric int8 quantization of embeddings
    (per-vector max-abs scale → round to 127 levels), reporting the
    per-vector reconstruction MSE.  4× smaller vectors let an ANN index
    hold 4× the corpus per executor; re-scoring the top candidates in
    float restores exactness.  Entirely JVM-side array lambdas; the
    oracle mirrors the same quantize→dequantize→error arithmetic in
    DuckDB list lambdas (identical IEEE ops → bit-exact MSE)."""
    emb = table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    with_scale = emb.select(
        "vec_id",
        v.alias("v"),
        F.array_max(F.transform(v, lambda x: F.abs(x))).alias("scale"),
    )
    vq = F.transform(
        F.col("v"),
        lambda x: F.round(F.lit(127.0) * x / F.col("scale"))
        * F.col("scale")
        / F.lit(127.0),
    )
    dq = with_scale.select("vec_id", "v", "scale", vq.alias("vq"))
    sq_err = F.zip_with(
        F.col("v"), F.col("vq"), lambda a, b: (a - b) * (a - b)
    )
    mse = (
        F.aggregate(sq_err, F.lit(0.0), lambda acc, x: acc + x)
        / F.size("v")
    ).alias("mse")
    return dq.select("vec_id", "scale", mse)


# -- clustered-regime ANN measurement ----------------------------------------

CLUSTER_ALPHA = 0.1  # residual deviation kept around the label mean
N_PROBE_CLUSTERED = 2


def clustered_embeddings(emb: DataFrame) -> DataFrame:
    """Clustered variant of the embeddings fixture, derived
    deterministically from the fixture itself: every vector shrinks
    toward its label's per-dimension mean, v' = m + ALPHA*(v - m), with
    the means computed decimal-exactly (order-independent, so DuckDB can
    re-derive bit-identical vectors for ground-truth verification).
    The raw fixture is isotropic — the worst case for partitioned ANN;
    real embedding corpora cluster, and this is that regime."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    by_dim = emb.select("label", F.posexplode(v).alias("pos", "x"))
    means = by_dim.groupBy("label", "pos").agg(
        davg(F.col("x").cast("double"), "m")
    )
    marr = (
        means.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("label", F.transform("pm", lambda s: s["m"]).alias("mean"))
    )
    shrunk = F.zip_with(
        v,
        F.col("mean"),
        lambda x, m: m + F.lit(CLUSTER_ALPHA) * (x - m),
    )
    return (
        emb.select("vec_id", "label", v.alias("embedding"))
        .join(F.broadcast(marr), "label")
        .select("vec_id", shrunk.alias("embedding"), "label")
        .localCheckpoint()
    )


@query("similarity_ivf_clustered_recall")  # kmeans cells: rows-only; truth
# set oracle-verified in tests/test_tierc.py via DuckDB re-derivation
def similarity_ivf_clustered_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: IVF ANN measured in the clustered regime — the fixture's
    vectors shrunk toward their label means (see clustered_embeddings),
    probing only N_PROBE_CLUSTERED of N_CELLS cells with exact re-ranking
    of the probed candidates.  Cells align with the natural clusters, so
    the harness demonstrates the production trade-off: recall >= 0.95@5
    while scanning <= 15% of the corpus (asserted in tests against a
    DuckDB-re-derived ground truth)."""
    emb = table(spark, sf_dir, "embeddings")
    return _ivf_recall(clustered_embeddings(emb), N_PROBE_CLUSTERED, init="greedy")


class IvfIndex:
    """Reusable IVF ANN index: build once (kmeans centroids + checkpointed
    cell assignment of the corpus), search many times.  The build is the
    expensive pass; each search touches only the probed cells' rows —
    the serving shape, vs the one-shot measurement harness above.  At
    100 TB the assignment frame is written as a parquet/Iceberg table
    partitioned by cell instead of checkpointed."""

    def __init__(self, centroids: list[list[float]], assigned: DataFrame):
        self.centroids = centroids
        self.assigned = assigned

    @classmethod
    def build(
        cls,
        emb: DataFrame,
        n_cells: int = N_CELLS,
        rounds: int = KMEANS_ROUNDS,
        init: str = "first",
    ) -> "IvfIndex":
        centroids = ivf_centroids(emb, n_cells, rounds, init)
        assigned = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cv"),
            _norm(F.col("embedding")).alias("cn"),
            _cell_of(F.col("embedding"), centroids).alias("cell"),
        ).localCheckpoint()
        return cls(centroids, assigned)

    def search(
        self,
        queries: DataFrame,
        k: int = TOP_K,
        n_probe: int = N_PROBE,
        exclude_self: bool = False,
    ) -> DataFrame:
        """queries: (query_id, qv array) → (query_id, neighbor_id, rank,
        cosine) over the probed cells, exact-re-ranked.

        ``exclude_self`` drops the corpus vector whose vec_id EQUALS the
        query_id — only meaningful when queries are drawn from the
        corpus itself (the recall-harness shape).  It defaults OFF:
        external queries live in a different id space, and filtering on
        id equality there silently suppressed the true nearest neighbor
        whenever the numbers collided."""
        v = F.col("qv")
        probes = F.slice(
            F.array_sort(
                F.array(
                    *[
                        F.struct(_sq_dist(v, c).alias("d"), F.lit(i).alias("cell"))
                        for i, c in enumerate(self.centroids)
                    ]
                )
            ),
            1,
            n_probe,
        )
        q = queries.select(
            "query_id", "qv", _norm(F.col("qv")).alias("qn"),
            F.explode(probes).alias("p")
        ).select("query_id", "qv", "qn", F.col("p.cell").alias("qcell"))
        cond = F.col("qcell") == self.assigned["cell"]
        if exclude_self:
            cond = cond & (F.col("query_id") != F.col("neighbor_id"))
        cand = F.broadcast(q).join(self.assigned, cond)
        cos = _cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), "neighbor_id"
        )
        return (
            cand.select("query_id", "neighbor_id", cos.alias("cosine"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )


@query(
    "embedding_dim_stats",
    """
    WITH x AS (
      SELECT unnest(list_transform(range(1, len(embedding)+1),
               i -> struct_pack(dim := i, v := embedding[i]))) AS u
      FROM embeddings
    ), m AS (
      SELECT u.dim AS dim,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(CAST(u.v AS DOUBLE) AS DECIMAL(25,6)))
                  AS DOUBLE) AS sx,
             CAST(SUM(CAST(CAST(u.v AS DOUBLE) * CAST(u.v AS DOUBLE)
                           AS DECIMAL(25,6))) AS DOUBLE) AS sxx
      FROM x GROUP BY u.dim
    )
    SELECT CAST(dim AS INTEGER) AS dim,
           CAST(n AS BIGINT) AS n,
           sx / n AS mean,
           (sxx - sx * sx / n) / n AS variance
    FROM m ORDER BY dim
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3+: per-dimension mean/variance census over the embedding column —
    the normalization statistics (whitening, feature scaling, dead-dim
    detection) an embedding pipeline computes before indexing.

    Exactness: per-element terms are rounded to DECIMAL(25,6) and summed
    exactly; mean/variance are evaluated in double with the identical
    expression order on both engines (the sketches.py moment pattern).

    Scale: posexplode is a narrow 64× fan-out (no shuffle), then ONE
    partial-agg shuffle with 64 groups × 3 numbers of state — the
    mergeable-moments layout; nothing driver-side."""
    emb = table(spark, sf_dir, "embeddings")
    x = emb.select(
        F.posexplode("embedding").alias("pos", "v")
    ).select((F.col("pos") + 1).alias("dim"), F.col("v").cast("double").alias("v"))
    m = x.groupBy("dim").agg(
        F.count("*").cast("double").alias("n"),
        dsum("v", "sx"),
        dsum(F.col("v") * F.col("v"), "sxx"),
    )
    return m.select(
        F.col("dim").cast("int").alias("dim"),
        F.col("n").cast("long").alias("n"),
        (F.col("sx") / F.col("n")).alias("mean"),
        (
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / F.col("n")
        ).alias("variance"),
    ).orderBy("dim")


# -- semantic dedup (SemDeDup-style) ----------------------------------------

SEMDEDUP_BITS = 6  # 2^6 sign-bit clusters for the oracle-twin variant
SEMDEDUP_TAU = 0.35  # the synthetic fixture is isotropic (no true near-dups);
# 0.35 sits in its similarity tail so the drop path actually executes.
# A production corpus would run ~0.95 (SemDeDup paper's regime).


def _signature_col(v, planes):
    """Packed sign-bit signature of vector column ``v`` over literal
    hyperplanes — the same pure-Catalyst fold similarity_lsh_buckets
    uses, factored for reuse.

    Guarded on dimensionality: zip_with NULL-pads a short/long vector,
    the fold goes NULL, and every bit would silently fall to 0 — the
    whole corpus in bucket 0 with no error (while the DuckDB oracle's
    list_dot_product raises).  A mismatched vector now raises inside
    the plan instead."""
    dim = len(planes[0])
    sig = None
    for i, plane in enumerate(planes):
        d = _dot(v, F.array(*[F.lit(x) for x in plane]))
        bit = F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return (
        F.when(F.size(v) == dim, sig)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"embedding dim != {dim} for LSH planes: "),
                    F.size(v).cast("string"),
                )
            )
        )
        .cast("long")
    )


def semantic_dedup(emb: DataFrame, cluster, tau: float = SEMDEDUP_TAU) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the corpus, then
    within each cluster drop every vector that has an EARLIER (lower
    vec_id) cluster-mate with cosine >= ``tau``.

    ``emb`` needs (vec_id, v); ``cluster`` is any deterministic Column
    over ``v`` (sign-bit signature for the SQL-twin variant, kmeans
    ``_cell_of`` for the SemDeDup-paper variant — tested in
    test_tierc.py).  The greedy earliest-survivor rule is the standard
    one-pass approximation of per-group representative selection: it is
    order-deterministic, needs no iteration, and guarantees at least one
    survivor per near-dup group.

    100 TB shape: cluster assignment is a per-row expression (no
    shuffle); the only shuffle is the within-cluster self-join, whose
    cost is Σ cluster² — bounded by construction (more bits / more
    centroids at larger corpora), never the all-pairs O(n²).  A pair
    straddling two clusters is not considered — the recall/cost knob
    every production semantic dedup exposes."""
    # materialize the assignment ONCE: the cluster expression (an
    # N_CELLS × dim distance fold for the kmeans variant) feeds BOTH
    # self-join sides and the final keep-join, which shuffle on
    # different keys — without the checkpoint the full per-row fold
    # recomputes per consumer (a redundant corpus pass at scale)
    assigned = (
        emb.withColumn("cluster", cluster)
        .withColumn("__n", _norm(F.col("v")))
        .localCheckpoint()
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = _cosine(
        F.col("a.v"), F.col("b.v"), F.col("a.__n"), F.col("b.__n")
    )
    dropped = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= tau)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("__dropped", F.lit(1))
    )
    return assigned.join(dropped, "vec_id", "left").select(
        "vec_id",
        "cluster",
        F.col("__dropped").isNull().alias("kept"),
    )


def _semdedup_oracle() -> str:
    bucket = _bucket_sql(_hyperplanes(_DIM, SEMDEDUP_BITS), SEMDEDUP_BITS)
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c AS (SELECT vec_id, v, {bucket} AS cluster FROM e),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM c a JOIN c b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))) >= {SEMDEDUP_TAU}
    )
    SELECT c.vec_id, c.cluster,
           c.vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
    FROM c
    """


@query("semdedup_prune", _semdedup_oracle())
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2/C3: SemDeDup (cluster-then-prune) semantic deduplication over
    the embeddings corpus — the cheap-at-scale alternative to all-pairs
    near-dup: cosine comparisons happen ONLY within sign-bit clusters.
    Output is the full per-vector verdict (cluster + kept flag); the
    oracle replays identical plane literals, fold order, and the greedy
    earliest-survivor rule in DuckDB, so every drop decision is checked
    bit-exactly."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )
    planes = _hyperplanes(_DIM, SEMDEDUP_BITS)
    return semantic_dedup(emb, _signature_col(F.col("v"), planes))


# ---------------------------------------------------------------------------
# Product quantization — the COMPRESSION half of IVF-PQ, the scale path
# every production vector store runs (Jégou et al., "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011).  dim-D
# vectors split into PQ_M subspaces; each subspace quantizes to one of
# PQ_K codebook centroids, so a vector stores as PQ_M 4-bit codes
# (16 codes × 4 bits = 8 bytes, two codes per byte — the FAISS
# "fast-scan" PQ16x4 layout) instead of dim floats (64×4 = 256
# bytes): a 32× memory/IO compression.  Search scores candidates by
# ASYMMETRIC distance (ADC): the exact query vector against each
# candidate's reconstructed subspace centroids — computed below as a
# pure Catalyst expression over literal codebooks, no UDF, no shuffle
# beyond the candidate join.  The fixture corpus is isotropic random
# (worst case for PQ — no cluster structure for codebooks to exploit),
# so the measured recall bar below is deliberately modest; real
# embedding corpora cluster and recall rises sharply.

PQ_M = 16         # subspaces (64-dim fixture → 4 dims each)
PQ_K = 16         # centroids per subspace (4-bit codes)
PQ_ROUNDS = 4     # Lloyd rounds per subspace
PQ_SAMPLE = 2000  # codebook training sample cap (driver-bounded)


def pq_train(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    rounds: int = PQ_ROUNDS,
    sample: int = PQ_SAMPLE,
) -> list[list[list[float]]]:
    """Per-subspace PQ codebooks via numpy Lloyd iterations on a
    DETERMINISTIC training sample (lowest ``sample`` vec_ids).  Driver
    state is bounded by the sample (2000×64 doubles ≈ 1 MB) exactly like
    ``ivf_centroids``'s centroid collects; at 100 TB codebooks train on
    a sample by construction — that is the published algorithm, not a
    shortcut.  Deterministic end to end: fixed sample order, first-k
    init, numpy argmin breaking ties to the lowest code."""
    import numpy as np

    rows = (
        emb.orderBy("vec_id").limit(sample).select("embedding").collect()
    )
    if not rows:
        raise ValueError("pq_train: empty corpus")
    x = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    sub = dim // m
    k = min(k, x.shape[0])
    books: list[list[list[float]]] = []
    for mi in range(m):
        xs = x[:, mi * sub : (mi + 1) * sub]
        cents = xs[:k].copy()
        for _ in range(rounds):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(k):
                pts = xs[assign == c]
                if len(pts):
                    cents[c] = pts.mean(0)
        books.append([[float(v) for v in row] for row in cents])
    return books


def pq_codes_col(v, books: list[list[list[float]]]):
    """``array<int>`` PQ codes of vector column ``v`` — one Catalyst
    expression per subspace (argmin over K literal centroids via the
    same lexicographic struct-min as ``_cell_of``), no shuffle."""
    sub = len(books[0][0])
    codes = []
    for mi, cents in enumerate(books):
        subv = F.slice(v, mi * sub + 1, sub)
        codes.append(
            F.array_min(
                F.array(
                    *[
                        F.struct(
                            _sq_dist(subv, c).alias("d"),
                            F.lit(ci).alias("c"),
                        )
                        for ci, c in enumerate(cents)
                    ]
                )
            )["c"]
        )
    return F.array(*codes)


def pq_adc_dot(qv, codes, books: list[list[list[float]]]):
    """Asymmetric (query-exact × candidate-reconstructed) dot product:
    Σ_m ⟨q_sub[m], codebook[m][code[m]]⟩ — ``element_at`` into literal
    codebook arrays indexed by the candidate's stored code.  Pure
    Catalyst; the candidate side never materializes floats."""
    sub = len(books[0][0])
    total = F.lit(0.0)
    for mi, cents in enumerate(books):
        subq = F.slice(qv, mi * sub + 1, sub)
        book_lit = F.array(
            *[F.array(*[F.lit(x) for x in c]) for c in cents]
        )
        total = total + _dot(
            subq, F.element_at(book_lit, F.element_at(codes, mi + 1) + 1)
        )
    return total


# rows-only by design, like the IVF recall pair: codebooks are
# data-dependent (trained on the corpus sample), so no static SQL twin
# exists; tests/test_tierc.py re-derives the ground truth via DuckDB
# and pins recall, determinism, and the compression ratio.
@query("similarity_pq_recall")
def similarity_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 scale path: PQ-compressed ANN recall harness.  The corpus
    stores only 4-bit-per-subspace codes (32× smaller than the float
    vectors); queries rank ALL candidates by the ADC approximate dot
    (at 100 TB this composes with the IVF cell filter above — PQ is the
    per-candidate cost/memory lever, IVF the candidate-count lever).
    Output: per-query recall@TOP_K of the PQ ranking vs the exact
    brute-force ground truth, plus the measured compression ratio."""
    emb = table(spark, sf_dir, "embeddings")
    books = pq_train(emb)
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        pq_codes_col(
            F.transform(F.col("embedding"), lambda x: x.cast("double")),
            books,
        ).alias("codes"),
    ).localCheckpoint()  # encode ONCE; the ranking join reuses codes
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "qv"
        ),
    )
    scored = (
        F.broadcast(q)
        .join(corpus, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            pq_adc_dot(F.col("qv"), F.col("codes"), books).alias("adc"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), "neighbor_id"
    )
    ann = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    exact = exact_topk(emb).select("query_id", "neighbor_id")
    hits = ann.intersect(exact).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    dim = len(books) * len(books[0][0])
    # float32 bytes vs 4-bit codes (two per byte; PQ_K <= 16 guarantees
    # every code fits 4 bits)
    compression = (dim * 4.0) / (len(books) * 0.5)
    return (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.col("n_exact")
            ).alias("recall"),
            F.lit(compression).alias("compression_x"),
        )
        .orderBy("query_id")
    )


PQ_SHORTLIST = 4 * TOP_K  # ADC shortlist size before the exact refine


# rows-only by design: both the coarse quantizer (kmeans cells) and the
# PQ codebooks are data-dependent, so no static SQL twin exists;
# tests/test_tierc.py pins recall, candidate fraction, and determinism.
@query("similarity_ivfpq_recall")
def similarity_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 scale path #4: the FULL production ANN shape — IVF-PQ with
    exact re-ranking (Jégou et al. 2011, the architecture behind FAISS
    IndexIVFPQ).  Three stages, each bounding a different cost:

    1. IVF cell probe (candidate-COUNT lever): each query searches only
       its N_PROBE nearest of N_CELLS kmeans cells, touching
       ~N_PROBE/N_CELLS of the corpus.
    2. PQ ADC shortlist (per-candidate COST lever): probed candidates
       rank by the asymmetric-distance cosine computed from 4-bit PQ
       codes plus one stored norm — the float vectors of the candidate
       set are never read.  Top PQ_SHORTLIST survive.
    3. Exact refine: only the shortlist (4×TOP_K rows per query) joins
       back to the raw vectors for exact cosine re-ranking.

    At 100 TB the corpus legs carry 12 bytes/vector (8 PQ + 4 norm,
    ~21× under float32) through stages 1-2; full vectors surface for
    PQ_SHORTLIST rows per query only.  Output: per-query recall@TOP_K
    vs brute force, the scanned candidate fraction, and the
    stage-1/2 bytes-per-vector compression."""
    emb = table(spark, sf_dir, "embeddings")
    centroids = ivf_centroids(emb)
    books = pq_train(emb)
    v = F.col("embedding")
    vd = F.transform(v, lambda x: x.cast("double"))
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        _cell_of(v, centroids).alias("cell"),
        pq_codes_col(vd, books).alias("codes"),
        _norm(v).alias("cn"),
    ).localCheckpoint()  # assign + encode ONCE
    probes = F.slice(
        F.array_sort(
            F.array(
                *[
                    F.struct(_sq_dist(v, c).alias("d"), F.lit(i).alias("cell"))
                    for i, c in enumerate(centroids)
                ]
            )
        ),
        1,
        N_PROBE,
    )
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            vd.alias("qv"),
            _norm(v).alias("qn"),
            F.explode(probes).alias("p"),
        )
        .select("query_id", "qv", "qn", F.col("p.cell").alias("qcell"))
    )
    cand = F.broadcast(q).join(
        corpus,
        (F.col("qcell") == corpus["cell"])
        & (F.col("query_id") != F.col("neighbor_id")),
    )
    # stage 2: ADC cosine from codes + norms only
    adc_cos = pq_adc_dot(F.col("qv"), F.col("codes"), books) / (
        F.col("qn") * F.col("cn")
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_cos").desc(), "neighbor_id"
    )
    scored = cand.select(
        "query_id", "neighbor_id", "qv", "qn", adc_cos.alias("adc_cos")
    )
    shortlist = (
        scored.withColumn("r", F.row_number().over(w_adc))
        .filter(F.col("r") <= PQ_SHORTLIST)
        .select("query_id", "neighbor_id", "qv", "qn")
    )
    # stage 3: exact refine of the shortlist only
    raw = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        _norm(F.col("embedding")).alias("cn"),
    )
    refined = shortlist.join(raw, "neighbor_id").select(
        "query_id",
        "neighbor_id",
        _cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias(
            "cosine"
        ),
    )
    w_exact = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    ann = (
        refined.withColumn("rank", F.row_number().over(w_exact))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    n_cand = scored.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_cand"))
    total = emb.count()
    exact = exact_topk(emb).select("query_id", "neighbor_id")
    hits = ann.intersect(exact).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    dim = len(books) * len(books[0][0])
    # stage-1/2 candidate bytes: 4-bit codes (two per byte) + one
    # float32 norm, vs dim float32s
    compression = (dim * 4.0) / (len(books) * 0.5 + 4.0)
    return (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .join(hits, "query_id", "left")
        .join(n_cand, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("k")).alias(
                "recall"
            ),
            (
                F.coalesce(F.col("n_cand"), F.lit(0)) / F.lit(float(total))
            ).alias("candidate_fraction"),
            F.lit(compression).alias("compression_x"),
        )
        .orderBy("query_id")
    )
