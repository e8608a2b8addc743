"""10×-data scaling stress: union the base tables 10× and compare headline
plan shapes' wall-clock vs 1× (noop sink, warm session, min-of-2).

Checks that shapes scale with data volume, not with driver state or plan
pathology.  Usage: python tools/stress10x.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from daskberg_spark.operators.registry import table
    from daskberg_spark.session import get_spark

    spark = get_spark("stress10x")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    def times10(df):
        out = df
        for _ in range(9):
            out = out.unionByName(df)
        return out

    li = table(spark, sf_dir, "lineitem")
    docs = table(spark, sf_dir, "documents")

    def q1_shape(frame):
        dec = "decimal(25,6)"
        return frame.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(F.col("l_quantity").cast(dec)).cast("double"),
            F.sum(F.col("l_extendedprice").cast(dec)).cast("double"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(dec)
            ).cast("double"),
            F.count(F.lit(1)),
        )

    def dedup_shape(frame):
        norm = F.lower(F.regexp_replace("text", "\\s+", " "))
        return (
            frame.select(F.md5(F.encode(norm, "UTF-8")).alias("h"), "doc_id")
            .groupBy("h")
            .agg(F.min("doc_id"), F.count(F.lit(1)))
        )

    def shingle_shape(frame):
        toks = F.split(F.lower(F.trim(F.col("text"))), "\\s+")
        m = F.greatest(F.size(toks) - 2, F.lit(1))
        zipped = F.arrays_zip(
            *[F.slice(toks, 1 + k, m).alias(f"t{k}") for k in range(3)]
        )
        sh = F.array_distinct(
            F.transform(
                zipped,
                lambda x: F.concat_ws(" ", *[x[f"t{k}"] for k in range(3)]),
            )
        )
        return (
            frame.select("doc_id", F.explode(sh).alias("sh"))
            .groupBy("sh")
            .agg(F.count(F.lit(1)))
        )

    def shard_shape(frame):
        # r9 training_shards: seeded multiplicative-hash split — must
        # stay one narrow scan + one O(shards) agg at any volume; the
        # constants come from the production query so this shape cannot
        # silently diverge from it
        from daskberg_spark.operators.packing import (
            N_TRAIN_SHARDS,
            SHARD_MULT,
            SHARD_SEED,
        )

        shard = F.pmod(
            F.pmod(
                F.col("doc_id") * F.lit(SHARD_MULT) + F.lit(SHARD_SEED),
                F.lit(4294967296),
            ),
            F.lit(N_TRAIN_SHARDS),
        )
        return frame.groupBy(shard.alias("shard")).agg(
            F.count(F.lit(1)), F.sum("n_chars")
        )

    shapes = {
        "q1_agg": (li, q1_shape),
        "exact_dedup": (docs, dedup_shape),
        "shingle_index": (docs, shingle_shape),
        "training_shards": (docs, shard_shape),
    }
    results = {}
    for name, (base, fn) in shapes.items():
        for label, frame in (("1x", base), ("10x", times10(base))):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(frame).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results[f"{name}_{label}"] = round(best, 3)

    # -- skewed-key shuffle join: AQE skew-split vs off vs manual salting --
    # 90% of the 10x fact lands on ONE join key; the dim side is forced
    # off the broadcast path so the join actually shuffles (at 100 TB the
    # dim may not be broadcastable).  AQE's skew thresholds are scaled
    # down to match the scaled-down fixture (the production defaults are
    # 256 MB — proportionally identical).
    fact = times10(li).select(
        F.when(F.col("l_orderkey") % 10 < 9, 0)
        .otherwise(F.col("l_orderkey") % 10000)
        .alias("k"),
        "l_quantity",
    )
    dim = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )

    def skew_join(f, d):
        return (
            f.join(d, "k")
            .groupBy("grp")
            .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("s"))
        )

    SALT = 8
    fact_salted = fact.withColumn("salt", (F.col("k") + F.col("l_quantity").cast("long")) % SALT)
    dim_salted = dim.withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(SALT)])))

    conf_pairs = [
        ("skew_join_no_split", {"spark.sql.adaptive.skewJoin.enabled": "false"}),
        ("skew_join_aqe_split", {"spark.sql.adaptive.skewJoin.enabled": "true"}),
    ]
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4MB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2MB")
    for name, confs in conf_pairs:
        for k, v in confs.items():
            spark.conf.set(k, v)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            skew_join(fact, dim).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best, 3)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        (
            fact_salted.join(dim_salted, ["k", "salt"])
            .groupBy("grp")
            .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("s"))
        ).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    results["skew_join_salted"] = round(best, 3)
    for k, v in old.items():
        if v is not None:
            spark.conf.set(k, v)

    # -- C2: minhash-LSH candidate generation at 10× corpus ----------------
    # Each extra copy gets a per-copy token prefix, so copies are NOT
    # near-dups of each other (distinct shingles) and the corpus is
    # genuinely 10× larger with the SAME per-copy duplicate density —
    # candidate pairs should scale ~linearly, wall with bucket sizes,
    # never n².
    from daskberg_spark.operators.dedup import (
        N_BANDS,
        N_HASHES,
        min_label_propagation,
        minhash_signatures_from_shingles,
        shingle_arrays,
    )

    def docs_distinct_10x():
        out = docs
        for i in range(1, 10):
            out = out.unionByName(
                docs.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * 1_000_000)
                ).withColumn(
                    "text", F.regexp_replace("text", "(^|\\s)", f"$1c{i}")
                )
            )
        return out

    def lsh_candidates(frame):
        # the production banding stage itself (dedup.minhash_band_pairs)
        # — a stress-local copy would silently measure stale logic
        from daskberg_spark.operators.dedup import (
            minhash_band_pairs,
            shingle_arrays,
        )

        sh = shingle_arrays(frame).localCheckpoint()
        return minhash_band_pairs(sh)

    for label, frame in (("1x", docs), ("10x", docs_distinct_10x())):
        best = float("inf")
        n_pairs = 0
        for _ in range(2):
            t0 = time.perf_counter()
            n_pairs = lsh_candidates(frame).count()
            best = min(best, time.perf_counter() - t0)
        results[f"lsh_candidates_{label}"] = round(best, 3)
        results[f"lsh_candidates_{label}_pairs"] = n_pairs

    # -- C2: CC rounds on an adversarial chain (pointer jumping) -----------
    # A path graph is the worst case for 1-hop label propagation
    # (rounds = diameter).  With path halving, rounds grow ~log2: 10×
    # the chain should add ~3-4 rounds, not 10× the rounds.
    for label, n in (("1x", 1_000), ("10x", 10_000)):
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
        )
        t0 = time.perf_counter()
        labels, rounds = min_label_propagation(edges)
        assert labels.where("component <> 0").count() == 0
        results[f"cc_chain_{label}"] = round(time.perf_counter() - t0, 3)
        results[f"cc_chain_{label}_rounds"] = rounds

    # -- C3: IVF probe cost at 10× corpus ----------------------------------
    # Same N_QUERIES query vectors (copy 0), corpus 10×: the probed join
    # still touches ~N_PROBE/N_CELLS of the corpus, so per-query scanned
    # fraction stays flat and wall tracks the probed rows, not all-pairs.
    # (The recall harness's brute-force truth pass is deliberately NOT
    # timed here — this measures the serving path alone.)
    from pyspark.sql import Window as W

    from daskberg_spark.operators.registry import table as _table
    from daskberg_spark.operators.similarity import (
        N_PROBE,
        N_QUERIES,
        TOP_K,
        _cell_of,
        _dot,
        _norm,
        _sq_dist,
        ivf_centroids,
    )

    emb = _table(spark, sf_dir, "embeddings")

    def emb_10x():
        out = emb
        for i in range(1, 10):
            out = out.unionByName(
                emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
            )
        return out

    def ivf_probe(frame):
        centroids = ivf_centroids(frame)
        v = F.col("embedding")
        corpus = frame.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cv"),
            _cell_of(v, centroids).alias("cell"),
        )
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
            frame.filter(F.col("vec_id") < N_QUERIES)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qv"),
                F.explode(probes).alias("p"),
            )
            .select("query_id", "qv", F.col("p.cell").alias("qcell"))
        )
        cand = F.broadcast(q).join(
            corpus,
            (F.col("qcell") == corpus["cell"])
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        cos = _dot(F.col("qv"), F.col("cv")) / (
            _norm(F.col("qv")) * _norm(F.col("cv"))
        )
        scored = cand.select("query_id", "neighbor_id", cos.alias("cosine"))
        w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
        topk = scored.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= TOP_K
        )
        return topk, scored

    for label, frame in (("1x", emb), ("10x", emb_10x())):
        total = frame.count()
        best, frac = float("inf"), None
        for _ in range(2):
            t0 = time.perf_counter()
            topk, scored = ivf_probe(frame)
            n_topk = topk.count()
            best = min(best, time.perf_counter() - t0)
            n_scanned = scored.count()
            frac = round(n_scanned / (N_QUERIES * total), 4)
            assert n_topk == N_QUERIES * TOP_K
        results[f"ivf_probe_{label}"] = round(best, 3)
        results[f"ivf_probe_{label}_scan_frac"] = frac

    # -- round 6: merge-on-read delete path ---------------------------------
    # (a) plan size vs #delete-commits: the delete-aware read is ONE
    #     tagged scan + one sequence-keyed anti-join per key set, with
    #     ALL delete keys in one multi-path scan — 10× the delete
    #     commits must leave the plan flat (the pre-r6 shape grew one
    #     union leg per applicability class).
    import tempfile

    import daskberg_spark.iceberg.scan  # noqa: F401  (attaches .to_df)
    from daskberg_spark.iceberg.metadata import IcebergTable
    from daskberg_spark.iceberg.writer import IcebergWriter, delete_where_spark

    mor_base = tempfile.mkdtemp(prefix="stress_mor_")
    schema = [
        {"id": 1, "name": "id", "type": "long", "required": False},
        {"id": 2, "name": "v", "type": "double", "required": False},
    ]
    for label, n_commits in (("10c", 10), ("100c", 100)):
        p = f"{mor_base}/t{label}"
        w = IcebergWriter(p, schema)
        w.append([{"id": i, "v": float(i)} for i in range(4000)])
        killed = set()
        for c in range(n_commits):
            ids = [30 * c + j for j in range(10)]
            w.delete_rows_equality([{"id": i} for i in ids])
            killed.update(ids)
        t = IcebergTable(p)
        t0 = time.perf_counter()
        df = t.to_df(spark)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        n_rows = df.count()
        assert n_rows == 4000 - len(killed), (n_rows, len(killed))
        results[f"mor_read_{label}_wall"] = round(time.perf_counter() - t0, 3)
        results[f"mor_read_{label}_plan_lines"] = len(plan.splitlines())

    # (b) delete_where_spark at 10× data with proportional matches:
    #     executor cost is O(scan)+O(matches), driver state is the
    #     delete-file entry list only (#write tasks), never O(rows).
    for label, n in (("1x", 30_000), ("10x", 300_000)):
        p = f"{mor_base}/dw{label}"
        w = IcebergWriter(p, schema)
        w.append([{"id": i, "v": float(i)} for i in range(n)])
        t0 = time.perf_counter()
        delete_where_spark(w, spark, "id % 100 = 0")  # 1% of rows
        results[f"mor_delete_where_{label}_wall"] = round(
            time.perf_counter() - t0, 3
        )
        results[f"mor_delete_where_{label}_delete_files"] = sum(
            1
            for d in IcebergTable(p).plan_deletes()
        )
        t0 = time.perf_counter()
        n_live = IcebergTable(p).to_df(spark).count()
        assert n_live == n - n // 100, (n_live, n)
        results[f"mor_deleteaware_read_{label}_wall"] = round(
            time.perf_counter() - t0, 3
        )

    # (c) v3 deletion vectors vs v2 position-delete parquet at the same
    #     10% delete density: read wall and on-disk delete bytes.  The
    #     DV read pays a mapInPandas decode (Python workers) where the
    #     parquet path stays JVM-side; the DV's wins are byte density
    #     (~2 B/row dense vs (path,pos) parquet rows) and O(blobs)
    #     planning — both reported here.
    from daskberg_spark.iceberg.writer import delete_where_dv_spark

    for label, fn in (("posdel", delete_where_spark), ("dv", delete_where_dv_spark)):
        p = f"{mor_base}/cmp_{label}"
        w = IcebergWriter(p, schema)
        w.append([{"id": i, "v": float(i)} for i in range(100_000)])
        fn(w, spark, "id % 10 = 0")
        t = IcebergTable(p)
        results[f"cmp_{label}_delete_bytes"] = sum(
            d.get("content_size_in_bytes") or d["file_size_in_bytes"]
            for d in t.plan_deletes()
        )
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            n = t.to_df(spark).count()
            best = min(best, time.perf_counter() - t0)
        assert n == 90_000, n
        results[f"cmp_{label}_read_wall"] = round(best, 3)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
