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

    shapes = {
        "q1_agg": (li, q1_shape),
        "exact_dedup": (docs, dedup_shape),
        "shingle_index": (docs, shingle_shape),
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

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
