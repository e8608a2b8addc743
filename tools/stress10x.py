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
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
