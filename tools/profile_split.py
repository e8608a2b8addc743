"""Split each query's cost into fn() construction (fixture builds,
planning, eager sub-jobs) vs the noop execution of the returned frame.

Usage: python tools/profile_split.py [query ...]   (default: top bench entries)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from daskberg_spark.session import get_spark

    qs = entry_mod.queries()
    spark = get_spark("profile_split")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    from daskberg_spark.operators.registry import table

    for t in ("lineitem", "orders", "customer", "events", "documents",
              "embeddings"):
        try:
            table(spark, sf_dir, t).count()
        except Exception:
            pass
    print(f"{'query':38s} {'rep':3s} {'fn()':>8s} {'noop':>8s} {'total':>8s}")
    for n in names:
        fn = qs.get(n)
        if fn is None:
            print(f"{n}: not registered")
            continue
        for rep in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            print(
                f"{n:38s} {rep:3d} {t1 - t0:8.3f} {t2 - t1:8.3f} {t2 - t0:8.3f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
