"""Job-level attribution for one registry query: run it once under a
Spark listener that logs every job's duration + description, plus
cProfile of the driver Python.  Usage:

  python tools/profile_lifecycle.py <query> [sf_dir]

Prints per-job (seconds, description) sorted by cost, the total job
time vs wall time (the gap is driver-side Python/py4j), and the top
cProfile cumulative frames.
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import __spark_entry__ as entry_mod
    from daskberg_spark.session import get_spark

    qs = entry_mod.queries()
    fn = qs[name]
    spark = get_spark("profile_lifecycle")
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

    # warm run (codegen etc.)
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext
    jobs: list[tuple[float, int, str]] = []

    from pyspark import SparkContext  # noqa: F401

    listener_src = """
    """

    # Python-side listener via status tracker polling is racy; instead
    # use the AppStatusStore after the run.
    t0 = time.perf_counter()
    prof = cProfile.Profile()
    prof.enable()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    prof.disable()
    wall = time.perf_counter() - t0

    jvm_store = sc._jsc.sc().statusStore()
    empty = spark._jvm.java.util.ArrayList()
    it = jvm_store.jobsList(empty).iterator()
    rows = []
    while it.hasNext():
        j = it.next()
        try:
            sub = j.submissionTime().get()
            comp = j.completionTime()
            dur = (
                (comp.get().getTime() - sub.getTime()) / 1000.0
                if comp.isDefined()
                else None
            )
            rows.append((j.jobId(), dur, str(j.name())[:110]))
        except Exception:
            pass
    rows.sort()
    # keep only jobs from the measured (second) run: take the last
    # half by job id — crude but effective since the warm run has the
    # same job count
    n = len(rows) // 2
    meas = rows[n:]
    tot = sum(d for _, d, _ in meas if d)
    print(f"=== {name}: wall {wall:.2f}s, {len(meas)} jobs, "
          f"job-time {tot:.2f}s, driver gap {wall - tot:.2f}s ===")
    for jid, dur, desc in sorted(meas, key=lambda r: -(r[1] or 0))[:25]:
        print(f"  job {jid:4d}  {dur or 0:6.2f}s  {desc}")
    s = io.StringIO()
    st = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    st.print_stats(30)
    print(s.getvalue())


if __name__ == "__main__":
    main()
