"""Dump .explain("formatted") for registry queries to plans/<tag>/.

Usage:
  python tools/explain_dump.py <tag> [query ...]        # default: bench HEADLINE
  SPARK_GRAFT_SF_DIR overrides the data dir (default /root/testdata/sf0.1)

Writes plans/<tag>/<query>_<suffix>.txt where <suffix> is the second
half of <tag> split on ':' (e.g. tag "r15:before" -> plans/r15/<q>_before.txt).
Queries that build fixtures run their builders as a side effect; the dump
is the FINAL returned DataFrame's formatted plan (the thing the noop sink
executes), which is what plan contracts and the optimization log cite.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15:before"
    rdir, _, suffix = tag.partition(":")
    suffix = suffix or "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from daskberg_spark.session import get_spark

    qs = entry_mod.queries()
    if not names:
        import bench

        names = [n for n in bench.HEADLINE if n in qs]
    spark = get_spark("explain_dump")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        rdir,
    )
    os.makedirs(out_dir, exist_ok=True)
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for n in names:
        fn = qs.get(n)
        if fn is None:
            print(f"SKIP {n}: not registered", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # keep going; report at the end
            print(f"FAIL {n}: {e}", file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{n}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
