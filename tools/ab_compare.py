"""Isolated interleaved A/B for registry queries (r10 verdict item 1).

In-bench control ratios inherit whatever the host was doing while the
52-query suite ran; this tool times ONLY the named queries, alternating
whole processes A B A B (fresh JVM each, min over rounds), so a ratio
here is attributable to the code diff, not to suite ordering or drift.

Usage:
  python tools/ab_compare.py <control-commit> q1 q2 ... [--rounds 2]
        [--reps 3] [--sf /root/testdata/sf0.1]

Prints per-query best-of seconds for each side and the ratio, then a
JSON line.  The control worktree is created under .ab_control_wt and
removed afterwards.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
names = json.loads(sys.argv[1])
reps = int(sys.argv[2])
sf_dir = sys.argv[3]
import __spark_entry__ as entry_mod
from daskberg_spark.session import get_spark
qs = entry_mod.queries()
spark = get_spark("ab")
spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
    "overwrite").save()
from daskberg_spark.operators.registry import table
for t in ("lineitem", "orders", "customer", "events", "documents",
          "embeddings"):
    try:
        table(spark, sf_dir, t).count()
    except Exception:
        pass
out = {}
for n in names:
    fn = qs.get(n)
    if fn is None:
        out[n] = None
        continue
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    out[n] = best
spark.stop()
print("ABRESULT " + json.dumps(out))
"""


def run_side(cwd: str, names: list[str], reps: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_NO_CONTROL="1")
    r = subprocess.run(
        [sys.executable, "-c", _RUNNER, json.dumps(names), str(reps), sf_dir],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1800,
    )
    for line in r.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-4000:] + "\n")
    raise RuntimeError(f"runner in {cwd} produced no result")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("commit")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    wt = os.path.join(REPO, ".ab_control_wt")
    subprocess.run(["git", "worktree", "remove", "--force", wt], cwd=REPO,
                   capture_output=True)
    shutil.rmtree(wt, ignore_errors=True)
    subprocess.run(["git", "worktree", "add", "--force", wt, args.commit],
                   cwd=REPO, check=True, capture_output=True)
    try:
        cur: dict[str, float] = {}
        ctl: dict[str, float] = {}
        for rnd in range(args.rounds):
            for label, cwd, acc in (("cur", REPO, cur), ("ctl", wt, ctl)):
                res = run_side(cwd, args.queries, args.reps, args.sf)
                for n, v in res.items():
                    if v is not None:
                        acc[n] = min(acc.get(n, float("inf")), v)
                print(f"round {rnd} {label}: "
                      + " ".join(f"{n}={v:.3f}s" for n, v in res.items()
                                 if v is not None),
                      file=sys.stderr)
        doc = {}
        for n in args.queries:
            if n in cur and n in ctl and ctl[n]:
                doc[n] = {"current": round(cur[n], 4),
                          "control": round(ctl[n], 4),
                          "ratio": round(cur[n] / ctl[n], 4)}
        print(json.dumps({"control_commit": args.commit, "ab": doc},
                         indent=1))
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)
        shutil.rmtree(wt, ignore_errors=True)


if __name__ == "__main__":
    main()
