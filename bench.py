"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>}

Each query is forced with the `noop` sink (full computation, no driver
materialization) so timings measure the plan, not collect().
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "count_distinct",
    "cube_agg",
    "join_multi",
    "join_left",
    "window_rank",
    "window_running",
    # topk_orders retired in r11: 0.15 s at sf0.1 — pure noise scale
    # (its r10 control "1.35x" was 0.15->0.20 s), and the stdout line
    # budget needed the room for q9_cbo_star.  Still oracle-checked.
    "events_sessionize",
    "events_hourly",
    "json_functions",
    "q3_shipping_priority",
    # (q6_forecast_revenue retired in r14: 0.25 s at sf0.1 — noise
    # scale; the stdout line budget needed the room for
    # iceberg_maintain_stats_onepass.  Still oracle-checked, and the
    # single-scan agg family keeps q1/q3 timed here.)
    "asof_join",
    # (iceberg_lineitem_month_prune retired in r12: 0.20 s at sf0.1 —
    # noise scale; the stdout line budget needed the room for
    # iceberg_quantile_refresh.  It rotated into the r12 driver window,
    # so its correctness evidence strictly improves.)
    # (iceberg_lineitem_stats_prune retired in r11 session 3: 0.11 s at
    # sf0.1 — noise scale; the stdout line budget needed the room for
    # iceberg_rollup_incremental.  Stays driver-window + oracle checked,
    # and month_prune keeps the prune family timed here.)
    # Tier-C (registered as implemented)
    "dedup_exact",
    "dedup_minhash_candidates",
    # (text_stats retired in r14: 0.26 s at sf0.1 — noise scale; line
    # budget for iceberg_maintain_stats_onepass.  Still oracle-checked;
    # text_quality keeps the C4 single-scan family timed here.)
    "text_quality",
    "langid_heuristic",
    "similarity_topk",
    # expensive Tier-C compositions + v2 delete read (round-1 verdict 7)
    "pipeline_dedup_corpus",
    "dedup_connected_components",
    "iceberg_v2_row_deletes",
    # round 3: five-way star join, benchmark decontamination sweep,
    # deterministic sampling
    "q9_product_type_profit",
    "decontaminate_ngram_overlap",
    "sample_deterministic",
    # round 3 (late): block-level dedup census, unigram-LM quality
    # scoring, z-curve integer map (whole-stage-codegen throughput probe)
    "dedup_chunks_exact",
    "quality_unigram_meanprob",
    "zorder_cluster_stats",
    # deterministic sketches: HLL's 256-group shuffle vs exact distinct
    "approx_distinct_hll",
    "approx_quantiles_histogram",
    # round 4: BPE serving path (rank-dict + word-memo encode; the cost
    # left is the 20-round training loop), the nested-type read, and the
    # count-min heavy-hitter sketch
    "bpe_encode_corpus",
    "approx_topk_countmin",
    # round 5: sequence-classed delete read on the foreign-style fixture,
    # and the two heaviest TPC-H tail shapes rotated into the driver
    # window this round
    "iceberg_foreign_read",
    "q10_returned_items",
    "q18_large_volume",
    # round 6: the flattened merge-on-read delete read (one tagged scan +
    # one sequence-keyed anti-join per key set, flat in #delete-commits)
    # and the v3 deletion-vector read (executor-side puffin decode)
    "iceberg_mor_delete_read",
    # (iceberg_dv_delete_read retired in r11 session 3: 0.17 s at sf0.1
    # — noise scale; the line budget needed the room for
    # iceberg_join_rollup.  Stays oracle + pytest checked, and the
    # delete family keeps mor_delete_read / merge_mor /
    # delete_where_fast timed here.)
    # round 7: merge-on-read MERGE (DV tombstones + appended updates in
    # one commit — O(matched rows) write amplification)
    "iceberg_merge_mor",
    # round 8: the blind-upsert lifecycle (eq-delete upsert → compaction
    # → dangling-delete cleanup, the CDC-apply maintenance loop) and the
    # cluster-then-prune semantic dedup over embeddings
    "iceberg_remove_dangling",
    "semdedup_prune",
    # round 9: multi-format scan (native parquet + native ORC + python
    # AVRO legs in one plan)
    "iceberg_multiformat_read",
    # round 9 (late): cross-document span dedup — gram index + island
    # merge + position anti-join + ordered-listagg reassembly
    "span_dedup_trim",
    # round 9, session 2: stats/partition-aligned DELETE (tombstones +
    # boundary DVs in one commit) and hash-distributed one-call write
    "iceberg_delete_where_fast",
    "iceberg_write_distribution",
    # (iceberg_variant_write / iceberg_variant_shredded_prune retired in
    # r11 session 2: ~0.1 s micro-entries whose cost is uninformative at
    # sf0.1 — the stdout line budget needed the room for the three new
    # text/search entries below.  Both stay driver-window + oracle
    # checked.)
    # round 10, session 2: metadata-only aggregates (zero data files),
    # the file-level Bloom index point lookup (7/83 files where bounds
    # prune nothing), and the runtime Bloom join prefilter.
    # (filter_project / iceberg_nested_read retired in session 2, and
    # training_shards / iceberg_agg_pushdown in session 3 — each a
    # sub-0.2 s entry whose cost is uninformative (agg_pushdown is a
    # metadata no-op that hard-asserts zero files INSIDE the query) —
    # to keep the driver-parsed stdout line under its tail budget;
    # BENCH_CONTROL_DETAIL.json still carries full per-query ratios.)
    "iceberg_bloom_index_prune",
    "bloom_filter_join",
    # round 10, session 3: the distributed three-format write→read
    # lifecycle (native parquet/ORC commits + executor-task AVRO with
    # in-task stats) and the stats-ordered star join (theta NDVs +
    # manifest counts feeding the containment estimator).
    # (iceberg_theta_ndv itself is a pure-metadata readout — micro-cost,
    # uninformative here; its correctness lives in the driver window.)
    "iceberg_write_formats",
    # (iceberg_cbo_join retired in r11 session 2: 0.15 s micro-entry;
    # q9_cbo_star is the CBO's real-scale bench witness)
    # round 11: the Q9-shaped star planned end-to-end by the CBO over
    # this engine's own stats-bearing tables (compare q9_product_type
    # _profit, the literal-order parquet variant above)
    "q9_cbo_star",
    # round 11, session 2: keyword search through the token Bloom index
    # (plan-time shard pruning + tokenized residual), the Gopher
    # repetition filters (two explode→gram-agg legs), and BM25 ranking
    # (one scan + a single-row broadcast aggregate + TakeOrdered)
    "iceberg_token_search",
    "gopher_repetition_filters",
    "keyword_rank_bm25",
    # round 11, session 3: the incremental-materialized-rollup lifecycle
    # (source write → append → MOR delete → changelog-delta refresh —
    # the IVM maintenance loop; the sum pushdown itself is a metadata
    # no-op benched nowhere, its correctness lives in the driver window)
    # and its star-join twin (fact writes → MOR delete → ΔF ⋈ D_new
    # refresh; r12 extends the lifecycle with an SCD dim update served
    # by the F_old ⋈ ΔD leg — one more refresh per run, so r11→r12
    # ratios for this entry are lifecycle growth, not regression)
    "iceberg_rollup_incremental",
    "iceberg_join_rollup",
    # round 12: the mergeable quantile-statistics maintenance loop
    # (bootstrap per-file CDF partials → O(new files) append refresh →
    # dirty-leg delete refresh → driver-side CDF merge)
    "iceberg_quantile_refresh",
    # round 13: the grouped-NDV maintenance loop (per-file grouped
    # theta partials → O(new files) union refresh → dirty-leg
    # delete-aware rescan), closing the last full-rebuild-only
    # statistics family.  Lifecycle entries now also report per-phase
    # build/refresh seconds to BENCH_PHASES.json / the control detail.
    "iceberg_ndv_refresh",
    # round 14: ONE-SCAN nightly maintenance — all six statistics
    # families (blooms, sums, global/grouped NDV, global/grouped
    # quantiles) refreshed from one shared raw read + one shared
    # delete-aware read per maintain(), zero per-family re-reads
    # (hard-asserted inside the query)
    "iceberg_maintain_stats_onepass",
]


def time_rewrite_manifests() -> float:
    """Time the rewrite_manifests ACTION (not just the planning delta it
    buys, which SCALING.md already measures): consolidate an 80-commit
    manifest list to O(1) manifests.  Metadata-only — zero data IO — so
    this is pure Avro read/rewrite + one commit; min-of-3 over fresh
    tables (the action is one-shot per table)."""
    import tempfile

    from daskberg_spark.iceberg.writer import IcebergWriter, rewrite_manifests

    schema = [
        {"id": 1, "name": "id", "type": "long", "required": False},
        {"id": 2, "name": "v", "type": "double", "required": False},
    ]
    best = float("inf")
    for _ in range(3):
        path = tempfile.mkdtemp(prefix="bench_rw_manifests_")
        w = IcebergWriter(path, schema)
        for c in range(80):
            w.append([{"id": c, "v": float(c)}])
        t0 = time.perf_counter()
        assert rewrite_manifests(w) is not None
        best = min(best, time.perf_counter() - t0)
    return best


# One subprocess side of the interleaved control pass: time the named
# queries (min over reps, lifecycle phase splits from the best rep) in a
# fresh JVM and print one JSON line.  Shared verbatim by the current-code
# side (repo cwd) and the control side (worktree cwd) so the two sides
# differ ONLY in the code under test.
_CONTROL_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
sf_dir = sys.argv[1]
import __spark_entry__ as entry_mod
from daskberg_spark.session import get_spark
qs = entry_mod.queries()
spark = get_spark("bench-control")
spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
    "overwrite").save()
from daskberg_spark.operators.registry import table
for t in ("lineitem", "orders", "customer", "events", "documents",
          "embeddings"):
    try:
        table(spark, sf_dir, t).count()
    except Exception:
        pass
try:
    from daskberg_spark.operators import benchphases
except Exception:
    benchphases = None
# Loop mode (r15 verdict item 4): one request line per batch-round —
# {"names": [...], "reps": N} — so ONE long-lived JVM serves every
# interleaved round.  Codegen caches persist across rounds, so later
# rounds measure steady state with reps=1; stdout stays line-framed.
print("CTRLREADY", flush=True)
for req_line in sys.stdin:
    req_line = req_line.strip()
    if not req_line:
        continue
    req = json.loads(req_line)
    names, reps = req["names"], int(req["reps"])
    out, phases = {}, {}
    for n in names:
        if n == "maint_rewrite_manifests":
            try:
                import bench as bench_mod
                out[n] = bench_mod.time_rewrite_manifests()
            except Exception:
                out[n] = None
            continue
        fn = qs.get(n)
        if fn is None:
            out[n] = None
            continue
        best = float("inf")
        for _ in range(reps):
            if benchphases is not None:
                benchphases.reset(n)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            took = time.perf_counter() - t0
            if took < best:
                best = took
                if benchphases is not None:
                    snap = benchphases.snapshot(n)
                    if snap:
                        phases[n] = {
                            k: round(v, 4) for k, v in snap.items()
                        }
        out[n] = best
    print("CTRLRESULT " + json.dumps({"queries": out, "phases": phases}),
          flush=True)
spark.stop()
"""


class _ControlProc:
    """One persistent runner-side of the interleaved control pass.

    Wraps a subprocess running ``_CONTROL_RUNNER`` in ``cwd`` (repo for
    the current side, worktree for the control side).  ``request``
    sends one batch-round and blocks (with a deadline) for its result
    line, so the parent can alternate sides within the same few-minute
    window without paying a JVM start per batch-round."""

    def __init__(self, cwd: str, sf_dir: str) -> None:
        import subprocess

        env = dict(
            os.environ, SPARK_GRAFT_NO_CONTROL="1",
            SPARK_GRAFT_SF_DIR=sf_dir,
        )
        self.proc = subprocess.Popen(
            [sys.executable, "-c", _CONTROL_RUNNER, sf_dir],
            cwd=cwd, env=env, stdin=subprocess.PIPE,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        self._expect("CTRLREADY", timeout=300)

    def _expect(self, prefix: str, timeout: float) -> str:
        import select

        deadline = time.monotonic() + timeout
        while True:
            remain = deadline - time.monotonic()
            if remain <= 0:
                raise RuntimeError(f"control runner timed out ({prefix})")
            ready, _, _ = select.select(
                [self.proc.stdout], [], [], min(remain, 5.0)
            )
            if not ready:
                if self.proc.poll() is not None:
                    raise RuntimeError("control runner exited early")
                continue
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError("control runner closed stdout")
            if line.startswith(prefix):
                return line

    def request(self, names: list[str], reps: int) -> dict:
        self.proc.stdin.write(json.dumps({"names": names, "reps": reps}) + "\n")
        self.proc.stdin.flush()
        line = self._expect("CTRLRESULT ", timeout=900)
        return json.loads(line[len("CTRLRESULT "):])

    def close(self) -> None:
        try:
            self.proc.stdin.close()
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()


# Interleaving granularity of the control pass.  Smaller batches bound
# the window in which host drift can skew a current-vs-control pair (a
# pair is measured within ~1-3 min of each other).
_CONTROL_BATCH = 9
# Rounds per batch (r15 verdict item 4: >=3 interleaved rounds with
# min-over-rounds — 2 reps per side per batch was too few on a host
# with minute-scale 2.2x throttle oscillation; it flagged untouched
# code at up to 4x).  Round 1 runs _CONTROL_REPS in-process reps (first
# pays codegen); later rounds run 1 rep each in the SAME long-lived
# JVM (codegen already cached), each in a fresh time window.  A ratio
# now needs one side disadvantaged in every window to be spurious.
# 4 rounds with the lead side alternating per round (see below) give
# each side two LEADING and two FOLLOWING windows.
_CONTROL_ROUNDS = 4
_CONTROL_REPS = 2


def run_prior_control(sf_dir: str) -> dict | None:
    """Same-session drift control, INTERLEAVED per batch (r14 verdict
    item 1): time the PRIOR round's code — a git worktree at the commit
    that recorded the latest BENCH_r*.json — against the CURRENT code on
    this host, right now, alternating current/control subprocesses per
    ~9-query batch (fresh JVM each side, min over in-process reps).

    The previous shape (current suite, then ONE control suite) let
    suite-level host drift land entirely on one side: three same-day r14
    closing runs against the SAME control read 1.239 / 0.843 / 1.183,
    and every per-query flag it raised (15 in r14, up to 1.52×) was
    exonerated by isolated A/Bs.  Interleaving bounds each
    current-vs-control pair to the same few-minute window, so
    ``control_ratios`` are attributable by construction.  The stdout
    line's ``queries`` map keeps the unchanged in-process min-of-3
    methodology; only the CONTROL COMPARISON uses the interleaved pass
    (both sides of every ratio come from identical subprocess
    conditions).  The control subprocesses run with
    SPARK_GRAFT_NO_CONTROL=1 so they cannot recurse.  Returns
    {"commit", "source", "queries", "phases", "current_queries",
    "current_phases", "mode"} or None (no prior bench, git trouble, or
    control failure — all non-fatal)."""
    if os.environ.get("SPARK_GRAFT_NO_CONTROL"):
        return None
    import glob as _glob
    import shutil
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    benches = sorted(_glob.glob(os.path.join(repo, "BENCH_r*.json")))
    if not benches:
        return None
    latest = os.path.basename(benches[-1])
    wt = os.path.join(repo, ".bench_control_wt")
    try:
        commit = subprocess.run(
            ["git", "log", "-n1", "--format=%H", "--", latest],
            cwd=repo, capture_output=True, text=True, timeout=30,
        ).stdout.strip()
        if not commit:
            return None
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=repo, capture_output=True,
        )
        shutil.rmtree(wt, ignore_errors=True)
        r = subprocess.run(
            ["git", "worktree", "add", "--force", wt, commit],
            cwd=repo, capture_output=True, text=True, timeout=60,
        )
        if r.returncode:
            return None
        procs: list[_ControlProc] = []
        try:
            all_names = HEADLINE + ["maint_rewrite_manifests"]
            batches = [
                all_names[i: i + _CONTROL_BATCH]
                for i in range(0, len(all_names), _CONTROL_BATCH)
            ]
            cur_proc = _ControlProc(repo, sf_dir)
            procs.append(cur_proc)
            ctl_proc = _ControlProc(wt, sf_dir)
            procs.append(ctl_proc)
            cur_q: dict[str, float] = {}
            ctl_q: dict[str, float] = {}
            cur_ph: dict[str, dict] = {}
            ctl_ph: dict[str, dict] = {}
            for rnd in range(_CONTROL_ROUNDS):
                reps = _CONTROL_REPS if rnd == 0 else 1
                # Alternate which side leads each round: the leading
                # side of a pair pays any cold-path cost (page cache,
                # JIT re-tiering) that the follower then rides, so a
                # fixed order biases every ratio the same way — the
                # closing r16 run measured untouched code at up to
                # 1.33x with current always leading, while fresh-JVM
                # isolated A/Bs read ~1.0.  With the lead alternating,
                # min-over-rounds takes each side's best FOLLOWING
                # window and the bias cancels.
                sides = [
                    (cur_proc, cur_q, cur_ph),
                    (ctl_proc, ctl_q, ctl_ph),
                ]
                if rnd % 2:
                    sides.reverse()
                for batch in batches:
                    # rewrite_manifests is already min-of-3 over fresh
                    # tables inside one call — once is enough.
                    if rnd > 0:
                        batch = [
                            n for n in batch
                            if n != "maint_rewrite_manifests"
                        ]
                        if not batch:
                            continue
                    for proc, q_acc, ph_acc in sides:
                        res = proc.request(batch, reps)
                        for n, v in (res.get("queries") or {}).items():
                            if v is None:
                                continue
                            if n not in q_acc or v < q_acc[n]:
                                q_acc[n] = round(v, 4)
                                ph = (res.get("phases") or {}).get(n)
                                if ph:
                                    ph_acc[n] = ph
            if not ctl_q:
                return None
            return {
                "commit": commit,
                "source": latest,
                "queries": ctl_q,
                "phases": ctl_ph,
                "current_queries": cur_q,
                "current_phases": cur_ph,
                "mode": "interleaved-batch-rounds",
            }
        finally:
            for p in procs:
                try:
                    p.close()
                except Exception:
                    pass
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=repo, capture_output=True,
            )
            shutil.rmtree(wt, ignore_errors=True)
    except Exception:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import re as _re

    m = _re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    import __spark_entry__ as entry_mod
    from daskberg_spark.session import get_spark

    queries = entry_mod.queries()
    spark = get_spark("bench")

    # Warm the JVM/codegen path and the FS cache (footer reads) once.
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    from daskberg_spark.operators.registry import table

    for name in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        try:
            table(spark, sf_dir, name).count()
        except Exception:
            pass

    from daskberg_spark.operators import benchphases

    timings: dict[str, float] = {}
    phases: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        best = float("inf")
        for _ in range(3):  # min of 3: first run pays codegen, rest steady-state
            benchphases.reset(name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            took = time.perf_counter() - t0
            if took < best:
                best = took
                snap = benchphases.snapshot(name)
                if snap:  # lifecycle entries report build/refresh splits
                    phases[name] = {k: round(v, 4) for k, v in snap.items()}
        timings[name] = round(best, 4)

    timings["maint_rewrite_manifests"] = round(time_rewrite_manifests(), 4)

    # Per-phase lifecycle detail goes to a side file in cwd so the
    # control subprocess (next round's bench running THIS code in a
    # worktree) exposes its own splits for like-for-like comparison —
    # the stdout line budget stays untouched.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_PHASES.json"),
            "w",
        ) as f:
            json.dump(phases, f, indent=1)
    except OSError:
        pass

    # round-over-round deltas vs the latest BENCH_r*.json, to stderr so
    # stdout stays the single JSON line the driver parses
    import glob as _glob

    prior_files = sorted(_glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")))
    if prior_files:
        try:
            with open(prior_files[-1]) as f:
                prior_doc = json.load(f)
            # driver artifacts wrap the bench line under "parsed"
            prior = (prior_doc.get("parsed") or prior_doc).get("queries", {})
            shared = [n for n in timings if n in prior]
            print(f"-- deltas vs {os.path.basename(prior_files[-1])} --", file=sys.stderr)
            for n in shared:
                r = timings[n] / prior[n] if prior[n] else float("inf")
                print(f"  {n:35s} {prior[n]:7.3f}s -> {timings[n]:7.3f}s  ({r:.2f}x)", file=sys.stderr)
            tot_prior = sum(prior[n] for n in shared)
            tot_now = sum(timings[n] for n in shared)
            print(
                f"  shared-subset total {tot_prior:.2f}s -> {tot_now:.2f}s "
                f"({tot_now / tot_prior if tot_prior else 0:.2f}x)",
                file=sys.stderr,
            )
        except Exception:
            pass

    spark.stop()

    doc = {
        "metric": "headline_suite_seconds",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    control = run_prior_control(sf_dir)
    if control:
        # Ratios pair the INTERLEAVED current-side timings with the
        # control side (same subprocess conditions, same few-minute
        # window — r14 verdict item 1); the in-process ``timings`` on
        # the stdout line keep the unchanged round-over-round
        # methodology.  Fall back to in-process timings only if the
        # interleaved current side is missing a name.
        cur_side = {**timings, **(control.get("current_queries") or {})}
        shared = [n for n in cur_side if n in control["queries"]]
        ctrl_total = sum(control["queries"][n] for n in shared)
        cur_total = sum(cur_side[n] for n in shared)
        # Per-query control timings + current/control ratios (r7 verdict
        # item 2) go to a SIDE FILE, not the stdout line: round 8 put
        # both maps on the JSON line, which pushed it past the driver's
        # 2000-char tail capture and BENCH_r08.json recorded
        # "parsed": null.  The stdout line keeps only the one-number
        # drift summary; BENCH_CONTROL_DETAIL.json carries the full
        # localization maps for the judge.
        ratios = {
            n: round(cur_side[n] / control["queries"][n], 4)
            for n in shared
            if control["queries"][n]
        }
        # Lifecycle entries compare REFRESH phases only when both sides
        # expose splits (r12 verdict item 4: the build is fixture cost,
        # and a legitimately-grown lifecycle otherwise reads as a
        # phantom name-to-name regression needing manual exoneration).
        # Both sides' phases come from the interleaved pass when
        # available, the in-process snapshot otherwise.
        ctrl_phases = control.get("phases") or {}
        cur_phases = {**phases, **(control.get("current_phases") or {})}
        refresh_ratios = {}
        for n, ph in cur_phases.items():
            cur_r = ph.get("refresh")
            ctl_r = (ctrl_phases.get(n) or {}).get("refresh")
            if cur_r and ctl_r:
                refresh_ratios[n] = round(cur_r / ctl_r, 4)
        detail = {
            "control_commit": control["commit"][:12],
            "control_source": control["source"],
            "control_mode": control.get("mode", "sequential"),
            "control_prior_round_sec": round(ctrl_total, 4),
            "control_shared_current_sec": round(cur_total, 4),
            "bench_vs_control_ratio": (
                round(cur_total / ctrl_total, 4) if ctrl_total else None
            ),
            "control_queries": control["queries"],
            "interleaved_current_queries": control.get(
                "current_queries"
            ) or {},
            "control_ratios": ratios,
            "phases": phases,
            "interleaved_current_phases": control.get(
                "current_phases"
            ) or {},
            "control_phases": ctrl_phases,
            "lifecycle_refresh_ratios": refresh_ratios,
        }
        repo = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(repo, "BENCH_CONTROL_DETAIL.json"), "w") as f:
            json.dump(detail, f, indent=1)
        doc.update(
            {
                "bench_vs_control_ratio": detail["bench_vs_control_ratio"],
                "control": "BENCH_CONTROL_DETAIL.json",
            }
        )
        print(
            f"-- same-session control: prior code ({control['source']} @ "
            f"{control['commit'][:12]}) {ctrl_total:.2f}s vs current "
            f"{cur_total:.2f}s on {len(shared)} shared queries "
            f"(ratio {cur_total / ctrl_total:.3f}) --"
            if ctrl_total
            else "-- control produced no shared timings --",
            file=sys.stderr,
        )
        hot = {n: r for n, r in ratios.items() if r >= 1.15}
        if hot:
            print("-- control ratios >= 1.15x --", file=sys.stderr)
            for n, r in sorted(hot.items(), key=lambda kv: -kv[1]):
                note = ""
                if n in refresh_ratios:
                    note = (
                        f"  [refresh-only {refresh_ratios[n]:.2f}x — "
                        "total includes fixture build]"
                    )
                elif n in phases:
                    note = "  [lifecycle entry; control has no phase split]"
                print(
                    f"  {n:35s} {control['queries'][n]:7.3f}s -> "
                    f"{cur_side[n]:7.3f}s  ({r:.2f}x){note}",
                    file=sys.stderr,
                )
    line = json.dumps(doc)
    if len(line) > 1900:
        # The driver captures only the last ~2000 chars of output and
        # parses the JSON line out of that window (BENCH_r08.json went
        # "parsed": null when the line outgrew it).  Degrade gracefully:
        # tighter rounding first, then drop the optional control fields —
        # the spec-required metric/value/unit/queries/sf always survive.
        doc["queries"] = {n: round(v, 3) for n, v in timings.items()}
        line = json.dumps(doc)
        if len(line) > 1900:
            doc.pop("control", None)
            doc.pop("bench_vs_control_ratio", None)
            line = json.dumps(doc)
    print(line)


if __name__ == "__main__":
    main()
