"""Local replica of the driver's DuckDB-oracle correctness harness.

Runs every registered query through Spark AND its oracle SQL through
DuckDB on the same parquet fixtures, then compares row count, column
names, and order-insensitive values (columns sorted by name, rows sorted
by all columns).  Floats must match bit-exactly — the query conventions
(decimal-exact aggregation, see registry.py) are designed to make that
hold.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

# anchor imports on the REPO (the script's parent), not the CWD — the
# "local replica" must be runnable from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            first = df[c].dropna()
            if len(first) and isinstance(first.iloc[0], (list, np.ndarray, tuple)):
                df[c] = df[c].map(
                    lambda v: None if v is None else tuple(np.asarray(v).tolist())
                )
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rows: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    scols, ocols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if scols != ocols:
        problems.append(f"cols: spark={scols} oracle={ocols}")
        return problems
    if problems:
        return problems
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(ov):
            eq = (sv.isna() & ov.isna()) | (sv == ov)
            if not eq.all():
                bad = (~eq).sum()
                with np.errstate(all="ignore"):
                    maxdiff = float(np.nanmax(np.abs(sv - ov)))
                problems.append(f"col {c}: {bad} float mismatches, maxdiff={maxdiff:.3e}")
        else:
            sv2 = sv.astype(object).where(~pd.isna(sv), None)
            ov2 = ov.astype(object).where(~pd.isna(ov), None)
            neq = [
                i for i, (a, b) in enumerate(zip(sv2, ov2))
                if a != b and not (a is None and b is None)
            ]
            if neq:
                i = neq[0]
                problems.append(
                    f"col {c}: {len(neq)} mismatches, first@{i}: "
                    f"spark={sv2[i]!r} oracle={ov2[i]!r}"
                )
    return problems


def fixture_fingerprints(sf_dir: str) -> dict[str, str]:
    """Schema+rowcount hash per fixture table, embedded in the artifact so
    a result recorded against one fixture generation cannot silently pass
    for another (round-3 postmortem: the events ``ts`` column changed to
    TIMESTAMP_NTZ under a committed artifact whose streaming rows still
    said ok)."""
    import hashlib

    import pyarrow.parquet as pq

    out = {}
    for t in TABLES:
        try:
            f = pq.ParquetFile(f"{sf_dir}/{t}.parquet")
            key = f"{f.schema_arrow}|rows={f.metadata.num_rows}"
            out[t] = hashlib.md5(key.encode()).hexdigest()[:12]
        except Exception:
            out[t] = "absent"
    # on-disk ICEBERG fixtures too (the same staleness class: editing a
    # fixture builder without deleting .fixtures/<name> leaves Spark AND
    # the oracle reading identical stale files — both say ok against
    # data the code no longer describes).  Fingerprint = data file
    # names+sizes + pinned metadata version, zero decode.
    fixtures_root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".fixtures",
    )
    if os.path.isdir(fixtures_root):
        for name in sorted(os.listdir(fixtures_root)):
            base = os.path.join(fixtures_root, name)
            hint = os.path.join(base, "metadata", "version-hint.text")
            if not os.path.exists(hint):
                continue
            with open(hint) as f:
                ver = f.read().strip()
            listing = []
            data_dir = os.path.join(base, "data")
            for root, _dirs, files in os.walk(data_dir):
                for fn in sorted(files):
                    fp = os.path.join(root, fn)
                    listing.append(
                        f"{os.path.relpath(fp, base)}:{os.path.getsize(fp)}"
                    )
            key = f"v{ver}|" + "|".join(listing)
            out[f".fixtures/{name}"] = hashlib.md5(
                key.encode()
            ).hexdigest()[:12]
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    unknown = [f for f in flags if not f.startswith("--json=")]
    if unknown:
        # '--json out.json' (space form) would silently become a query
        # filter and a no-op success — refuse loudly instead
        print(f"unknown flag(s): {unknown}; use --json=PATH", file=sys.stderr)
        return 2
    json_out = next(
        (a.split("=", 1)[1] for a in flags if a.startswith("--json=")),
        None,
    )
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    if only and json_out:
        # a filtered run must never shadow a committed FULL-registry
        # artifact with a partial one — the artifact is cited as
        # full-registry evidence
        print(
            "--json with a query filter would record a PARTIAL artifact; "
            "run without query names to write one",
            file=sys.stderr,
        )
        return 2

    prints = fixture_fingerprints(sf_dir)
    if json_out and os.path.exists(json_out):
        # loud staleness check: a prior artifact for this path recorded
        # against different fixtures is about to be silently shadowed
        import json as _json

        try:
            with open(json_out) as f:
                prior = _json.load(f).get("fixture_fingerprints", {})
        except Exception:
            prior = {}
        changed = [t for t in prints if prior.get(t) not in (None, prints[t])]
        if changed:
            print(
                f"WARNING: fixture schema/rowcount changed since the prior "
                f"artifact for: {', '.join(sorted(changed))} — prior rows "
                f"were stale",
                file=sys.stderr,
            )

    import __spark_entry__ as entry_mod
    from daskberg_spark.session import get_spark

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    spark = get_spark("oracle-check", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        except duckdb.Error:
            # absent table (fixture_fingerprints already records it as
            # 'absent'): queries not touching it must still run; those
            # that do fail per-query with a clear oracle error
            print(f"note: {t}.parquet absent under {sf_dir}", file=sys.stderr)

    n_pass = n_fail = n_noracle = 0
    results: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            results[name] = {"status": "fail", "err": "spark error"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: no oracle (rows={len(spark_pdf)})")
            results[name] = {"status": "rows_only", "rows": len(spark_pdf)}
            n_noracle += 1
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL  {name}: oracle error\n{traceback.format_exc()}")
            results[name] = {"status": "fail", "err": "oracle error"}
            n_fail += 1
            continue
        try:
            problems = compare(name, spark_pdf, oracle_pdf)
        except Exception:
            # one unnormalizable result (map-typed column, exotic dtype)
            # must not abort the run and lose the artifact for every
            # other query
            print(f"FAIL  {name}: compare error\n{traceback.format_exc()}")
            results[name] = {"status": "fail", "err": "compare error"}
            n_fail += 1
            continue
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            results[name] = {"status": "fail", "err": "; ".join(problems)}
            n_fail += 1
        else:
            print(f"ok    {name} ({len(spark_pdf)} rows)")
            results[name] = {"status": "ok", "rows": len(spark_pdf)}
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail, {n_noracle} weak (no oracle)")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "fixture_fingerprints": prints,
                    "summary": {
                        "ok": n_pass,
                        "fail": n_fail,
                        "rows_only": n_noracle,
                    },
                    "queries": results,
                },
                f,
                indent=1,
            )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
