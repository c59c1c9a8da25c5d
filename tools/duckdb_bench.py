#!/usr/bin/env python3
"""Per-query DuckDB wall times for every oracle twin — the external
real-engine baseline the bench line's `spark_vs_duckdb` ratio is computed
against.

Usage: duckdb_bench.py <sfDir> <verifyOutDir> [outJson]

Reads <verifyOutDir>/oracle_sql.json (written by `graft.Verify` — run it
first, or pass a query filter that matches nothing to get just the SQL
dump), registers the fixture parquet tables as DuckDB views, then times
each oracle query with the SAME protocol as Bench.scala's battery: one
untimed warm-up pass, then min-of-3 timed runs (ambient noise is additive
on a warm in-memory workload, so the min is the estimator). Results are
fully fetched each run — timing a lazy cursor would measure parse time
only.

Writes [outJson] (default: repo-root DUCKDB_BASELINE.json, where
Bench.scala looks) with per-query seconds, total, and enough metadata
(sf basename, thread count, engine version) for the bench line to refuse
a baseline taken at a different scale factor.

Caveats recorded from prior rounds: a handful of oracle twins are written
for hash-parity, not speed (exact-tier forms of tiered queries, e.g. the
O(len^2) substring lambdas), so per-query ratios are honest only
query-by-query — the total is a summary, not a horse race on identical
plans.
"""
import hashlib
import json
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
RUNS = 3


def fixture_digest(sf_dir):
    """Content digest binding a baseline to the exact parquet it measured.

    md5 over "name:md5(bytes)\\n" lines in fixed TABLES order (existing
    files only). MUST stay in lockstep with Bench.scala's fixtureDigest —
    the bench refuses the spark_vs_duckdb ratio on mismatch, because a
    fixture regeneration (e.g. r10's ts MICROS-NTZ change) silently
    invalidates a stale baseline.
    """
    outer = hashlib.md5()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            outer.update(f"{t}:{hashlib.md5(p.read_bytes()).hexdigest()}\n".encode())
    return outer.hexdigest()


def main():
    sf_dir = sys.argv[1]
    out_dir = sys.argv[2]
    out_json = sys.argv[3] if len(sys.argv) > 3 else str(Path(__file__).resolve().parent.parent / "DUCKDB_BASELINE.json")
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    threads = con.execute("SELECT current_setting('threads')").fetchone()[0]
    queries, errors = {}, {}
    for name, sql in sorted(oracle.items()):
        try:
            con.execute(sql).fetchall()  # warm-up: parquet footers, OS page cache
            best = None
            for _ in range(RUNS):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            queries[name] = round(best, 4)
            print(f"{name}: {best:.3f}s", flush=True)
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {str(e)[:200]}"
            print(f"ERROR {name}: {errors[name]}", flush=True)
    doc = {
        "engine": f"duckdb {duckdb.__version__}",
        "threads": int(threads),
        "sf": Path(sf_dir).name,
        "generated_at": datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
        "fixture_digest": fixture_digest(sf_dir),
        "protocol": f"warm-up + min-of-{RUNS}, full fetchall",
        "n_queries": len(queries),
        "total_secs": round(sum(queries.values()), 4),
        "errors": errors,
        "queries": queries,
    }
    Path(out_json).write_text(json.dumps(doc, indent=1, sort_keys=True) + "\n")
    print(f"== {len(queries)} queries, total {doc['total_secs']:.2f}s -> {out_json} ==")


if __name__ == "__main__":
    main()
