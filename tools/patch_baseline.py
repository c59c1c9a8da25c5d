#!/usr/bin/env python3
"""Patch DUCKDB_BASELINE.json entries for CHANGED oracle twins.

The standing r18 protocol: when an optimization changes a twin's SQL
text (results identical — the oracle gate enforces that separately),
re-time ONLY the changed twins plus a few UNCHANGED control twins in
the same window (to detect an ambient-shifted window), each in a FRESH
DuckDB connection (heavy twins inflate each other inside one
connection), min-of-RUNS like duckdb_bench.py, and patch the entries
in place with the deltas disclosed on stdout (paste them into the round
record).

Usage: patch_baseline.py <sfDir> <verifyOutDir> <changed...> [--control q1_pricing_summary,...]
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
RUNS = 3


def time_query(sf_dir, sql):
    con = duckdb.connect()  # fresh connection per twin (protocol)
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    con.execute(sql).fetchall()  # warm-up
    best = None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    con.close()
    return round(best, 4)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    controls = []
    if "--control" in rest:
        i = rest.index("--control")
        controls = rest[i + 1].split(",")
        rest = rest[:i]
    changed = rest
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    bl_path = Path(__file__).resolve().parent.parent / "DUCKDB_BASELINE.json"
    doc = json.loads(bl_path.read_text())
    qs = doc["queries"]
    for name in controls:
        t = time_query(sf_dir, oracle[name])
        old = qs.get(name)
        print(f"CONTROL {name}: committed {old}s, this window {t}s "
              f"({t/old:.2f}x)" if old else f"CONTROL {name}: {t}s")
    for name in changed:
        t = time_query(sf_dir, oracle[name])
        old = qs.get(name)
        qs[name] = t
        print(f"PATCH {name}: {old}s -> {t}s")
    doc["total_secs"] = round(sum(qs.values()), 4)
    doc["n_queries"] = len(qs)
    bl_path.write_text(json.dumps(doc, indent=1, sort_keys=True) + "\n")
    print(f"== total now {doc['total_secs']:.2f}s over {doc['n_queries']} queries ==")


if __name__ == "__main__":
    main()
