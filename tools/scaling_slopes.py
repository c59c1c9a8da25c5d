#!/usr/bin/env python3
"""Cross-SF scaling-slope table (r10 verdict task 1): join per-query Bench
timings taken at several scale factors into a slope table that separates
fixed per-query overhead from data-proportional cost.

Usage: scaling_slopes.py <bench_sf0.001.json> <bench_sf0.01.json> <bench_sf0.1.json>

Each input is one Bench JSON line (the `queries` map keyed by family
code). The interesting number per query is

    slope = (t_0.1 - t_0.001) / (t_0.01 - t_0.001)

i.e. the ratio of DATA-DRIVEN time across the last 10x step after
subtracting the sf0.001 run as the per-query fixed-overhead estimate
(at sf0.001 virtually every query is pure overhead: planning, task
launch, codegen — the data is ~600 rows). slope ~= 10 is linear in data;
slope >> 10 is super-linear and needs an explanation; slope < 3 means
the query is still overhead-dominated even at sf0.1 (reported as
'flat'). Raw ratios t_0.1/t_0.01 are also printed for the
overhead-free comparison the naive reading would make.

Output: a markdown table (stdout) sorted by slope descending, plus a
summary of queries classified {super-linear, linear, flat}.
"""
import json
import sys


def load(path):
    with open(path) as f:
        text = f.read()
    # tolerate sbt's "[info] " line prefix
    doc = json.loads(text[text.index("{"):])
    return doc["queries"]


def main():
    t1, t2, t3 = (load(p) for p in sys.argv[1:4])
    names = sorted(set(t1) & set(t2) & set(t3))
    missing = sorted((set(t1) | set(t2) | set(t3)) - set(names))
    if missing:
        print(f"<!-- not in all three runs, skipped: {', '.join(missing)} -->")
    rows = []
    for n in names:
        a, b, c = t1[n], t2[n], t3[n]
        d2, d3 = b - a, c - a
        slope = d3 / d2 if d2 > 0.005 else float("inf") if d3 > 0.1 else 0.0
        raw = c / b if b > 0 else float("nan")
        # Classification is on the RAW 10x-step ratio: the adjusted slope
        # explodes whenever t(0.01) ~= t(0.001) (both pure overhead, the
        # denominator is timing noise), so it is a diagnostic column, not
        # the verdict. At a 10x data step: raw <= ~4 means the query is
        # still mostly fixed overhead even at sf0.1 (sublinear); ~10 is
        # linear in data; above ~13 the data term grows FASTER than the
        # data — the thing this audit exists to catch.
        if d3 < 0.15:
            cls = "overhead-bound"
        elif raw <= 4:
            cls = "sublinear"
        elif raw <= 13:
            cls = "linear"
        else:
            cls = "super-linear"
        rows.append((n, a, b, c, slope, raw, cls))
    rows.sort(key=lambda r: -r[5])
    print("| query | t(0.001)s | t(0.01)s | t(0.1)s | slope (overhead-adj, 10x data) | raw t0.1/t0.01 | class |")
    print("|---|---|---|---|---|---|---|")
    for n, a, b, c, slope, raw, cls in rows:
        s = "inf" if slope == float("inf") else f"{slope:.1f}"
        print(f"| {n} | {a:.3f} | {b:.3f} | {c:.3f} | {s} | {raw:.2f} | {cls} |")
    from collections import Counter
    counts = Counter(r[6] for r in rows)
    total = {k: sum(r[3] for r in rows if r[6] == k) for k in counts}
    print()
    print(f"<!-- {len(rows)} queries: " + ", ".join(
        f"{k}={v} ({total[k]:.1f}s at sf0.1)" for k, v in sorted(counts.items())) + " -->")


if __name__ == "__main__":
    main()
