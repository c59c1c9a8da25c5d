#!/usr/bin/env python3
"""Promote the probe-matched bench invocation to the committed sidecars.

r17 lesson: the repo's committed BENCH_FULL/BENCH_RUNS were whichever
Bench invocation ran LAST, and host ambient windows vary hugely across a
day (same code: 57.3 s vs 64.2 s battery totals in r17's three same-day
invocations). The fresh CDC throughput probe stamped on every bench line
(cdc_pipeline_events_per_sec) is SF-independent and fingerprints the
measurement window, so the comparable-across-rounds artifact is the
invocation whose probe is nearest the standing fingerprint (~56k
events/s on this host), not the newest one.

Usage:
    python3 tools/select_bench.py [--fingerprint 56000] [--apply]

Scans bench_archive/*/BENCH_FULL.json (written by graft.Bench per
invocation), reports each invocation's probe / battery total / ratio,
and with --apply copies the selected invocation's sidecars over the
repo-root BENCH_FULL.json, BENCH_RUNS.json and BENCH_LINE.json.
Tie-break (probes within 2% of each other): lower battery total.
"""
import argparse
import json
import shutil
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
DEFAULT_FINGERPRINT = 56000.0


def load_invocations(archive: Path):
    out = []
    for d in sorted(archive.iterdir()):
        full = d / "BENCH_FULL.json"
        if not full.is_file():
            continue
        try:
            line = json.loads(full.read_text())
        except json.JSONDecodeError:
            continue
        probe = float(line.get("cdc_pipeline_events_per_sec", -1))
        if probe <= 0:
            continue  # SKIP_PROBES run: no fingerprint, not selectable
        out.append({
            "sf": Path(line.get("sf", "")).name,
            "dir": d,
            "stamp": d.name,
            "probe": probe,
            "total": float(line.get("value", -1)),
            "ratio": float(line.get("spark_vs_duckdb", -1)),
            "n_queries": len(line.get("queries", {})),
            "errors": len(line.get("errors", {})),
            "git_head": line.get("git_head", ""),
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fingerprint", type=float, default=DEFAULT_FINGERPRINT,
                    help="reference fresh-probe events/s (default 56000)")
    ap.add_argument("--apply", action="store_true",
                    help="copy the selected sidecars to the repo root")
    ap.add_argument("--sf", default="sf0.1",
                    help="scale-factor basename the committed artifact "
                         "must have measured (default sf0.1)")
    ap.add_argument("--max-dist", type=float, default=0.10,
                    help="refuse to promote when even the nearest probe is "
                         "further than this fraction from the fingerprint "
                         "(default 0.10 — the noise protocol's ~10%% "
                         "comparability band)")
    ap.add_argument("--force", action="store_true",
                    help="promote past --max-dist anyway (records a "
                         "probe-mismatched window; do not use for the "
                         "committed round artifact)")
    ap.add_argument("--all-heads", action="store_true",
                    help="consider invocations from every git head, not "
                         "just the newest invocation's (pre-r19 behavior; "
                         "for inspection only)")
    args = ap.parse_args()

    archive = ROOT / "bench_archive"
    if not archive.is_dir():
        sys.exit("no bench_archive/ — run graft.Bench first")
    invs = [i for i in load_invocations(archive) if i["sf"] == args.sf]
    if not invs:
        sys.exit(f"no archived {args.sf} invocations with a probe fingerprint")

    # CODE segmentation (r19): the archive outlives a round, so an old
    # invocation can be probe-nearest while having measured LAST round's
    # code. Candidates are restricted to invocations stamped with the
    # SAME git head as the newest invocation (stamps are millis, so max
    # stamp = newest); legacy entries without a git_head stamp are
    # excluded once any stamped entry exists. Caveat: a dirty working
    # tree still maps to its underlying HEAD — re-run the bench after
    # committing if the tree changed since the archived invocation.
    if not args.all_heads:
        newest = max(invs, key=lambda i: int(i["stamp"]))
        if newest["git_head"]:
            same = [i for i in invs if i["git_head"] == newest["git_head"]]
            dropped = len(invs) - len(same)
            if dropped:
                print(f"(code segmentation: {dropped} invocation(s) from "
                      f"other git heads excluded; --all-heads overrides)")
            invs = same

    # full batteries only: an invocation that lost queries to errors must
    # not win on its artificially low total
    max_q = max(i["n_queries"] for i in invs)
    full = [i for i in invs if i["n_queries"] == max_q and i["errors"] == 0]
    pool = full if full else invs

    def distance(i):
        return abs(i["probe"] - args.fingerprint) / args.fingerprint

    best_d = min(distance(i) for i in pool)
    # tie band: probes within 2% of the nearest — pick the lowest total
    tied = [i for i in pool if distance(i) - best_d <= 0.02]
    pick = min(tied, key=lambda i: i["total"])

    for i in invs:
        mark = " <== selected" if i is pick else ""
        print(f"{i['stamp']}: probe={i['probe']:.0f} ev/s "
              f"(dist {distance(i)*100:.1f}%), battery={i['total']:.2f} s, "
              f"ratio={i['ratio']:.3f}, queries={i['n_queries']}, "
              f"errors={i['errors']}{mark}")

    if args.apply and best_d > args.max_dist and not args.force:
        sys.exit(f"REFUSED: nearest probe is {best_d*100:.1f}% from the "
                 f"{args.fingerprint:.0f} ev/s fingerprint (> "
                 f"{args.max_dist*100:.0f}%) — every archived window is "
                 "probe-mismatched. Re-run graft.Bench in a quieter window "
                 "(or pass --force to promote a mismatched one, which the "
                 "round record must then disclose).")
    if args.apply:
        shutil.copy(pick["dir"] / "BENCH_FULL.json", ROOT / "BENCH_FULL.json")
        shutil.copy(pick["dir"] / "BENCH_FULL.json", ROOT / "BENCH_LINE.json")
        runs = pick["dir"] / "BENCH_RUNS.json"
        if runs.is_file():
            shutil.copy(runs, ROOT / "BENCH_RUNS.json")
        print(f"\napplied {pick['stamp']} -> BENCH_FULL.json, "
              f"BENCH_LINE.json, BENCH_RUNS.json")
    else:
        print("\n(dry run — pass --apply to promote the selection)")


if __name__ == "__main__":
    main()
