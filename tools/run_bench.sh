#!/usr/bin/env bash
# The single bench command (r18 verdict task 5): run one full Bench
# battery at sf0.1, then promote the probe-matched archived invocation to
# the committed sidecars (BENCH_FULL/BENCH_RUNS/BENCH_LINE). Selection is
# automatic — select_bench.py picks the archived window whose fresh CDC
# probe is nearest the standing host fingerprint (~56k events/s) and
# REFUSES promotion when every window is >10% off, so a forgotten manual
# step can no longer commit a weather-distorted artifact (the r17 hole).
#
# Usage: tools/run_bench.sh [sf-dir]   (default /root/testdata/sf0.1)
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.1}"
SPARK_GRAFT_SF_DIR="$SF_DIR" sbt -batch "runMain graft.Bench" \
  | grep '"metric"' || true
python3 tools/select_bench.py --sf "$(basename "$SF_DIR")" --apply
