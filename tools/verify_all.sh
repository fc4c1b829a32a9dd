#!/usr/bin/env bash
# Full local replay of the driver's correctness gate at BOTH scales.
#
# sf0.01 is the driver's own gate scale; sf0.1 is where ties, overflow
# paths and plan changes (AQE thresholds, broadcast decisions) can differ
# from sf0.01 — q_ks_drift-class discrepancies only surfaced at the
# driver until round 10 because local checks ran at sf0.01 alone. Run
# this once per round before the snapshot (sf0.1 adds ~2-4 min).
#
# An arbitrary lake directory (e.g. a ScaleGen output like target/sf1)
# replays the same gate at that scale — check.py handles both the
# driver's single-file tables and ScaleGen's directory tables. The
# round-13 sf1 replay (200/201, COVERAGE.md) ran through exactly this.
#
# Usage: tools/verify_all.sh [sf0.01|sf0.1|both(default)|<lakeDir>]
set -euo pipefail
cd "$(dirname "$0")/.."

run_one() {
  local dir="$1" out
  out="/tmp/verify_$(basename "${dir//./_}")"
  echo "=== Verify + oracle check @ $dir ==="
  sbt -batch "runMain graft.Verify $dir $out"
  python3 tools/check.py "$out" "$dir"
}

case "${1:-both}" in
  sf0.01) run_one /root/testdata/sf0.01 ;;
  sf0.1)  run_one /root/testdata/sf0.1 ;;
  both)   run_one /root/testdata/sf0.01; run_one /root/testdata/sf0.1 ;;
  *)
    if [ -d "$1" ]; then run_one "$1"
    else echo "usage: $0 [sf0.01|sf0.1|both|<lakeDir>]" >&2; exit 2; fi ;;
esac
