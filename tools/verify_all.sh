#!/usr/bin/env bash
# Full local replay of the driver's correctness gate at BOTH scales.
#
# sf0.01 is the driver's own gate scale; sf0.1 is where ties, overflow
# paths and plan changes (AQE thresholds, broadcast decisions) can differ
# from sf0.01 — q_ks_drift-class discrepancies only surfaced at the
# driver until round 10 because local checks ran at sf0.01 alone. Run
# this once per round before the snapshot (sf0.1 adds ~2-4 min).
#
# Usage: tools/verify_all.sh [sf0.01|sf0.1|both(default)]
set -euo pipefail
cd "$(dirname "$0")/.."

run_one() {
  local sf="$1" out="/tmp/verify_${1//./_}"
  echo "=== Verify + oracle check @ $sf ==="
  sbt -batch "runMain graft.Verify /root/testdata/$sf $out"
  python3 tools/check.py "$out" "/root/testdata/$sf"
}

case "${1:-both}" in
  sf0.01) run_one sf0.01 ;;
  sf0.1)  run_one sf0.1 ;;
  both)   run_one sf0.01; run_one sf0.1 ;;
  *) echo "usage: $0 [sf0.01|sf0.1|both]" >&2; exit 2 ;;
esac
