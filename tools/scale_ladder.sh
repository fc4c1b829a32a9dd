#!/usr/bin/env bash
# Per-query scale ladder at bounded heap: each query runs in its OWN JVM
# (-Xmx${LADDER_MEM:-16g}) via graft.Bench with SPARK_GRAFT_ONLY, INFO
# logs kept so spill events are countable — the round-13 memory-pressure
# gate protocol, scripted for reuse at any lake scale.
#
# Usage: tools/scale_ladder.sh <sfDir> <outTsv> <query> [query...]
# Output: one TSV row per query: name \t seconds \t spill_events \t status
# Repeat runs: run the script twice and take per-query minima downstream.
set -uo pipefail
cd "$(dirname "$0")/.."
sfdir="$1"; out="$2"; shift 2
: > "$out"
for q in "$@"; do
  log="/tmp/ladder_${q}.log"
  SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$q" \
    SPARK_GRAFT_LOGLEVEL=INFO SPARK_DRIVER_MEM="${LADDER_MEM:-16g}" \
    tools/run_main.sh graft.Bench > "$log" 2>&1
  rc=$?
  # First match only: the per-query map precedes the "regressions" map,
  # whose entries are arrays — and require a leading digit, or a trailing
  # '*' quantifier happily matches zero characters at '"q":[...'.
  sec=$(grep -o "\"$q\":[0-9][0-9.]*" "$log" | head -1 | cut -d: -f2)
  spills=$(grep -cEi "spill(ing|ed)" "$log" || true)
  if [ $rc -ne 0 ] || [ -z "${sec:-}" ] || grep -q "\"failed\":\[\"$q\"\]" "$log"; then
    echo -e "$q\tNA\t$spills\tFAIL(rc=$rc)" | tee -a "$out"
  else
    echo -e "$q\t$sec\t$spills\tok" | tee -a "$out"
  fi
done
