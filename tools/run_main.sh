#!/usr/bin/env bash
# Run a graft main class directly on the compiled classes + Spark jars,
# WITHOUT holding the sbt project lock — lets a long replay (e.g. the
# sf10 full-gate verify) run in the background while sbt keeps working.
# Mirrors build.sbt's forked-run JVM options exactly (JDK-17 add-opens,
# UTC, UI off, SPARK_DRIVER_MEM heap).
#
# Usage: tools/run_main.sh <mainClass> [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
ADD_OPENS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
exec java "${ADD_OPENS[@]}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
