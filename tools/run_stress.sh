#!/usr/bin/env bash
# One-command stress artifact (round-11 review item #3): run the
# graft.Stress self-scaled sweeps and distill the measurements into one
# machine-diffable JSON so slopes can be compared across rounds the way
# BENCH_r*.json is. The headline field is "superlinear": [] — every
# measured query grows no faster than its own output.
#
# Usage: tools/run_stress.sh [modes] [scales] [out.json]
#   defaults: replica,disjoint  1,2,3,10  STRESS_r11.json
# Env: SPARK_GRAFT_SF_DIR / _REPS / _CPUS / _SHUFFLE / _STRESS_ONLY pass
# through to graft.Stress (see Stress.scala's scaladoc).
#
# The sweep runs on a plain `java` classpath (compiled once up front) so
# the long measurement phase does not hold the sbt build lock — a
# parallel compile/test loop can proceed while it measures.
set -uo pipefail
MODES="${1:-replica,disjoint}"
SCALES="${2:-1,2,3,10}"
OUT="${3:-STRESS_r11.json}"
cd "$(dirname "$0")/.."
sbt -batch compile >/dev/null 2>&1 || { echo "compile failed" >&2; exit 1; }
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
LOG=$(mktemp /tmp/graft_stress_log.XXXXXX)
# shellcheck disable=SC2086
java $ADD_OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Stress "$MODES" "$SCALES" 2>&1 | tee "$LOG" |
  grep --line-buffered '"probe":"stress"'
python3 tools/stress_json.py "$LOG" "$OUT"
rc=$?
rm -f "$LOG"
exit $rc
