#!/usr/bin/env bash
# Packaged-jar twin of the driver's Verify run (round-11 verdict #2).
#
# Runs graft.Verify from the PACKAGED JAR — resources resolve via the
# jar: protocol, not sbt's exploded target/classes — lets the JVM EXIT,
# and only then replays the oracles in DuckDB via check_oracle_strict.py.
# That is exactly the driver's run shape: any oracle SQL that embeds a
# path only valid while the Verify JVM is alive (e.g. a deleteOnExit
# temp extraction — the round-11 m03 red) fails HERE before it can fail
# at the driver. An sbt-run local gate can never catch that class: sbt
# resolves resources via file: to target/classes, which persists.
#
# Usage: scripts/gate_jar.sh <sfDir> [outDir] [only1,only2,...]
set -euo pipefail
SF_DIR=${1:?usage: gate_jar.sh <sfDir> [outDir] [only1,only2,...]}
OUT_DIR=${2:-/tmp/graft_gate_jar}
ONLY=${3:-}
cd "$(dirname "$0")/.."
sbt -batch package
# App artifact only — `ls -t *.jar | head -1` could pick a stale -sources
# or -javadoc jar from a prior task and quietly validate the wrong build.
JAR=$(ls -t target/scala-2.13/*_2.13-*.jar 2>/dev/null \
  | grep -v -e '-sources\.jar$' -e '-javadoc\.jar$' -e '-tests\.jar$' | head -1)
[ -n "$JAR" ] || { echo "gate_jar: no app jar under target/scala-2.13" >&2; exit 1; }
SPARK_JARS_DIR=${SPARK_JARS_DIR:-/opt/spark/jars}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
rm -rf "$OUT_DIR"
# shellcheck disable=SC2086
java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$JAR:$SPARK_JARS_DIR/*" graft.Verify "$SF_DIR" "$OUT_DIR" $ONLY
# The Verify JVM is gone; everything the oracles need must now live in
# OUT_DIR or the repo. Replay with the strict bit gate.
if [ -n "$ONLY" ]; then
  python3 scripts/check_oracle_strict.py "$SF_DIR" "$OUT_DIR" "$ONLY"
else
  python3 scripts/check_oracle_strict.py "$SF_DIR" "$OUT_DIR"
fi
