#!/bin/bash
# Round-19 end-of-round bench refresh on final code (s38 included).
set -u
cd /root/repo
LOG=/tmp/finalbench_r19.log
: > "$LOG"
sbt -batch package >> "$LOG" 2>&1 || { echo "[finalbench] package FAILED" >> "$LOG"; exit 1; }
JAR=$(ls -t target/scala-2.13/*_2.13-*.jar | grep -vE '(sources|javadoc|tests)\.jar' | head -1)
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
echo "[finalbench] $(date -u +%FT%TZ) sf0.1" >> "$LOG"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 java $ADD_OPENS -Xmx100g \
  -cp "$JAR:/opt/spark/jars/*" graft.Bench > /tmp/bench_sf01_final_r19.out 2>/dev/null
tail -1 /tmp/bench_sf01_final_r19.out >> "$LOG"
echo "[finalbench] $(date -u +%FT%TZ) sf1.0" >> "$LOG"
SPARK_GRAFT_SF_DIR=target/sf1.0 java $ADD_OPENS -Xmx100g \
  -cp "$JAR:/opt/spark/jars/*" graft.Bench > /tmp/bench_sf1_final_r19.out 2>/dev/null
tail -1 /tmp/bench_sf1_final_r19.out >> "$LOG"
echo "[finalbench] $(date -u +%FT%TZ) DONE" >> "$LOG"
