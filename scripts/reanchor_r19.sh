#!/bin/bash
# Round-19 calm-window re-anchor (round-18 verdict #2): the committed
# BENCH_100x.json s26/s37 absolutes and bench_results_sf1.json were taken
# inside a documented ambient I/O burst. Re-measure them in ONE window,
# with plan-identical control rows (q01, c17, d07) first — if the controls
# drift >~10% from their quiet-window values the window is NOT calm and the
# numbers should be discarded.
set -u
cd /root/repo
LOG=/tmp/reanchor_r19.log
: > "$LOG"
echo "[reanchor] $(date -u +%FT%TZ) packaging" >> "$LOG"
sbt -batch package >> "$LOG" 2>&1 || { echo "[reanchor] package FAILED" >> "$LOG"; exit 1; }

JAR=$(ls -t target/scala-2.13/*_2.13-*.jar | grep -vE '(sources|javadoc|tests)\.jar' | head -1)
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

run_one() { # query dir reps
  echo "[reanchor] $(date -u +%FT%TZ) BenchOne $1 ($2, reps=$3)" >> "$LOG"
  java $ADD_OPENS -Xmx100g -cp "$JAR:/opt/spark/jars/*" \
    graft.BenchOne "$1" "$2" "$3" 2>/dev/null | grep '\[benchone\]' >> "$LOG"
}

# control rows (quiet-window 100x values: q01 3.191, c17 1.381, d07 0.894)
run_one q01_pricing_summary target/sf10 2
run_one c17_soft_dedup_weights target/sf10 2
run_one d07_neardup_components target/sf10 2
# the two burst-contaminated rows
run_one s26_knn_graph target/sf10 2
run_one s37_rrf_graph_recall target/sf10 2
# sf1.0 full-surface refresh in the same window (quiet-window total 272.1 s)
echo "[reanchor] $(date -u +%FT%TZ) full Bench on target/sf1.0" >> "$LOG"
SPARK_GRAFT_SF_DIR=target/sf1.0 java $ADD_OPENS -Xmx100g \
  -cp "$JAR:/opt/spark/jars/*" graft.Bench > /tmp/bench_sf1_r19.out 2>/dev/null
tail -1 /tmp/bench_sf1_r19.out >> "$LOG"
# sf0.1 control in the same window (r18 quiet-window 166.2 s)
echo "[reanchor] $(date -u +%FT%TZ) full Bench on /root/testdata/sf0.1" >> "$LOG"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 java $ADD_OPENS -Xmx100g \
  -cp "$JAR:/opt/spark/jars/*" graft.Bench > /tmp/bench_sf01_r19.out 2>/dev/null
tail -1 /tmp/bench_sf01_r19.out >> "$LOG"
echo "[reanchor] $(date -u +%FT%TZ) DONE" >> "$LOG"
