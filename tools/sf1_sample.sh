#!/bin/bash
# sf1 oracle spot-check: run a query sample through graft.Verify at the
# big (tiled) SF, then hash-compare each against its DuckDB oracle —
# the per-round proof that the scale paths return the SAME answer at
# 10x the bench corpus, not just fast (ships as
# CORRECTNESS_sf1_sample_r{N}.json; see r10's for the assembly shape).
#
#   tools/sf1_sample.sh <bigSfDir> <workdir> q_a,q_b,q_c
#
# Notes from the r10 run:
#  - pick the round's scale-touched paths + the r9 verdict's standing
#    sample (former killers, window-heavy, decimal-exactness families);
#  - heavy oracles (recursive-CTE dedup clusters, PPJoin prefix
#    self-joins) can need 30-45 min EACH in DuckDB at sf1 — run them
#    last, under timeout, and record a reasoned fallback (e.g. the
#    sf0.1 hash-match) when the ORACLE, not the engine, times out;
#  - don't run benches concurrently (era drift, docs/THROUGHPUT.md).
set -e
BIG=${1:?usage: sf1_sample.sh <bigSfDir> <workdir> <q1,q2,...>}
W=${2:?usage: sf1_sample.sh <bigSfDir> <workdir> <q1,q2,...>}
QS=${3:?usage: sf1_sample.sh <bigSfDir> <workdir> <q1,q2,...>}
mkdir -p "$W"
JARS=$(ls /opt/spark/jars/*.jar | tr '\n' ':')
JOPTS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED \
 --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED \
 --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
 --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED \
 --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
cd "$(dirname "$0")/.."
SPARK_GRAFT_CPUS=32 java -cp target/scala-2.13/classes:$JARS $JOPTS -Xmx24g \
  graft.Verify "$BIG" "$W/verify_big" "$QS" > "$W/verify_big.log" 2>&1
for q in ${QS//,/ }; do
  timeout 2700 python3 tools/compare_one.py "$BIG" "$W/verify_big" "$q" \
    >> "$W/sample_results.jsonl" 2>> "$W/sample_err.log" \
    || echo "{\"query\": \"$q\", \"error\": \"oracle-timeout-or-error\"}" \
         >> "$W/sample_results.jsonl"
done
echo "SAMPLE_DONE -> $W/sample_results.jsonl"
