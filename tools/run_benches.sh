#!/bin/bash
# Full round-close measurement sequence: big-SF tiling (once), then
# fresh-JVM full-surface benches at the small and big SF, one ascending
# + one descending each (min-across-orders per the noise methodology —
# docs/THROUGHPUT.md). The box must be otherwise idle: the r10 era
# drift showed concurrent DuckDB/verify work shifts totals by ~10%.
#
#   tools/run_benches.sh <workdir> [smallSfDir] [tileFactor]
#
# Then:
#   python3 tools/merge_details.py $W/detail_small_merged.json \
#       $W/detail_small_asc.json $W/detail_small_desc.json
#   python3 tools/merge_details.py $W/detail_big_merged.json \
#       $W/detail_big_asc.json $W/detail_big_desc.json
#   cp $W/detail_small_merged.json BENCHDETAIL_r{N}.json
#   python3 tools/bench_scale.py {N} $W/detail_small_merged.json \
#       $W/detail_big_merged.json --notes=tools/scale_notes.json \
#       --small-dir=$SMALL --big-dir=$W/big   # measures the chars ratio
set -e
W=${1:?usage: run_benches.sh <workdir> [smallSfDir] [tileFactor]}
SMALL=${2:-/root/testdata/sf0.1}
FACTOR=${3:-10}
mkdir -p "$W"
JARS=$(ls /opt/spark/jars/*.jar | tr '\n' ':')
JOPTS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED \
 --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED \
 --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
 --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED \
 --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
cd "$(dirname "$0")/.."
CP=target/scala-2.13/classes:$JARS

if [ ! -d "$W/big" ]; then
  SPARK_GRAFT_CPUS=32 java -cp $CP $JOPTS -Xmx16g graft.tools.ScaleData \
    "$SMALL" "$W/big" "$FACTOR" > "$W/scaledata.log" 2>&1
fi

bench() { # sfdir order tag
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_ORDER=$2 \
  java -cp $CP $JOPTS -Xmx24g graft.Bench > "$W/bench_$3.out" 2> "$W/bench_$3.err"
  cp target/bench-detail.json "$W/detail_$3.json"
}
bench "$SMALL" asc  small_asc
bench "$SMALL" desc small_desc
bench "$W/big" asc  big_asc
bench "$W/big" desc big_desc
echo ALL_DONE
