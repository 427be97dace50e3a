#!/usr/bin/env bash
# North-rule scaling evidence via spark-submit at two parallelism levels
# (local[8] = N, local[32] = 4N executors stand-in; see BASELINE.md).
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch package
JAR=$(ls target/scala-2.13/h3ospark_2.13-*.jar | head -1)
SF=${1:-/root/testdata/sf0.1}
MULT=${2:-3000}
for CORES in 8 32; do
  /opt/spark/bin/spark-submit \
    --master "local[$CORES]" \
    --driver-memory 48g \
    --conf spark.sql.shuffle.partitions=$CORES \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.ui.enabled=false \
    --class graft.Scaling "$JAR" "$CORES" "$SF" "$MULT" 2>/dev/null | grep '"metric"'
done
