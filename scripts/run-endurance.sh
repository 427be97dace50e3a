#!/usr/bin/env bash
# sf1 endurance protocol: the headline + Icelite(res-3, ~41k buckets,
# kill/resume) + curation phases at ~1.9B docs via spark-submit, then the
# north-rule scaling datum at the same volume (local[8] vs local[32]).
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch package
JAR=$(ls target/scala-2.13/h3ospark_2.13-*.jar | head -1)
SF=${1:-/root/testdata/sf0.1}
MULT=${2:-19200}   # sf0.1 events=100k rows -> 1.92B docs
CORES=${3:-32}

/opt/spark/bin/spark-submit \
  --master "local[$CORES]" \
  --driver-memory 48g \
  --conf spark.sql.shuffle.partitions=$CORES \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.ui.enabled=false \
  --class graft.Endurance "$JAR" "$CORES" "$SF" "$MULT" 2>/dev/null | grep '"metric"'

# Scaling at the sf1 volume (reps kept low: each rep is ~1.9B docs).
SPARK_GRAFT_SCALING_REPS=${SPARK_GRAFT_SCALING_REPS:-3} \
  bash scripts/run-scaling.sh "$SF" "$MULT"
