#!/bin/bash
# Full-suite bench over a sf dir in a dedicated JVM, detach-friendly.
# Usage: tools/fullbench_sf1.sh <sf_dir> <out_json> [err_log]
# Writes Bench's one-line JSON to <out_json> when done.
set -euo pipefail
SF_DIR=$1; OUT=$2; ERR=${3:-/tmp/fullbench.err}
JAR=target/scala-2.13/datapumpspark_2.13-0.1.0.jar
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 \
  java $ADD_OPENS -Xmx100g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:$JAR" graft.Bench > "$OUT" 2> "$ERR"
