#!/bin/bash
# Attribution-grade isolated bench (PLANS §25 protocol): ONE entry per
# JVM, median-of-3, quiet box. Usage:
#   tools/isobench.sh <sf_dir> <entry> [entry...]
# Prints one "<entry> <median_sec> loadavg=<l>" line per entry (parsed
# from Bench's full JSON line, which with a 1-entry filter contains only
# that entry's median).
set -euo pipefail
SF_DIR=$1; shift
JAR=target/scala-2.13/datapumpspark_2.13-0.1.0.jar
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for entry in "$@"; do
  out=$(SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_ONLY="$entry" \
    java $ADD_OPENS -Xmx8g \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "/opt/spark/jars/*:$JAR" graft.Bench 2>/dev/null | head -1)
  python3 - "$entry" <<PYEOF
import json, sys
d = json.loads('''$out''')
e = sys.argv[1]
print(f"{e} {d['queries'].get(e, 'ERR:' + str(d['errors']))} loadavg={d['loadavg']}")
PYEOF
done
