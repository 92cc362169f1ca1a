#!/bin/bash
# Run a graft main class with plain java (no sbt lock), classpath =
# /opt/spark/jars + the compiled classes dir. Usage:
#   tools/runjava.sh <MainClass> [args...]   (env vars pass through)
set -euo pipefail
CLS=$1; shift
CP="/opt/spark/jars/*:target/scala-2.13/classes"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Xmx${GRAFT_XMX:-8g} -Dspark.ui.enabled=false \
  -cp "$CP" "$CLS" "$@"
