#!/bin/bash
# Run graft.Bench (or another graft main) WITHOUT sbt, so the sbt lock
# stays free while a long bench grinds. Reconstructs build.sbt's fork
# JVM flags (JDK-17 add-opens, UTC, 48g default heap). Compile first:
# `sbt -batch compile`.
set -e
MAIN="${1:-graft.Bench}"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -cp "$CP" "$MAIN" "${@:2}"
