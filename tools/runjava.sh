#!/bin/bash
# Run a graft main class directly against the packaged jar (fast iteration;
# mirrors build.sbt's forked-run JVM options). Usage:
#   tools/runjava.sh graft.Bench [args...]
# Env: SPARK_DRIVER_MEM (default 8g), plus whatever the main reads.
set -u
JAR=/root/repo/target/scala-2.13/k8svectordbsyncspark_2.13-0.1.0.jar
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "/opt/spark/jars/*:$JAR" "$@"
