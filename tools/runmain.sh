#!/bin/bash
# Run a graft main from a snapshotted class dir without holding the sbt
# lock (the verify-skill tip): tools/runmain.sh <classdir> <MainClass> [args...]
# Env (SPARK_GRAFT_*) passes through. Mirrors build.sbt's javaOptions.
CLS="$1"; shift
MAIN="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -Xmx${SPARK_DRIVER_MEM:-16g} $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  $EXTRA_JAVA_OPTS \
  -cp "$CLS:/opt/spark/jars/*" "$MAIN" "$@"
