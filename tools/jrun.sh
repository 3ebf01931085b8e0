#!/bin/bash
# Run a graft main class with the exported runtime classpath (plain java,
# mirroring build.sbt's forked-run JVM options) — lets measurement runs
# proceed without holding the sbt lock. Usage: tools/jrun.sh <MainClass> [args...]
set -e
CP=$(cat /tmp/graft_cp.txt)
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} -cp "$CP" "$@"
