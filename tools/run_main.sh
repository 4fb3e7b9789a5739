#!/bin/bash
# Run a graft main class against the compiled classes without sbt
# (same JVM module-opens + conf that build.sbt's forked runs get).
# Usage: tools/run_main.sh [-mem 16g] <mainClass> [args...]
MEM=16g
if [ "$1" = "-mem" ]; then MEM=$2; shift 2; fi
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx$MEM -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "/opt/spark/jars/*:$(dirname "$0")/../target/scala-2.13/classes" "$@"
