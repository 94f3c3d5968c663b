#!/bin/bash
# Direct-JVM runner for graft mains (bypasses the sbt lock): mirrors
# build.sbt's javaOptions (add-opens, clamped pre-touched heap, code cache).
MEM="${SPARK_DRIVER_MEM:-8g}"
case "$MEM" in
  *g) N="${MEM%g}"; [ "$N" -gt 30 ] && MEM=30g ;;
esac
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx$MEM -Xms$MEM -XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=1g \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
