#!/bin/bash
# Driver-JVM launcher for graft.Bench / graft.tools.* mains (Java 17 + Spark 4).
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
CLS=${1:-graft.Bench}; shift || true
exec java $OPENS -Xmx12g \
  -cp /root/repo/target/scala-2.13/classes:"/opt/spark/jars/*" "$CLS" "$@"
