#!/bin/bash
# Launch a graft main directly (no sbt) from the compiled classes —
# identical JVM flags to build.sbt's javaOptions. Usage:
#   tools/run_main.sh graft.Bench [args...]
CLS=/root/repo/target/scala-2.13/classes
SCALA_LIB=$(ls "$HOME"/.cache/coursier/v1/https/repo1.maven.org/maven2/org/scala-lang/scala-library/2.13.17/scala-library-2.13.17.jar 2>/dev/null || ls /opt/spark/jars/scala-library*.jar | head -1)
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS $EXTRA_JAVA_OPTS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} \
  -cp "$CLS:/opt/spark/jars/*:$SCALA_LIB" "$@"
