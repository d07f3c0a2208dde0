#!/bin/bash
cd /root/repo
export SPARK_GRAFT_CPUS="$4"
ADD_OPENS=$(printf -- '--add-opens %s=ALL-UNNAMED ' java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar)
java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Verify "$1" "$2" > "$3" 2>&1
echo "exit=$?" >> "$3"
