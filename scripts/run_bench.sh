#!/bin/bash
cd /root/repo
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
ADD_OPENS=$(printf -- '--add-opens %s=ALL-UNNAMED ' java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar)
# SPARK_GRAFT_XMX: driver/executor heap (single JVM in local mode) — 8g
# covers the driver SFs; the sf10 tier (60M lineitem) wants 64g.
java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx${SPARK_GRAFT_XMX:-8g} \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench "$@"
