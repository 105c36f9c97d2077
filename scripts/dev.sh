#!/bin/bash
# Ad-hoc runner for graft.Dev (schema/explain/run). Usage: scripts/dev.sh run v_knn /root/testdata/sf0.001
set -e
cd /root/repo
sbt -batch compile -error >/dev/null
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Xmx${DEV_XMX:-8g} -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Dev "$@"
