#!/bin/bash
# Run a graft main (graft.Bench / graft.Verify / ...) against the
# compiled classes without sbt (no lock contention with an editing
# session). Mirrors build.sbt's forked-JVM options.
#
# Heap is capped at 8g ON PURPOSE: this VM's host is memory-
# oversubscribed and first-touch page faults can cost 0.1-1 ms each
# under pressure (see tools/hostcheck.py). A large -Xmx lets G1 expand
# the heap indefinitely, so allocation churn keeps touching fresh pages
# and a 4 s query can take 100x longer; an 8g cap bounds the exposure
# and matches what the driver's sbt-forked bench uses.
#
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
#   SPARK_GRAFT_REPS=2 SPARK_GRAFT_ONLY=q_x,q_y \
#   tools/runbench.sh graft.Bench
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADDOPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
