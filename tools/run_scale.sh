#!/usr/bin/env bash
# Scale-campaign runner: launches graft.Scale (or any main) from the
# sbt-compiled classes with the same JVM options build.sbt injects for
# forked runs, WITHOUT holding sbt's project lock — so campaigns can run
# for an hour while sbt keeps compiling/testing the working tree.
#
#   tools/run_scale.sh [-m MEM] <mainClass|mode...>
#   tools/run_scale.sh embdedup huge            # graft.Scale embdedup huge
#   tools/run_scale.sh -m 48g openvocab ultra
#
# Env passthrough: SPARK_GRAFT_SHUFFLE / SPARK_GRAFT_CPUS / SPARK_GRAFT_*
# are read by graft.Scale itself.
#
# Caveat: this runs whatever classes sbt LAST compiled — run `sbt
# compile` after editing sources or the campaign silently uses stale
# code (the lock-free design can't ask sbt to recompile).
set -euo pipefail
MEM="${SPARK_DRIVER_MEM:-16g}"
if [ "${1:-}" = "-m" ]; then MEM="$2"; shift 2; fi
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
MAIN="graft.Scale"
case "${1:-}" in graft.*) MAIN="$1"; shift;; esac
# SCALE_EXTRA_OPTS: extra -D flags (e.g. a spark.graft.* conf override
# for one campaign — SparkConf picks up spark.* system properties).
exec java -cp "$CP" $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dspark.sql.legacy.parquet.nanosAsLong=true \
  -Dspark.cleaner.periodicGC.interval=2min \
  -XX:ReservedCodeCacheSize=512m \
  -Xmx"$MEM" \
  ${SCALE_EXTRA_OPTS:-} \
  "$MAIN" "$@"
