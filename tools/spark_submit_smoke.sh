#!/bin/sh
# Deployment proof: package the library and run it through the installed
# Spark distribution's spark-submit — no sbt in the execution path.
#
#   tools/spark_submit_smoke.sh [sfDir] [master]
#
# The jar is a plain `sbt package` artifact: the library's only compile
# dependency is Spark itself (provided by the cluster), so no assembly
# merging is needed — on a real cluster the same jar rides
# `spark-submit --master k8s://... --deploy-mode cluster`.
set -e
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.001}"
MASTER="${2:-local[8]}"
SPARK_HOME="${SPARK_HOME:-/opt/spark}"

sbt -batch package >/dev/null
JAR=$(ls target/scala-2.13/*.jar | head -1)
echo "[submit-smoke] jar: $JAR  master: $MASTER"

"$SPARK_HOME/bin/spark-submit" \
  --master "$MASTER" \
  --class graft.tools.SubmitSmoke \
  --conf spark.ui.enabled=false \
  "$JAR" "$SF_DIR"
