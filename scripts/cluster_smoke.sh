#!/bin/sh
# Multi-executor smoke (BASELINE.md r5): the flagship anagram pipeline and
# one LSH-family query on local-cluster[2,4,2048] — two real worker
# processes with separate executor JVMs, app classes shipped via spark.jars.
# Usage: scripts/cluster_smoke.sh [sfDir]   (default /root/testdata/sf0.001)
set -e
cd "$(dirname "$0")/.."
sbt -batch package >/dev/null
# the MAIN artifact only: a -tests.jar sorts first in the glob and would
# ship no product classes (executors then fail with SerializedLambda
# ClassCastExceptions on the first closure)
JAR=$(ls target/scala-2.13/*.jar | grep -v -- '-tests' | head -1)
SPARK_HOME=${SPARK_HOME:-/opt/spark} SPARK_SCALA_VERSION=2.13 \
  exec sbt -batch "runMain graft.ClusterSmoke $JAR ${1:-/root/testdata/sf0.001}"
