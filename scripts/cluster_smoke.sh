#!/bin/sh
# Multi-executor smoke (BASELINE.md r5): the flagship anagram pipeline and
# one LSH-family query on local-cluster[2,4,2048] — two real worker
# processes with separate executor JVMs, app classes shipped via spark.jars.
# Usage: scripts/cluster_smoke.sh [sfDir]   (default /root/testdata/sf0.001)
set -e
cd "$(dirname "$0")/.."
sbt -batch package >/dev/null
JAR=$(ls target/scala-2.13/*.jar | head -1)
SPARK_HOME=${SPARK_HOME:-/opt/spark} SPARK_SCALA_VERSION=2.13 \
  exec sbt -batch "runMain graft.ClusterSmoke $JAR ${1:-/root/testdata/sf0.001}"
