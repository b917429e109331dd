#!/bin/bash
# Idle Spark bench capture through a raw `java` launch: no sbt JVM
# competing for cores (a concurrent sbt/test JVM inflates per-query
# times 2-7x — the round-7 post-mortem). Compile first (sbt compile),
# run this with the machine otherwise idle.
#
# Usage: tools/bench_spark.sh [sfDir] [outFile]
set -euo pipefail
SF_DIR=${1:-/root/testdata/sf0.1}
OUT=${2:-/dev/stdout}
cd "$(dirname "$0")/.."
# bare `sbt compile` does NOT place src/main/resources into
# target/classes; without copyResources the raw-java launch runs with
# graft/psl_subset.dat missing and q_url_parse2 fails at runtime (the
# round-11 judge-observed landmine). Build classes + resources here so
# the script is green from a clean target/.
mkdir -p target
sbt -batch "Compile/compile; Compile/copyResources" >target/bench_build.log 2>&1
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 java -Xmx64g \
 -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
 --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
 --add-opens java.base/java.lang=ALL-UNNAMED \
 --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
 --add-opens java.base/java.io=ALL-UNNAMED \
 --add-opens java.base/java.net=ALL-UNNAMED \
 --add-opens java.base/java.nio=ALL-UNNAMED \
 --add-opens java.base/java.util=ALL-UNNAMED \
 --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
 --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
 --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
 --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
 --add-opens java.base/sun.security.action=ALL-UNNAMED \
 --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
 graft.Bench 2>target/bench_stderr.log | tail -1 > "$OUT"
