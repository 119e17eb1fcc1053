#!/usr/bin/env bash
# Builder-side bench runner on a bare JVM (no sbt between runs):
#
#   tools/run_bench.sh <sfDir> <fullOutJson> [runs] [protocol]
#
# -XX:+ExplicitGCInvokesConcurrent: Bench calls System.gc() between
# runs (untimed, to release localCheckpoint blocks); at sf1-scale heaps
# a stop-the-world full GC between every run dominates WALL time and
# starves the next query's first stage — concurrent GC keeps the
# between-run pause bounded without giving up the block cleanup.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:?sfDir}"
FULL_OUT="${2:?fullOutJson}"
RUNS="${3:-3}"
PROTOCOL="${4:-}"

sbt -batch compile > /tmp/bench_compile.log 2>&1 || { tail -30 /tmp/bench_compile.log; exit 1; }

CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=(
  java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect
  java.base/java.io java.base/java.net java.base/java.nio java.base/java.util
  java.base/java.util.concurrent java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar
)
JOPTS=(-XX:+ExplicitGCInvokesConcurrent)
for p in "${ADD_OPENS[@]}"; do JOPTS+=(--add-opens "$p=ALL-UNNAMED"); done

export SPARK_GRAFT_SF_DIR="$SF_DIR"
export SPARK_GRAFT_BENCH_RUNS="$RUNS"
export SPARK_GRAFT_BENCH_FULL_OUT="$FULL_OUT"
[ -n "$PROTOCOL" ] && export SPARK_GRAFT_BENCH_PROTOCOL="$PROTOCOL"
java "${JOPTS[@]}" -Xmx100g -cp "$CP" graft.Bench
