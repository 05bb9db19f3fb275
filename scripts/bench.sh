#!/usr/bin/env bash
# Launch graft.Bench via spark-submit so stdout is EXACTLY one JSON line —
# no sbt [info]/[success] decoration (that corrupted the driver's JSON
# parse in rounds 1 and 2: `parsed: null`).
#
# Env (all optional):
#   SPARK_GRAFT_SF_DIR      data dir        (default /root/testdata/sf0.1)
#   SPARK_GRAFT_CPUS        local[N]        (default 32)
#   SPARK_GRAFT_BENCH_RUNS  interleaved passes (default 3)
#   SPARK_GRAFT_BENCH_OUT   JSON copy path  (default /root/repo/bench_out.json)
#   SPARK_DRIVER_MEM        driver heap     (default 16g)
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CLASSES="$REPO/target/scala-2.13/classes"
CPUS="${SPARK_GRAFT_CPUS:-32}"
MEM="${SPARK_DRIVER_MEM:-16g}"

# Compile only if the classes dir is missing or stale vs the sources.
if [ ! -d "$CLASSES" ] || \
   [ -n "$(find "$REPO/src/main" -name '*.scala' -newer "$CLASSES" -print -quit 2>/dev/null)" ]; then
  (cd "$REPO" && sbt -batch compile) >&2
fi

# spark-submit needs a primary resource; an empty jar satisfies it while
# --driver-class-path provides the real classes.
STUB="$REPO/target/bench-stub.jar"
if [ ! -f "$STUB" ]; then
  mkdir -p "$REPO/target"
  jar cf "$STUB" -C "$REPO/scripts" bench.sh >&2
fi

exec /opt/spark/bin/spark-submit \
  --master "local[$CPUS]" \
  --driver-memory "$MEM" \
  --driver-class-path "$CLASSES" \
  --conf spark.sql.shuffle.partitions="$CPUS" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.legacy.parquet.nanosAsLong=true \
  --conf spark.ui.enabled=false \
  --class graft.Bench \
  "$STUB"
