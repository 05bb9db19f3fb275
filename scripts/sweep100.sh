#!/usr/bin/env bash
# Engine-side 100x invariant sweep (graft.Sweep) via spark-submit —
# same launch shape as bench.sh. Args: relDir docDir embDir baseDir.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CLASSES="$REPO/target/scala-2.13/classes"
CPUS="${SPARK_GRAFT_CPUS:-32}"
MEM="${SPARK_DRIVER_MEM:-48g}"
STUB="$REPO/target/bench-stub.jar"
if [ ! -f "$STUB" ]; then
  mkdir -p "$REPO/target"; jar cf "$STUB" -C "$REPO/scripts" bench.sh >&2
fi
exec /opt/spark/bin/spark-submit \
  --master "local[$CPUS]" \
  --driver-memory "$MEM" \
  --driver-class-path "$CLASSES" \
  --conf spark.sql.shuffle.partitions="$CPUS" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.legacy.parquet.nanosAsLong=true \
  --conf spark.ui.enabled=false \
  --class graft.Sweep \
  "$STUB" \
  "${1:-/tmp/sf100x}" "${2:-/tmp/sf100d}" "${3:-/tmp/sf100e}" "${4:-/root/testdata/sf0.1}"
