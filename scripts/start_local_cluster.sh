#!/usr/bin/env bash
# 3-node local REPLICATED cluster (reference: scripts/start_local_cluster.sh
# — three processes on ports 3000/3010/3020 with static peers, async
# replication and anti-entropy between them).
# Usage: scripts/start_local_cluster.sh [data_root]
set -euo pipefail
ROOT="${1:-/tmp/longbow-cluster}"
cd "$(dirname "$0")/.."

ALL="127.0.0.1:3000:3001,127.0.0.1:3010:3011,127.0.0.1:3020:3021"

mkdir -p "$ROOT"/node{0,1,2}
PIDS=()
for i in 0 1 2; do
  DATA_PORT=$((3000 + i * 10))
  META_PORT=$((3001 + i * 10))
  METRICS_PORT=$((9090 + i))
  LONGBOW_DATA_PORT=$DATA_PORT LONGBOW_META_PORT=$META_PORT \
  LONGBOW_METRICS_PORT=$METRICS_PORT LONGBOW_DATA_DIR="$ROOT/node$i" \
  LONGBOW_NODE_ID="127.0.0.1:$DATA_PORT" LONGBOW_PEERS="$ALL" \
  LONGBOW_REPLICATION="${LONGBOW_REPLICATION:-async}" \
  LONGBOW_SYNC_INTERVAL_S="${LONGBOW_SYNC_INTERVAL_S:-10}" \
    python -m longbow_tpu.serve > "$ROOT/node$i.log" 2>&1 &
  PIDS+=($!)
  echo "node$i: data :$DATA_PORT meta :$META_PORT metrics :$METRICS_PORT pid ${PIDS[$i]}"
done

echo "${PIDS[@]}" > "$ROOT/pids"
echo "cluster up; stop with: kill \$(cat $ROOT/pids)"
