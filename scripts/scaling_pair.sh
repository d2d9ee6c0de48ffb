#!/bin/bash
# One probe-gated scaling pair (BENCH.md protocol): quietness probe, then the
# 4N level FIRST (cache warmth then favors N = conservative efficiency),
# then N, each leg taskset-pinned so driver-side threads are capped too.
# Usage: scripts/scaling_pair.sh [nDocs] [N] [outFile]
set -u
NDOCS=${1:-300000}
N=${2:-2}
OUT=${3:-/tmp/scaling_pairs.jsonl}
FOURN=$((4 * N))
cd "$(dirname "$0")/.."

probe() { taskset -c $((FOURN + 1)) sbt -batch "runMain graft.bench.QuietProbe" 2>/dev/null | grep '"quiet"'; }

echo "=== pair start $(date -u +%FT%TZ) nDocs=$NDOCS N=$N ===" >> "$OUT"
P=$(probe); echo "$P" >> "$OUT"
echo "$P" | grep -q '"quiet":true' || { echo "window not quiet — aborting" >> "$OUT"; exit 1; }
taskset -c 0-$((FOURN - 1)) sbt -batch "runMain graft.bench.LevelBench $NDOCS $FOURN ${WARM:-1}" 2>&1 | grep '"level"' >> "$OUT"
probe >> "$OUT"
taskset -c 0-$((N - 1)) sbt -batch "runMain graft.bench.LevelBench $NDOCS $N ${WARM:-1}" 2>&1 | grep '"level"' >> "$OUT"
probe >> "$OUT"
echo "=== pair done $(date -u +%FT%TZ) ===" >> "$OUT"
