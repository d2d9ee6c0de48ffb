#!/bin/bash
# Retry loop for probe-gated scaling pairs (BENCH.md validity rule): keep
# attempting pairs until MAXPAIRS have completed both legs or MAXTRIES
# attempts are spent; gate validity (bookend probes quiet AND in-leg steal
# <10 for both legs) in post-processing. Usage:
#   scripts/scaling_loop.sh [nDocs] [N] [outFile] [maxPairs] [maxTries]
set -u
NDOCS=${1:-300000}
N=${2:-2}
OUT=${3:-/tmp/r5_scaling.jsonl}
MAXPAIRS=${4:-4}
MAXTRIES=${5:-14}
cd "$(dirname "$0")/.."
done_pairs=0
for try in $(seq 1 "$MAXTRIES"); do
  [ "$done_pairs" -ge "$MAXPAIRS" ] && break
  scripts/scaling_pair.sh "$NDOCS" "$N" "$OUT"
  if [ $? -eq 0 ]; then done_pairs=$((done_pairs + 1)); else sleep 90; fi
done
echo "=== loop done: $done_pairs completed pairs in $try tries ===" >> "$OUT"
