#!/bin/bash
# Poll host steal cheaply (raw /proc/stat, no JVM) and launch a probe-gated
# scaling pair whenever a window looks open; repeat until TARGET pairs pass
# the BENCH.md validity rule (bookend probes quiet AND both legs' in-leg
# steal < 10 ticks/s) or DEADLINE_MIN minutes elapse.
# Usage: scripts/scaling_until_valid.sh [nDocs] [N] [outFile] [target] [deadlineMin]
set -u
NDOCS=${1:-300000}
N=${2:-2}
OUT=${3:-/tmp/r5_scaling.jsonl}
TARGET=${4:-3}
DEADLINE_MIN=${5:-150}
cd "$(dirname "$0")/.."
END=$(( $(date +%s) + DEADLINE_MIN * 60 ))

steal_rate() { # steal ticks/s over 8 s, integer
  local a b
  a=$(awk '/^cpu /{print $9}' /proc/stat); sleep 8
  b=$(awk '/^cpu /{print $9}' /proc/stat)
  echo $(( (b - a) / 8 ))
}

valid_pairs() {
  python3 scripts/analyze_pairs.py "$OUT" 2>/dev/null | grep -c ' VALID$'
}

while [ "$(date +%s)" -lt "$END" ]; do
  if [ "$(valid_pairs)" -ge "$TARGET" ]; then
    echo "=== target reached: $(valid_pairs) valid pairs ===" >> "$OUT"
    exit 0
  fi
  s=$(steal_rate)
  if [ "$s" -lt 8 ]; then
    scripts/scaling_pair.sh "$NDOCS" "$N" "$OUT"
  else
    sleep 45
  fi
done
echo "=== deadline reached with $(valid_pairs) valid pairs ===" >> "$OUT"
