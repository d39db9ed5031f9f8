#!/bin/bash
# Interleaved A/B bench runs: new (/root/repo) vs old (/root/repo_old).
# Usage: ab_run.sh <queries-csv> <passes> <tag> <side-sequence e.g. "new old new old">
# Writes the bench's compact JSON line to target/r17_ab_<tag>_<side><i>.json
set -u
Q="$1"; PASSES="$2"; TAG="$3"; shift 3
declare -A count
for side in "$@"; do
  count[$side]=$(( ${count[$side]:-0} + 1 ))
  dir=/root/repo; [ "$side" = old ] && dir=/root/repo_old
  out=/root/repo/target/r17_ab_${TAG}_${side}${count[$side]}.json
  ( cd "$dir" && SPARK_GRAFT_ONLY="$Q" SPARK_GRAFT_PASSES="$PASSES" \
      sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric":"total"' | tail -1 > "$out" )
  echo "[ab] $TAG $side run ${count[$side]} done: $(wc -c < "$out") bytes"
done
