#!/bin/bash
# Round-4 continuation queue v2 (supersedes r4_queue3.sh's tail after
# its job 1): the dispatch-amortized serving-scan probe jumps the
# line — it is fast and feeds the bench.py production flip, while the
# ladders are hours long. Same protocol: serial, hang-protected,
# resumable per-arm JSONs, ONE TPU process at a time (CLAUDE.md).
#
# usage: tools/dev/r4_queue4.sh [start_index]
set -u
cd /root/repo
START=${1:-0}
LOGDIR=/tmp/r4_queue4
mkdir -p "$LOGDIR"

jobs=(
  "tools/dev/exp_serving_scan.py|3600|5"
  "tools/dev/exp_bf16_probe.py|1800|3"
  "tools/dev/exp_quality_ladder5.py|21600|3"
  "tools/dev/exp_quality_ladder4b.py|21600|3"
  "tools/dev/exp_unsup_wander.py|12000|3"
  "tools/dev/exp_warp_probe2.py|3600|3"
  "bench.py|1800|3"
)

i=-1
for spec in "${jobs[@]}"; do
  i=$((i + 1))
  [ "$i" -lt "$START" ] && continue
  IFS='|' read -r cmd tmo tries <<< "$spec"
  name=$(basename "$(echo "$cmd" | awk '{print $1}')" .py)
  log="$LOGDIR/${i}_${name}.log"
  echo "=== job $i: $cmd (timeout ${tmo}s) $(date -u +%H:%M:%S) -> $log ===" | tee -a "$LOGDIR/queue.log"
  TPU_RUN_SKIP_PROBE=1 TPU_RUN_LOG="$log.raw" tools/dev/tpu_run.sh "$cmd" "$tmo" "$tries" \
    > "$log" 2>&1
  echo "=== job $i rc=$? $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/queue.log"
done
echo "queue4 done" | tee -a "$LOGDIR/queue.log"
