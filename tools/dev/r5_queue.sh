#!/bin/bash
# Round-5 queue, part 1 (VERDICT r4 next-items #1 and #3):
#   1. exp_warp_gate      banded-warp quality gate (the 2.36x flip decision)
#   2. exp_quality_ladder4b  infinite-world arms first (memorization test)
#   3. exp_unsup_wander   the unsupervised-regime arms left on the floor
# Serial, hang-protected, resumable, ONE TPU process (CLAUDE.md).
# Part 2 (flow-supervision ladder, ratchet run, BA SoL, serving gap)
# spools separately once the gate verdict is in: r5_queue2.sh.
#
# usage: tools/dev/r5_queue.sh [start_index]
set -u
cd /root/repo
START=${1:-0}
LOGDIR=/tmp/r5_queue
mkdir -p "$LOGDIR"
export DAVO_ARM_DEADLINE_UTC=${DAVO_ARM_DEADLINE_UTC:-2000}

jobs=(
  "tools/dev/exp_warp_gate.py|14400|3"
  "tools/dev/exp_quality_ladder4b.py|10800|3"
  "tools/dev/exp_unsup_wander.py|7200|3"
)

i=-1
for spec in "${jobs[@]}"; do
  i=$((i + 1))
  [ "$i" -lt "$START" ] && continue
  # No NEW job after the deadline: the driver's bench run must find
  # the chip free at round end.
  now=$(date -u +%H%M)
  if [ "$now" -ge "$DAVO_ARM_DEADLINE_UTC" ] && [ "$now" -lt 2200 ]; then
    echo "=== budget stop before job $i ($now UTC) ===" | tee -a "$LOGDIR/queue.log"
    break
  fi
  IFS='|' read -r cmd tmo tries <<< "$spec"
  name=$(basename "$(echo "$cmd" | awk '{print $1}')" .py)
  log="$LOGDIR/${i}_${name}.log"
  echo "=== job $i: $cmd (timeout ${tmo}s) $(date -u +%H:%M:%S) -> $log ===" | tee -a "$LOGDIR/queue.log"
  TPU_RUN_SKIP_PROBE=1 TPU_RUN_LOG="$log.raw" tools/dev/tpu_run.sh "$cmd" "$tmo" "$tries" \
    > "$log" 2>&1
  echo "=== job $i rc=$? $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/queue.log"
done
echo "queue done" | tee -a "$LOGDIR/queue.log"
