#!/bin/bash
# Round-5 queue, part 2 — waits for part 1 ("queue done" in its log),
# then runs the short SoL/gap artifacts, the flow-supervision ladder
# (the round's decisive science arm), and the ratchet long run (which
# reads the warp-gate artifact to pick its gather, and self-evals at
# the deadline if 12k steps don't fit).
#
# usage: tools/dev/r5_queue2.sh [start_index]
set -u
cd /root/repo
START=${1:-0}
LOGDIR=/tmp/r5_queue2
mkdir -p "$LOGDIR"
export DAVO_ARM_DEADLINE_UTC=${DAVO_ARM_DEADLINE_UTC:-2000}

# Wait (up to 8 h) for queue part 1 to release the chip.
for _ in $(seq 1 960); do
  grep -q "queue done" /tmp/r5_queue/queue.log 2>/dev/null && break
  sleep 30
done
echo "part 1 done; starting part 2 $(date -u +%H:%M:%S)" | tee -a "$LOGDIR/queue.log"

jobs=(
  "tools/dev/exp_ba_sol.py|1800|3"
  "tools/dev/exp_serving_gap.py|2400|3"
  "tools/dev/exp_quality_ladder7.py|14400|3"
  "tools/dev/exp_ratchet_r5.py|14400|3"
)

i=-1
for spec in "${jobs[@]}"; do
  i=$((i + 1))
  [ "$i" -lt "$START" ] && continue
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
echo "queue2 done" | tee -a "$LOGDIR/queue.log"
