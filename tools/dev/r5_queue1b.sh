#!/bin/bash
# Round-5 queue 1b: replaces queue 1 after its first gate arm wedged
# 65+ min in the (8,32) Mosaic compile (killed by hand — see
# R5_RESULTS). Sleeps through the post-kill claim wedge, then reruns
# the gate (now (4,16) first / (8,16) sweep), then the original queue-1
# tail. Writes to the SAME logdir and emits the SAME "queue done"
# marker queue 2 is waiting on.
set -u
cd /root/repo
START=${1:-0}
LOGDIR=/tmp/r5_queue
mkdir -p "$LOGDIR"
export DAVO_ARM_DEADLINE_UTC=${DAVO_ARM_DEADLINE_UTC:-2000}

# Post-kill claim wedge: mostly-failing, stochastic for ~30 min
# (CLAUDE.md). Sleep 15 then rely on tpu_run's watchdog retries.
sleep 900

jobs=(
  "tools/dev/exp_warp_gate.py|14400|6"
  "tools/dev/exp_quality_ladder4b.py|10800|4"
  "tools/dev/exp_unsup_wander.py|7200|4"
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
  log="$LOGDIR/1b_${i}_${name}.log"
  echo "=== 1b job $i: $cmd (timeout ${tmo}s) $(date -u +%H:%M:%S) -> $log ===" | tee -a "$LOGDIR/queue.log"
  TPU_RUN_SKIP_PROBE=1 TPU_RUN_LOG="$log.raw" tools/dev/tpu_run.sh "$cmd" "$tmo" "$tries" \
    > "$log" 2>&1
  echo "=== 1b job $i rc=$? $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/queue.log"
done
echo "queue done" | tee -a "$LOGDIR/queue.log"
