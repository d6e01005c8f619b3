#!/bin/bash
# Round-4 queue tail v3 (after exp_quality_ladder5): fast probes first
# (s2d first-conv A/B; banded-warp rerun with the int32-iota fix),
# bench warm, then the geometry-grounded pose-head ladder (the r4
# structural candidate), then whatever data-budget arms still fit.
# Same protocol: serial, hang-protected, resumable, ONE TPU process
# (CLAUDE.md).
#
# usage: tools/dev/r4_queue5.sh [start_index]
set -u
cd /root/repo
START=${1:-0}
LOGDIR=/tmp/r4_queue5
mkdir -p "$LOGDIR"

jobs=(
  "tools/dev/exp_s2d_conv.py|2700|3"
  "tools/dev/exp_train_prof3.py|3600|3"
  "bench.py|1800|3"
  "tools/dev/exp_quality_ladder6.py|7200|3"
  "tools/dev/exp_quality_ladder4b.py|7200|3"
  "tools/dev/exp_unsup_wander.py|7200|3"
)

i=-1
for spec in "${jobs[@]}"; do
  i=$((i + 1))
  [ "$i" -lt "$START" ] && continue
  # Hard stop: no NEW job after 06:20 UTC — the driver's own bench
  # run must find the chip free at round end.
  now=$(date -u +%H%M)
  if [ "$now" -ge 0620 ] && [ "$now" -lt 2000 ]; then
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
echo "queue5 done" | tee -a "$LOGDIR/queue.log"
