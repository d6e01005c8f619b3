#!/bin/bash
# Round-4 serial TPU job queue (same protocol as r3_queue.sh: each job
# hang-protected by tpu_run.sh, resumable per-arm JSONs, ONE TPU
# process at a time — CLAUDE.md).
#
# usage: tools/dev/r4_queue.sh [start_index]
set -u
cd /root/repo
START=${1:-0}
LOGDIR=/tmp/r4_queue
mkdir -p "$LOGDIR"

jobs=(
  # 0. train-step decomposition: the flow_level_loss remedy arm
  #    (other arms journaled in results_r4_train_prof3.json)
  "tools/dev/exp_train_prof3.py|5400|5"
  # 1. bilinear-warp gather variants (block gather candidate)
  "tools/dev/exp_warp_probe.py|3600|5"
  # 2. re-anchored quality ladder on wander worlds (VERDICT #1b)
  "tools/dev/exp_quality_ladder4.py|21600|3"
  # 3. bf16-Mosaic timebox (VERDICT #8 — one attempt, then closed)
  "tools/dev/exp_bf16_probe.py|1800|3"
  # 4. unsup regime on wander worlds (VERDICT #7)
  "tools/dev/exp_unsup_wander.py|14400|3"
  # 5. warm cache + headline (B=256 serving batch)
  "bench.py|1800|3"
)

i=-1
for spec in "${jobs[@]}"; do
  i=$((i + 1))
  [ "$i" -lt "$START" ] && continue
  IFS='|' read -r cmd tmo tries <<< "$spec"
  name=$(basename "$(echo "$cmd" | awk '{print $1}')" .py)
  log="$LOGDIR/${i}_${name}.log"
  echo "=== job $i: $cmd (timeout ${tmo}s) -> $log ===" | tee -a "$LOGDIR/queue.log"
  TPU_RUN_SKIP_PROBE=1 TPU_RUN_LOG="$log.raw" tools/dev/tpu_run.sh "$cmd" "$tmo" "$tries" \
    > "$log" 2>&1
  echo "=== job $i rc=$? ===" | tee -a "$LOGDIR/queue.log"
done
echo "queue done" | tee -a "$LOGDIR/queue.log"
