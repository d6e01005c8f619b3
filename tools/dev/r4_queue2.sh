#!/bin/bash
# Round-4 follow-up TPU queue: drive-world quality ladder + the
# block-gather warp in-context A/B. Launch via a watcher that waits
# for r4_queue.sh's "queue done" (ONE TPU process at a time —
# CLAUDE.md).
#
# usage: tools/dev/r4_queue2.sh [start_index]
set -u
cd /root/repo
START=${1:-0}
LOGDIR=/tmp/r4_queue2
mkdir -p "$LOGDIR"

jobs=(
  # 0. warp A/B in the real train step (flow_level_take4 vs _block,
  #    fresh same-window arms; earlier arms skip via per-arm JSON)
  "tools/dev/exp_train_prof3.py|5400|5"
  # 0b. gather-free banded warp kernel probe (kernels/bandwarp.py)
  "tools/dev/exp_warp_probe2.py|3600|5"
  # 0c. bf16 timebox RERUN — the first run died on a harness bug
  #     (unary index_map lambda), every arm was a Python TypeError
  "tools/dev/exp_bf16_probe.py|1800|3"
  # 1. generalization axis: ladder4's per-axis corr ~0 on held-out
  #    worlds vs 0.96 overfit — is the floor a DATA budget?
  "tools/dev/exp_quality_ladder4b.py|21600|3"
  # 2. drive-world supervised quality ladder (yaw unambiguous)
  "tools/dev/exp_quality_ladder5.py|21600|3"
  # 3. re-warm the compile cache + headline after the day's arms
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
echo "queue2 done" | tee -a "$LOGDIR/queue.log"
