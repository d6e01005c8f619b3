#!/bin/bash
# Round-4 continuation TPU queue (fresh session: /tmp wiped, compile
# cache cold, r4_queue2 never ran). Same protocol as r4_queue{,2}.sh:
# serial, hang-protected by tpu_run.sh, resumable per-arm JSONs, ONE
# TPU process at a time (CLAUDE.md).
#
# Priority order for a ~4 h wall-clock budget:
#   0. bench.py           — verify tunnel + warm the serving cache
#   1. exp_train_prof3    — banded/block warp in-context A/B (fast;
#                           done arms skip via per-arm JSON)
#   2. exp_bf16_probe     — VERDICT #8 timebox rerun (first run died
#                           on a harness bug)
#   3. exp_quality_ladder5 — drive worlds: the decisive quality arm
#   4. exp_quality_ladder4b — generalization axis (data budget)
#   5. exp_unsup_wander   — VERDICT #7 on the re-anchored world class
#   6. exp_warp_probe2    — banded kernel micro-probe
#   7. bench.py           — re-warm cache for the driver's final run
#
# usage: tools/dev/r4_queue3.sh [start_index]
set -u
cd /root/repo
START=${1:-0}
LOGDIR=/tmp/r4_queue3
mkdir -p "$LOGDIR"

jobs=(
  "bench.py|2400|3"
  "tools/dev/exp_train_prof3.py|5400|5"
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
echo "queue3 done" | tee -a "$LOGDIR/queue.log"
