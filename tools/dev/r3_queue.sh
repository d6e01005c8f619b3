#!/bin/bash
# Round-3 serial TPU job queue. Each job is hang-protected by
# tpu_run.sh and (where the script supports it) resumable, so a dead
# tunnel mid-queue loses nothing — rerun this script and completed
# work is skipped. ONE TPU process at a time (CLAUDE.md).
#
# usage: tools/dev/r3_queue.sh [start_index]
set -u
cd /root/repo
START=${1:-0}
LOGDIR=/tmp/r3_queue
mkdir -p "$LOGDIR"

jobs=(
  # 1. Mosaic bisect stages (fast; inform the kernel rewrite)
  "tools/dev/exp_mosaic_caps3.py|1800|3"
  "tools/dev/exp_mosaic_caps4.py|1500|3"
  # 2. Full kernel-family bisect after fixes
  "tools/dev/exp_conv2d_chain.py|2400|3"
  # 3. In-context serving probes -> BENCH_FLAGS promotion
  "tools/dev/exp_costvol_rows.py|3600|3"
  # 4. Absolute-quality ladder (VERDICT #3 + rot_weight diagnosis)
  "tools/dev/exp_quality_ladder.py|9000|2"
  # 5. automin default revalidation (r2 queue #5)
  "tools/dev/train_e2e.py 2500 /root/repo/results_r3_e2e_automin.json automin 250|7200|2"
  # 6. long-sequence profile (flips the SURVEY 'partial')
  "tools/dev/exp_longseq.py|3600|2"
  # 7. serving latency sweep
  "tools/dev/exp_latency.py|2400|2"
  # 8. training-step throughput sweep
  "tools/dev/exp_train_prof.py|3600|2"
  # 9. fb-consistency attention cue + davo-fast-knob quality gates
  #    (vs flow_seg on the same dynamic worlds; none/flow/flow_seg
  #    triple is already recorded in attention_ablation.json)
  "tools/dev/exp_attention_ablation.py 2000 /root/repo/attention_ablation_r3.json flow_seg,flow_seg_fb,flow_seg_fast|10800|2"
  # 10. SC-SfMLearner geometry-consistency + depth_norm unsup arms
  "tools/dev/exp_unsup_geo.py 2500 /root/repo/results_r3_unsup_geo.json 0.0,0.5,0.5n,0.0f|14400|2"
  # 11. warm cache + headline
  "bench.py|1200|3"
)

i=-1
for spec in "${jobs[@]}"; do
  i=$((i + 1))
  [ "$i" -lt "$START" ] && continue
  IFS='|' read -r cmd tmo tries <<< "$spec"
  name=$(echo "$cmd" | awk '{print $1}' | xargs basename .py)
  log="$LOGDIR/${i}_${name}.log"
  echo "=== job $i: $cmd (timeout ${tmo}s) -> $log ===" | tee -a "$LOGDIR/queue.log"
  TPU_RUN_LOG="$log.raw" tools/dev/tpu_run.sh "$cmd" "$tmo" "$tries" \
    > "$log" 2>&1
  echo "=== job $i rc=$? ===" | tee -a "$LOGDIR/queue.log"
done
echo "queue done" | tee -a "$LOGDIR/queue.log"
