#!/bin/bash
# Round-5 serial TPU job queue — the round's canonical job list
# (collapsed from the session queues r5_queue{,1b,2,3,4,5}.sh after
# the round; r5_queue6.sh is the final session's live queue with the
# commit-on-exit + per-job arm-deadline protocol).
#
# Protocol as r3/r4: each job hang-protected by tpu_run.sh, resumable
# per-arm JSONs, ONE TPU process at a time (CLAUDE.md). Two r5
# protocol additions, learned the hard way:
#   * every job's result JSON is committed the moment the job exits —
#     session boundaries wipe /tmp AND uncommitted files;
#   * big eval worlds pre-render on CPU in parallel
#     (prerender_worlds.py), never behind the chip claim.
#
# usage: tools/dev/r5_queue.sh [start_index]
set -u
cd /root/repo
START=${1:-0}
LOGDIR=/tmp/r5_queue
mkdir -p "$LOGDIR"

commit_results() {
  local staged=0
  for f in $1; do
    [ -f "$f" ] && git add -- "$f" && staged=1
  done
  [ "$staged" = 1 ] || return 0
  git diff --cached --quiet && return 0
  git commit -q -m "$2" || true
}

jobs=(
  # 0. geo-solver oracle on GT flow (CPU-light but chip-verified;
  #    settled the r4 geo_hybrid blame split: solver overshoot)
  "tools/dev/exp_geo_oracle.py|3600|3|results_r5_geo_oracle.json|results: geo-solver GT-flow oracle"
  # 1. rotational-flow pixel scale (names the sub-pixel mechanism)
  "tools/dev/exp_rotflow_scale.py|1800|3|results_r5_rotflow_scale.json|results: rotational-flow scale"
  # 2. flow-supervision ladder (VERDICT r4 next-#2)
  "tools/dev/exp_quality_ladder7.py|10800|4|results_r5_quality_flowsup.json|results: flow-supervision ladder chip arms"
  # 3. banded-warp quality gate (VERDICT r4 next-#1; PASSED -> flip)
  "tools/dev/exp_warp_gate.py|9000|4|results_r5_warp_gate.json|results: banded-warp quality gate chip arms"
  # 4. BA Schur-solve speed-of-light artifact (VERDICT r4 next-#5)
  "tools/dev/exp_ba_sol.py|1800|3|results_r5_ba_sol.json|results: BA Schur-solve speed-of-light artifact"
  # 5. serving wall-vs-device gap attribution (VERDICT r4 next-#6)
  "tools/dev/exp_serving_gap.py|2400|3|results_r5_serving_gap.json|results: serving wall-vs-device gap attribution"
  # 6. infinite-world generalization arms (VERDICT r4 missing-#2)
  "tools/dev/exp_quality_ladder4b.py|9000|3|results_r4_quality_gen.json|results: infinite-world generalization arms"
  # 7. unsupervised wander-world arms (VERDICT r4 missing-#2)
  "tools/dev/exp_unsup_wander.py|7200|3|results_r4_unsup_wander.json|results: unsupervised wander-world arms"
  # 8. composed quality-ratchet run (VERDICT r4 next-#4; reads the
  #    gate JSON + ladder7 winner; resumable Orbax fit)
  "tools/dev/exp_ratchet_r5.py|12000|3|results_r5_ratchet.json|results: r5 quality-ratchet run"
)

i=-1
for spec in "${jobs[@]}"; do
  i=$((i + 1))
  [ "$i" -lt "$START" ] && continue
  IFS='|' read -r cmd tmo tries outs msg <<< "$spec"
  name=$(basename "$(echo "$cmd" | awk '{print $1}')" .py)
  log="$LOGDIR/${i}_${name}.log"
  echo "=== job $i: $cmd (timeout ${tmo}s) $(date -u +%H:%M:%S) -> $log ===" | tee -a "$LOGDIR/queue.log"
  TPU_RUN_SKIP_PROBE=1 TPU_RUN_LOG="$log.raw" tools/dev/tpu_run.sh "$cmd" "$tmo" "$tries" \
    > "$log" 2>&1
  rc=$?
  echo "=== job $i rc=$rc $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/queue.log"
  commit_results "$outs" "$msg"
done

# Round-end: warm the compile cache for the driver's bench run.
echo "=== bench warm $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/queue.log"
TPU_RUN_SKIP_PROBE=1 TPU_RUN_LOG="$LOGDIR/bench.log.raw" \
  tools/dev/tpu_run.sh bench.py 2400 3 > "$LOGDIR/bench.log" 2>&1
echo "=== bench rc=$? $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/queue.log"
echo "r5 queue done" | tee -a "$LOGDIR/queue.log"
