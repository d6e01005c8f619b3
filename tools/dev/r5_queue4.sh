#!/bin/bash
# Round-5 queue, session 2 (final). The session boundary wiped /tmp
# (jax cache, world cache, queue logs) and the UNCOMMITTED
# results_r5_warp_gate.json — only git survives. Two lessons applied:
#   * every job's result JSON is committed the moment the job exits
#     (any rc — the per-arm files are resumable partials);
#   * the big eval world renders on CPU in parallel
#     (prerender_worlds.py), not behind the chip claim.
# Order = VERDICT r4 ranking with the decisive science first:
#   ladder7 (flow-sup x fixed geo head)  -> gate rerun (flip artifact)
#   -> short SoL/gap artifacts -> ladder4b infinite -> unsup wander
#   -> ratchet (reads the gate JSON; self-evals at the deadline)
#   -> bench warm (driver's round-end bench must hit a warm cache).
#
# usage: tools/dev/r5_queue4.sh [start_index]
set -u
cd /root/repo
START=${1:-0}
LOGDIR=/tmp/r5_queue4
mkdir -p "$LOGDIR"
export DAVO_ARM_DEADLINE_UTC=${DAVO_ARM_DEADLINE_UTC:-2045}
JOB_DEADLINE=${DAVO_JOB_DEADLINE_UTC:-2030}

commit_results() {
  # $1 = space-separated result files, $2 = message. Data-only commit.
  local staged=0
  for f in $1; do
    [ -f "$f" ] && git add -- "$f" && staged=1
  done
  [ "$staged" = 1 ] || return 0
  git diff --cached --quiet && return 0
  git commit -q -m "$2" || true
}

jobs=(
  "tools/dev/exp_quality_ladder7.py|10800|4|results_r5_quality_flowsup.json|results: flow-supervision ladder chip arms (r5 queue)"
  "tools/dev/exp_warp_gate.py|9000|4|results_r5_warp_gate.json|results: banded-warp quality gate chip arms (r5 queue)"
  "tools/dev/exp_ba_sol.py|1800|3|results_r5_ba_sol.json|results: BA Schur-solve speed-of-light artifact (r5 queue)"
  "tools/dev/exp_serving_gap.py|2400|3|results_r5_serving_gap.json|results: serving wall-vs-device gap attribution (r5 queue)"
  "tools/dev/exp_quality_ladder4b.py|9000|3|results_r4_quality_gen.json|results: infinite-world generalization arms (r5 queue)"
  "tools/dev/exp_unsup_wander.py|7200|3|results_r4_unsup_wander.json|results: unsupervised wander-world arms (r5 queue)"
  "tools/dev/exp_ratchet_r5.py|12000|3|results_r5_ratchet.json|results: r5 quality-ratchet run (r5 queue)"
)

i=-1
for spec in "${jobs[@]}"; do
  i=$((i + 1))
  [ "$i" -lt "$START" ] && continue
  now=$(date -u +%H%M)
  if [ "$now" -ge "$JOB_DEADLINE" ] && [ "$now" -lt 2200 ]; then
    echo "=== budget stop before job $i ($now UTC) ===" | tee -a "$LOGDIR/queue.log"
    break
  fi
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

echo "=== bench warm $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/queue.log"
TPU_RUN_SKIP_PROBE=1 TPU_RUN_LOG="$LOGDIR/bench.log.raw" \
  tools/dev/tpu_run.sh bench.py 2400 3 > "$LOGDIR/bench.log" 2>&1
echo "=== bench rc=$? $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/queue.log"
echo "queue4 done" | tee -a "$LOGDIR/queue.log"
