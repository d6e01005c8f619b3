#!/bin/bash
# Round-5 queue, session 3 (final session of the final round).
# The session boundary again wiped /tmp (jax cache, world cache,
# checkpoints) — the in-flight queue4 jobs after the serving-gap
# artifact never ran. ~55 min of chip budget: run the two VERDICT-r4
# missing-#2 floor items (ladder4b infinite-world + unsup wander),
# commit each JSON the moment its job exits, then warm the bench
# cache for the driver's round-end run. Arm deadlines (checked at arm
# START, clean exits) are the primary clock; timeouts are backstops.
# World cache is pre-rendered on CPU in parallel (prerender_worlds).
#
# usage: tools/dev/r5_queue6.sh [start_index]
set -u
cd /root/repo
START=${1:-0}
LOGDIR=/tmp/r5_queue6
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

# job spec: cmd|timeout|tries|arm_deadline_utc|outputs|commit_msg
jobs=(
  "tools/dev/exp_quality_ladder4b.py|1800|2|1849|results_r4_quality_gen.json|results: infinite-world generalization arms (r5 queue6)"
  "tools/dev/exp_unsup_wander.py|2400|2|1915|results_r4_unsup_wander.json|results: unsupervised wander-world arms (r5 queue6)"
)

i=-1
for spec in "${jobs[@]}"; do
  i=$((i + 1))
  [ "$i" -lt "$START" ] && continue
  IFS='|' read -r cmd tmo tries ddl outs msg <<< "$spec"
  name=$(basename "$(echo "$cmd" | awk '{print $1}')" .py)
  log="$LOGDIR/${i}_${name}.log"
  echo "=== job $i: $cmd (timeout ${tmo}s ddl ${ddl}Z) $(date -u +%H:%M:%S) -> $log ===" | tee -a "$LOGDIR/queue.log"
  DAVO_ARM_DEADLINE_UTC="$ddl" TPU_RUN_SKIP_PROBE=1 TPU_RUN_LOG="$log.raw" \
    tools/dev/tpu_run.sh "$cmd" "$tmo" "$tries" > "$log" 2>&1
  rc=$?
  echo "=== job $i rc=$rc $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/queue.log"
  commit_results "$outs" "$msg"
done

echo "=== bench warm $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/queue.log"
TPU_RUN_SKIP_PROBE=1 TPU_RUN_LOG="$LOGDIR/bench.log.raw" \
  tools/dev/tpu_run.sh bench.py 1500 2 > "$LOGDIR/bench.log" 2>&1
echo "=== bench rc=$? $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/queue.log"
echo "queue6 done" | tee -a "$LOGDIR/queue.log"
