#!/bin/bash
# Round-5 queue, part 5: after queue4 (incl. its bench warm) releases
# the chip, re-run exp_ba_sol — the single-window rows are done and
# skip; only the new vmap-batched window entries run (~5 min). Then
# commit the updated artifact. Must end well before the driver's
# round-end bench (~22:50Z); queue4 finishes ~21:30Z.
set -u
cd /root/repo
LOGDIR=/tmp/r5_queue5
mkdir -p "$LOGDIR"

for _ in $(seq 1 960); do
  grep -q "queue4 done" /tmp/r5_queue4/queue.log 2>/dev/null && break
  sleep 30
done
# Hard stop: never start if the driver's bench window is near.
now=$(date -u +%H%M)
if [ "$now" -ge 2215 ] && [ "$now" -lt 2359 ]; then
  echo "too late ($now UTC); skipping" | tee -a "$LOGDIR/queue.log"
  exit 0
fi
echo "=== ba_sol batched $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/queue.log"
TPU_RUN_SKIP_PROBE=1 TPU_RUN_LOG="$LOGDIR/ba.log.raw" \
  tools/dev/tpu_run.sh tools/dev/exp_ba_sol.py 1500 2 > "$LOGDIR/ba.log" 2>&1
echo "=== rc=$? $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/queue.log"
if ! git diff --quiet -- results_r5_ba_sol.json 2>/dev/null || \
   git status --porcelain results_r5_ba_sol.json | grep -q .; then
  git add results_r5_ba_sol.json && \
    git commit -q -m "results: vmap-batched BA window solve entries (dispatch-floor amortization)" || true
fi
echo "queue5 done" | tee -a "$LOGDIR/queue.log"
