#!/bin/bash
# Round-5 queue, part 3 — runs after part 2: an optional follow-up
# job file (written mid-round once results are in — e.g. a flow-sup
# ratchet arm), then one bench.py pass so the driver's round-end bench
# finds BOTH model compiles (davo-fast + the new davo parity side
# measurement) warm in /tmp/jax_cache.
set -u
cd /root/repo
LOGDIR=/tmp/r5_queue3
mkdir -p "$LOGDIR"
export DAVO_ARM_DEADLINE_UTC=${DAVO_ARM_DEADLINE_UTC:-2000}

for _ in $(seq 1 1200); do
  grep -q "queue2 done" /tmp/r5_queue2/queue.log 2>/dev/null && break
  sleep 30
done
echo "part 2 done; part 3 starting $(date -u +%H:%M:%S)" | tee -a "$LOGDIR/queue.log"

if [ -x tools/dev/r5_followup.sh ]; then
  echo "=== followup $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/queue.log"
  tools/dev/r5_followup.sh > "$LOGDIR/followup.log" 2>&1
  echo "=== followup rc=$? $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/queue.log"
fi

echo "=== bench warm $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/queue.log"
TPU_RUN_SKIP_PROBE=1 TPU_RUN_LOG="$LOGDIR/bench.log.raw" \
  tools/dev/tpu_run.sh bench.py 2400 3 > "$LOGDIR/bench.log" 2>&1
echo "=== bench rc=$? $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/queue.log"
echo "queue3 done" | tee -a "$LOGDIR/queue.log"
