#!/bin/bash
# Run a python script on the TPU tunnel. The axon plugin handshake at
# interpreter startup (sitecustomize) can hang indefinitely after any
# killed TPU process, so: (1) cycle a cheap probe until the chip
# answers, (2) launch the main script under a STARTUP WATCHDOG — if it
# accrues <0.5 s of CPU in its first 120 s it is stuck in the
# handshake; kill it, back off, relaunch. A process past startup runs
# to completion under the full timeout. Output streams to $LOG (tail
# it for live progress) and is echoed, filtered, at the end.
# $1 may be "script.py arg1 arg2": split into script + args.
read -r script scriptargs <<< "$1"; timeout_s="${2:-300}"; tries="${3:-5}"
LOG="${TPU_RUN_LOG:-/tmp/tpu_run_$$.log}"
echo "[tpu_run] log: $LOG" >&2
probe='import jax, jax.numpy as jnp; print(float(jax.jit(lambda x: x.sum())(jnp.ones((128,128))).block_until_ready()))'
# TPU_RUN_SKIP_PROBE=1 launches the script directly: when the tunnel
# claim is flaky (succeeds ~1 in N), the probe phase burns attempts a
# separate process already paid for — the startup watchdog below
# handles claim hangs either way (r3 wedge protocol).
if [ -z "${TPU_RUN_SKIP_PROBE:-}" ]; then
  for i in $(seq 1 "$tries"); do
    if timeout 90 python -c "$probe" > /dev/null 2>&1; then break; fi
    echo "[tpu_run] probe attempt $i failed; backing off 60s" >&2
    sleep 60
    if [ "$i" -eq "$tries" ]; then
      echo "[tpu_run] chip never answered after $tries probes" >&2
      exit 124
    fi
  done
  sleep 10
fi
for i in $(seq 1 "$tries"); do
  : > "$LOG"
  timeout "$timeout_s" python -u "$script" $scriptargs >> "$LOG" 2>&1 &
  tpid=$!
  sleep 120
  pypid=$(pgrep -P "$tpid" | head -1)
  [ -z "$pypid" ] && pypid="$tpid"
  jiffies=$(awk '{print $14+$15}' "/proc/$pypid/stat" 2>/dev/null || echo 9999)
  if [ "$jiffies" -lt 50 ] 2>/dev/null; then
    echo "[tpu_run] startup watchdog: pid $pypid stuck in claim ($jiffies jiffies); kill + retry $i" >&2
    kill "$pypid" 2>/dev/null; sleep 2; kill -9 "$pypid" 2>/dev/null
    wait "$tpid" 2>/dev/null
    sleep 60
    continue
  fi
  wait "$tpid"; rc=$?
  grep -v -E "WARNING|axon_terminal::http.*WARN" "$LOG"
  exit "$rc"
done
echo "[tpu_run] startup never succeeded after $tries attempts" >&2
exit 124
