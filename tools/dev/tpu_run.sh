#!/bin/bash
# Run a python script on the TPU tunnel with retries (claim contention
# after killed processes causes startup hangs; back off and retry).
script="$1"; timeout_s="${2:-300}"; tries="${3:-3}"
for i in $(seq 1 "$tries"); do
  timeout "$timeout_s" python -u "$script" 2>&1 | grep --line-buffered -v -E "WARNING|axon_terminal::http.*WARN"
  code=${PIPESTATUS[0]}
  if [ "$code" -ne 124 ] && [ "$code" -ne 143 ]; then exit "$code"; fi
  echo "[tpu_run] attempt $i timed out (code $code); backing off 60s" >&2
  sleep 60
done
exit 124
