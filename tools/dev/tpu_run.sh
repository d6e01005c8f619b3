#!/bin/bash
# Run a python script on the TPU tunnel. The chip claim can hang
# indefinitely after a killed TPU process, so FIRST cycle a cheap probe
# (90 s timeout, up to $tries attempts with 60 s backoff) until the
# chip answers, THEN run the main script once with the full timeout.
script="$1"; timeout_s="${2:-300}"; tries="${3:-5}"
probe='import jax, jax.numpy as jnp; print(float(jax.jit(lambda x: x.sum())(jnp.ones((128,128))).block_until_ready()))'
for i in $(seq 1 "$tries"); do
  if timeout 90 python -c "$probe" > /dev/null 2>&1; then
    break
  fi
  echo "[tpu_run] probe attempt $i failed; backing off 60s" >&2
  sleep 60
  if [ "$i" -eq "$tries" ]; then
    echo "[tpu_run] chip never answered after $tries probes" >&2
    exit 124
  fi
done
timeout "$timeout_s" python -u "$script" 2>&1 | grep --line-buffered -v -E "WARNING|axon_terminal::http.*WARN"
exit "${PIPESTATUS[0]}"
