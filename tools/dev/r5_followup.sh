#!/bin/bash
# r5 followup hook — run by r5_queue3.sh after queue 2 finishes.
#
# Decides on CPU (no chip claim) what the followup budget buys:
#   * ladder7 produced a compose-worthy winner (beats the tiny conv
#     anchor by >= 1 t_err point, or moves held-out rot corr past
#     0.3) -> run the res128 composition arm (exp_followup_compose).
#   * otherwise -> extend the ratchet run on the proven-live steps
#     axis (12k -> 18k, same Orbax checkpoint).
# Skips entirely if the round budget deadline already passed — the
# queue-3 bench warm still needs the remaining chip window.
set -u
cd /root/repo
DDL=${DAVO_ARM_DEADLINE_UTC:-2000}
now=$(date -u +%H%M)
if [ "$now" -ge "$DDL" ] && [ "$now" -lt 2200 ]; then
  echo "followup: deadline $DDL passed ($now UTC) — skipping"
  exit 0
fi

if env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo/tools/dev")
from exp_followup_compose import decide
d, why = decide()
print("followup decision:", d and d[:3], "|", why)
sys.exit(0 if d else 3)
EOF
then
  TPU_RUN_SKIP_PROBE=1 tools/dev/tpu_run.sh \
    tools/dev/exp_followup_compose.py 10800 3
else
  echo "followup: no compose winner — extending the ratchet to 18k"
  DAVO_RATCHET_TOTAL=18000 TPU_RUN_SKIP_PROBE=1 tools/dev/tpu_run.sh \
    tools/dev/exp_ratchet_r5.py 10800 3
fi
