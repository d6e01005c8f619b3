#!/bin/bash
# Zero-data quickstart: train the tiny preset on the built-in synthetic
# GT world, run streaming pose inference on a held-out seed, and score
# the trajectory (snippet ATE + KITTI segment errors, Python + C++
# devkit). Finishes in a few minutes on CPU; no dataset required.
# usage: scripts/quickstart_synthetic.sh [workdir] [steps]
set -euo pipefail
WORK=${1:-/tmp/davo_quickstart}; STEPS=${2:-400}
mkdir -p "$WORK"

python -m davo_tpu.cli.main train --version tiny --data synthetic \
    --steps "$STEPS" --checkpoint-dir "$WORK/ckpt" --log-dir "$WORK/logs" \
    --set train.pose_supervision_weight=100 --set train.batch_size=8 \
    --set train.log_every=50

python -m davo_tpu.cli.main infer --version tiny --data synthetic \
    --seq 1 --ckpt "$WORK/ckpt" --out "$WORK/pred_01.txt" \
    --gt-out "$WORK/gt_01.txt"

# snippet_ate* are the meaningful numbers at this 32-frame scale;
# t_err/r_err need >= 100 m of driven path (KITTI segment lengths)
# and are NaN here by design.
python -m davo_tpu.cli.main eval --gt "$WORK/gt_01.txt" \
    --pred "$WORK/pred_01.txt" --devkit
echo "quickstart artifacts in $WORK"
