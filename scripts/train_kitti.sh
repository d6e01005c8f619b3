#!/bin/bash
# Reference parity (<ref>/train.sh): full training run on KITTI odometry.
# usage: scripts/train_kitti.sh <kitti_root> <ckpt_dir> [version] [steps]
set -euo pipefail
ROOT=${1:?kitti root}; CKPT=${2:?ckpt dir}; VERSION=${3:-davo}; STEPS=${4:-200000}
python -m davo_tpu.cli.main train --version "$VERSION" --data "$ROOT" \
    --steps "$STEPS" --checkpoint-dir "$CKPT" --log-dir "$CKPT/logs"
