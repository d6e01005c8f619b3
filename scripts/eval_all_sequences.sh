#!/bin/bash
# Reference parity (<ref>/*.sh, SURVEY.md R15): loop KITTI odometry
# sequences 00-10, predict trajectories, evaluate each (py + C++ devkit).
# usage: scripts/eval_all_sequences.sh <kitti_root> <ckpt_dir> <out_dir> [version]
set -euo pipefail
ROOT=${1:?kitti root}; CKPT=${2:?ckpt dir}; OUT=${3:?out dir}; VERSION=${4:-davo}
mkdir -p "$OUT"
for seq in 00 01 02 03 04 05 06 07 08 09 10; do
  echo "=== sequence $seq ==="
  python -m davo_tpu.cli.main infer --version "$VERSION" --data "$ROOT" \
      --seq "$seq" --ckpt "$CKPT" --out "$OUT/$seq.txt"
  if [ -f "$ROOT/poses/$seq.txt" ]; then
    python -m davo_tpu.cli.main eval --gt "$ROOT/poses/$seq.txt" \
        --pred "$OUT/$seq.txt" --devkit | tee "$OUT/$seq.metrics.json"
  fi
done
