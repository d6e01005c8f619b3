"""Evaluation: trajectory assembly, ATE, KITTI odometry metrics.

Reference parity: `<ref>/kitti_eval/eval_pose.py` (snippet ATE),
`<ref>/kitti_benchmark/evaluate_odometry.cpp` (t_err %, r_err deg/m
over 100..800 m subsequences) — SURVEY.md R12-R14, §3.3. The Python
implementations here are cross-checked against the C++ devkit
equivalent in tools/kitti_devkit.
"""

from davo_tpu.eval.metrics import (  # noqa: F401
    ate_rmse,
    snippet_ate,
    kitti_seg_errors,
    trajectory_distances,
)
from davo_tpu.eval.runner import predict_sequence, evaluate_sequence  # noqa: F401
from davo_tpu.eval.depth_metrics import depth_errors  # noqa: F401
