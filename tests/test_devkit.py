"""C++ devkit evaluator: build, GT==0, cross-check vs Python metrics,
CLI parity (SURVEY.md §4.2)."""

import json
import os
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.core import geometry as geo
from davo_tpu.data.kitti import write_poses_kitti
from davo_tpu.eval.devkit import _DEVKIT_DIR, kitti_seg_errors_cpp
from davo_tpu.eval.metrics import kitti_seg_errors


def random_drive(rng, n=1500):
    """Forward drive with curvature noise, ~1 m/frame: covers 800 m."""
    xi = np.zeros((n - 1, 6))
    xi[:, 2] = 1.0 + rng.normal(0, 0.05, n - 1)
    xi[:, 4] = rng.normal(0, 0.002, n - 1)  # yaw wobble
    rel = np.asarray(geo.se3_exp(jnp.asarray(xi, jnp.float32)), np.float64)
    acc = [np.eye(4)]
    for r in rel:
        acc.append(acc[-1] @ r)
    return np.stack(acc)


def corrupt(poses, rng, t_sigma=0.02, r_sigma=2e-3):
    xi = np.concatenate(
        [
            rng.normal(0, t_sigma, (len(poses) - 1, 3)),
            rng.normal(0, r_sigma, (len(poses) - 1, 3)),
        ],
        axis=1,
    )
    noise = np.asarray(geo.se3_exp(jnp.asarray(xi, jnp.float32)), np.float64)
    rel = np.linalg.inv(poses[:-1]) @ poses[1:]
    acc = [poses[0]]
    for i in range(len(rel)):
        acc.append(acc[-1] @ (noise[i] @ rel[i]))
    return np.stack(acc)


class TestDevkit:
    def test_gt_vs_gt_zero(self, rng):
        gt = random_drive(rng)
        out = kitti_seg_errors_cpp(gt, gt)
        assert out["n_segments"] > 0
        assert out["t_err_pct"] == pytest.approx(0.0, abs=1e-9)
        assert out["r_err_deg_per_100m"] == pytest.approx(0.0, abs=1e-9)

    def test_matches_python(self, rng):
        gt = random_drive(rng)
        pred = corrupt(gt, rng)
        cpp = kitti_seg_errors_cpp(gt, pred)
        py = kitti_seg_errors(gt, pred)
        assert cpp["n_segments"] == len(py["segments"])
        assert cpp["t_err_pct"] == pytest.approx(py["t_err_pct"], rel=1e-5)
        assert cpp["r_err_deg_per_100m"] == pytest.approx(
            py["r_err_deg_per_100m"], rel=1e-5
        )

    def test_cli(self, rng, tmp_path):
        subprocess.run(
            ["make", "-C", _DEVKIT_DIR, "evaluate_odometry"],
            check=True,
            capture_output=True,
        )
        gt = random_drive(rng, n=1200)
        pred = corrupt(gt, rng)
        gt_path = str(tmp_path / "gt.txt")
        pred_path = str(tmp_path / "pred.txt")
        write_poses_kitti(gt_path, gt)
        write_poses_kitti(pred_path, pred)
        out = subprocess.run(
            [os.path.join(_DEVKIT_DIR, "evaluate_odometry"), gt_path, pred_path],
            check=True,
            capture_output=True,
            text=True,
        )
        parsed = json.loads(out.stdout)
        py = kitti_seg_errors(gt, pred)
        # File round-trip truncates to the 9-sig-digit text format.
        assert parsed["t_err_pct"] == pytest.approx(py["t_err_pct"], rel=1e-4)
        assert parsed["n_segments"] == len(py["segments"])

    def test_short_sequence(self, rng):
        gt = random_drive(rng, n=50)
        out = kitti_seg_errors_cpp(gt, gt)
        assert out["n_segments"] == 0
        assert np.isnan(out["t_err_pct"])
