"""TUM trajectory format IO: `timestamp tx ty tz qx qy qz qw`.

Reference parity: `dump_pose_seq_TUM` / pose file conversions in
`<ref>/kitti_eval/pose_evaluation_utils.py` (SURVEY.md R12) — the
reference's snippet outputs are TUM-formatted; tools in that ecosystem
(evo, TUM scripts) consume this layout.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from davo_tpu.core import geometry as geo


def format_poses_tum(poses: np.ndarray, times: np.ndarray | None = None) -> str:
    """(N, 4, 4) absolute poses (+ optional timestamps) -> TUM text."""
    n = len(poses)
    if times is None:
        times = np.arange(n, dtype=np.float64)
    quats = np.asarray(geo.mat_to_quat(jnp.asarray(poses[:, :3, :3], jnp.float32)))
    lines = []
    for i in range(n):
        t = poses[i, :3, 3]
        q = quats[i]
        lines.append(
            f"{times[i]:.6f} {t[0]:.9f} {t[1]:.9f} {t[2]:.9f} "
            f"{q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}"
        )
    return "\n".join(lines) + "\n"


def parse_poses_tum(text: str) -> tuple[np.ndarray, np.ndarray]:
    """TUM text -> (times (N,), poses (N, 4, 4))."""
    rows = np.loadtxt(text.strip().splitlines())
    rows = np.atleast_2d(rows)
    times = rows[:, 0]
    n = len(rows)
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, 3] = rows[:, 1:4]
    poses[:, :3, :3] = np.asarray(
        geo.quat_to_mat(jnp.asarray(rows[:, 4:8], jnp.float32))
    )
    return times, poses


def write_poses_tum(path: str, poses: np.ndarray, times: np.ndarray | None = None) -> None:
    with open(path, "w") as f:
        f.write(format_poses_tum(poses, times))
