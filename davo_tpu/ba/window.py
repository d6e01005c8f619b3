"""Sliding-window BA orchestration over a VO trajectory.

Builds fixed-shape `BAProblem`s from the VO front-end outputs (poses +
depth maps; correspondences from projected grid landmarks, optionally
flow-corrected), refines each window with `ba_refine`, and stitches the
refined increments back into the global trajectory. BASELINE config #4
(single host); `ba/sharded.py` distributes the landmark axis (#5).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from davo_tpu.config import BAConfig
from davo_tpu.ba.gn import BAProblem, ba_refine
from davo_tpu.core import geometry as geo


def window_starts(n_frames: int, window_size: int, stride: int) -> list[int]:
    """Start indices covering [0, n_frames) with sliding windows.

    The stride loop alone can stop short of the tail (len=10, M=5,
    stride=2 -> last start 4, frame 9 never refined); a final window
    clamped to end at n_frames guarantees full coverage.
    """
    starts = list(range(0, max(n_frames - window_size + 1, 1), stride))
    last = max(n_frames - window_size, 0)
    if starts[-1] != last:
        starts.append(last)
    return starts


def sample_grid_landmarks(
    depth: np.ndarray, K: np.ndarray, pose_wc: np.ndarray, step: int = 8
) -> np.ndarray:
    """Backproject a sparse pixel grid of a keyframe to world points.

    depth: (H, W); pose_wc: (4, 4) cam-to-world. Returns (N, 3).
    """
    H, W = depth.shape
    vs, us = np.mgrid[step // 2 : H : step, step // 2 : W : step]
    us, vs = us.ravel(), vs.ravel()
    z = depth[vs, us]
    x = (us - K[0, 2]) / K[0, 0] * z
    y = (vs - K[1, 2]) / K[1, 1] * z
    p_c = np.stack([x, y, z], -1)
    return (pose_wc[:3, :3] @ p_c.T).T + pose_wc[:3, 3]


def build_window_problem(
    poses_wc: np.ndarray,
    depths: np.ndarray,
    K: np.ndarray,
    step: int = 8,
    obs_noise: np.ndarray | None = None,
) -> BAProblem:
    """Construct a BA window from per-keyframe poses + depths.

    Landmarks: grid-backprojected from every keyframe (owner frame).
    Observations: landmarks projected into every window frame, masked
    to the image bounds and positive depth. `obs_noise` (same shape as
    observations) can inject measurement noise for tests.

    poses_wc: (M, 4, 4) cam-to-world; depths: (M, H, W).
    """
    M = len(poses_wc)
    H, W = depths[0].shape
    pts = np.concatenate(
        [
            sample_grid_landmarks(depths[i], K, poses_wc[i], step)
            for i in range(M)
        ],
        axis=0,
    )
    poses_cw = np.linalg.inv(poses_wc)
    # Project to build observations (host-side, small).
    R = poses_cw[:, :3, :3]
    t = poses_cw[:, :3, 3]
    p_c = np.einsum("mij,nj->mni", R, pts) + t[:, None, :]
    z = p_c[..., 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = K[0, 0] * p_c[..., 0] / z + K[0, 2]
        v = K[1, 1] * p_c[..., 1] / z + K[1, 2]
    obs = np.stack([u, v], -1)
    mask = (
        (z > 0.1) & (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    ).astype(np.float32)
    obs = np.nan_to_num(obs)
    if obs_noise is not None:
        obs = obs + obs_noise
    return BAProblem(
        poses_cw=jnp.asarray(poses_cw, jnp.float32),
        points_w=jnp.asarray(pts, jnp.float32),
        K=jnp.asarray(K, jnp.float32),
        observations=jnp.asarray(obs, jnp.float32),
        mask=jnp.asarray(mask, jnp.float32),
    )


class SlidingWindowBA:
    """Refine a full trajectory window by window.

    For each window of `cfg.window_size` keyframes (stride = size//2),
    runs damped GN and writes the refined poses back; overlapping
    windows are chained by anchoring each window's first pose to the
    already-refined trajectory (gauge fixing in `solve_window`).
    """

    def __init__(self, cfg: BAConfig):
        self.cfg = cfg

    def refine_trajectory(
        self,
        poses_wc: np.ndarray,
        depths: np.ndarray,
        K: np.ndarray,
        grid_step: int = 8,
        obs_noise_fn=None,
        obs_poses: np.ndarray | None = None,
    ) -> np.ndarray:
        """Refine `poses_wc` window by window.

        Observations must be MEASUREMENTS independent of the poses
        being refined — otherwise every residual is zero by
        construction and BA is a no-op. `obs_poses` supplies the
        poses used to project landmark observations (e.g. synthetic
        GT as an oracle, or — r2 — flow-tracked correspondences
        replace projection entirely). Defaults to `poses_wc` with a
        loud warning so accidental self-consistency is visible.
        """
        if obs_poses is None:
            import warnings

            warnings.warn(
                "refine_trajectory: observations projected from the "
                "poses being refined are self-consistent (zero "
                "residual) — pass obs_poses or flow tracks",
                stacklevel=2,
            )
            obs_poses = poses_wc
        M = self.cfg.window_size
        out = poses_wc.copy()
        stride = max(M // 2, 1)
        for start in window_starts(len(out), M, stride):
            end = min(start + M, len(out))
            if end - start < 3:
                break
            win_depths = depths[start:end]
            noise = obs_noise_fn(end - start) if obs_noise_fn else None
            prob = build_window_problem(
                obs_poses[start:end], win_depths, K, grid_step, noise
            )
            # Initialize the solve at the trajectory being refined;
            # first two poses anchor the window to it (gauge).
            prob = prob._replace(
                poses_cw=jnp.asarray(
                    np.linalg.inv(out[start:end]), jnp.float32
                )
            )
            refined = ba_refine(prob, self.cfg)
            new_wc = np.linalg.inv(np.asarray(refined.poses_cw))
            out[start + 2 : end] = new_wc[2:]
        return out
