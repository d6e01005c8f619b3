"""Flow-tracked BA observations: chaining accuracy vs exact projection,
forward-backward gating, and pose recovery with NO GT-pose oracle
(VERDICT r1 missing #2 / BASELINE configs #4-#5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.ba.tracks import (
    anchor_grid,
    bilinear_at,
    build_tracked_problem,
    refine_trajectory_tracked,
    track_window,
)
from davo_tpu.config import BAConfig
from davo_tpu.core import geometry as geo
from davo_tpu.data.synthetic import DYNAMIC_LABEL_START, SyntheticSequence


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(
        n_frames=10, height=48, width=64, seed=2,
        plane_z=15.0, forward_speed=1.0,
    )


def gt_flow_fn(seq):
    return lambda i, j: seq.gt_flow(i, j)


def project(seq, pts_w, frame):
    C_inv = np.linalg.inv(seq.poses[frame])
    p_c = pts_w @ C_inv[:3, :3].T + C_inv[:3, 3]
    u = seq.K[0, 0] * p_c[:, 0] / p_c[:, 2] + seq.K[0, 2]
    v = seq.K[1, 1] * p_c[:, 1] / p_c[:, 2] + seq.K[1, 2]
    return np.stack([u, v], -1)


class TestTracking:
    def test_bilinear_at_exact_on_grid(self):
        field = np.arange(24, dtype=np.float64).reshape(4, 6)[..., None]
        uv = np.array([[2.0, 1.0], [5.0, 3.0]])
        np.testing.assert_allclose(
            bilinear_at(field, uv)[:, 0],
            [field[1, 2, 0], field[3, 5, 0]],
            atol=1e-4,  # border coords clip by 1e-6 px
        )

    def test_chained_tracks_match_projection(self, seq):
        """Chaining exact GT flows must land where the GT geometry
        projects the anchor landmarks (subpixel)."""
        M = 6
        ff = np.stack([seq.gt_flow(i, i + 1) for i in range(M - 1)])
        fb = np.stack([seq.gt_flow(i + 1, i) for i in range(M - 1)])
        uv0 = anchor_grid(48, 64, 8)
        obs, valid = track_window(ff, fb, uv0, fb_px=1.0)
        assert valid[-1].mean() >= 0.4  # survivors (fast motion: half leave frame)
        # Exact projections of the anchor backprojection.
        z = bilinear_at(seq.depth(0)[..., None], uv0)[:, 0]
        x = (uv0[:, 0] - seq.K[0, 2]) / seq.K[0, 0] * z
        y = (uv0[:, 1] - seq.K[1, 2]) / seq.K[1, 1] * z
        p_c = np.stack([x, y, z], -1)
        pts_w = p_c @ seq.poses[0][:3, :3].T + seq.poses[0][:3, 3]
        for m in range(M):
            ref = project(seq, pts_w, m)
            err = np.linalg.norm((obs[m] - ref)[valid[m]], axis=-1)
            assert np.median(err) < 0.3, (m, np.median(err))

    def test_fb_gating_rejects_corrupted_flow(self, seq):
        M = 4
        ff = np.stack([seq.gt_flow(i, i + 1) for i in range(M - 1)])
        fb = np.stack([seq.gt_flow(i + 1, i) for i in range(M - 1)])
        # Corrupt the forward flow in the left half of frame 1.
        ff_bad = ff.copy()
        ff_bad[1, :, :32] += 5.0
        uv0 = anchor_grid(48, 64, 8)
        _, valid_clean = track_window(ff, fb, uv0, fb_px=1.0)
        _, valid_bad = track_window(ff_bad, fb, uv0, fb_px=1.0)
        # Tracks passing through the corrupted half die at frame 2+.
        killed = valid_clean[-1] & ~valid_bad[-1]
        assert killed.sum() > 10
        # Tracks in the clean half survive.
        assert (valid_bad[-1] & (uv0[:, 0] > 40)).sum() > 5

    def test_dynamic_labels_excluded_from_anchors(self):
        dyn = SyntheticSequence(
            n_frames=4, height=48, width=64, seed=3, n_dynamic=3
        )
        seg = dyn.seg(0)
        uv_all = anchor_grid(48, 64, 4)
        uv = anchor_grid(
            48, 64, 4, seg=seg,
            exclude_labels=tuple(range(DYNAMIC_LABEL_START, 19)),
        )
        assert len(uv) < len(uv_all)
        labels = seg[uv[:, 1].astype(int), uv[:, 0].astype(int)]
        assert labels.max() < DYNAMIC_LABEL_START


class TestTrackedBA:
    def test_refines_without_pose_oracle(self, seq):
        """Perturbed trajectory + flow-tracked observations (NO GT
        poses anywhere in the observation path) -> pose recovery."""
        rng = np.random.default_rng(0)
        gt = seq.poses.copy()
        depths = np.stack([seq.depth(i) for i in range(10)])
        noisy = gt.copy()
        for i in range(2, 10):
            xi = rng.normal(0, 0.01, 6)
            noisy[i] = noisy[i] @ np.asarray(geo.se3_exp(jnp.asarray(xi)))
        cfg = BAConfig(
            window_size=6, max_iterations=8, damping=1e-4, huber_delta=3.0
        )
        out = refine_trajectory_tracked(
            cfg, noisy, depths, seq.K, gt_flow_fn(seq), grid_step=6
        )
        err_before = np.linalg.norm(
            noisy[2:, :3, 3] - gt[2:, :3, 3], axis=-1
        ).mean()
        err_after = np.linalg.norm(
            out[2:, :3, 3] - gt[2:, :3, 3], axis=-1
        ).mean()
        assert err_after < err_before * 0.3, (err_before, err_after)

    def test_tracked_problem_mask_shapes(self, seq):
        ff = np.stack([seq.gt_flow(i, i + 1) for i in range(3)])
        fb = np.stack([seq.gt_flow(i + 1, i) for i in range(3)])
        uv0 = anchor_grid(48, 64, 8)
        obs, valid = track_window(ff, fb, uv0)
        prob = build_tracked_problem(
            seq.poses[:4], seq.depth(0), seq.K, obs, valid
        )
        assert prob.observations.shape == (4, len(uv0), 2)
        assert prob.mask.shape == (4, len(uv0))
        # Anchor-frame observations are always valid.
        assert np.asarray(prob.mask)[0].min() == 1.0
