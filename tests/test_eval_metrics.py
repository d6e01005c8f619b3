"""Metric tests (SURVEY.md §4.2): GT-vs-GT == 0, synthetic corruptions
give analytically known errors."""

import numpy as np
import pytest

from davo_tpu.eval.metrics import (
    ate_rmse,
    kitti_seg_errors,
    snippet_ate,
    trajectory_distances,
)


def straight_line_traj(n, step=1.0):
    """Drive straight along +z at `step` m/frame."""
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 2, 3] = np.arange(n) * step
    return poses


class TestTrajectoryDistances:
    def test_straight_line(self):
        d = trajectory_distances(straight_line_traj(5, 2.0))
        np.testing.assert_allclose(d, [0, 2, 4, 6, 8])


class TestKittiSegErrors:
    def test_gt_vs_gt_is_zero(self):
        gt = straight_line_traj(1200, 1.0)  # 1.2 km: all lengths present
        out = kitti_seg_errors(gt, gt)
        assert out["t_err_pct"] == pytest.approx(0.0, abs=1e-9)
        assert out["r_err_deg_per_100m"] == pytest.approx(0.0, abs=1e-9)
        assert len(out["segments"]) > 0

    def test_known_scale_drift(self):
        """Pred travels 1% further per meter -> t_err ~= 1%.

        Official-devkit tie semantics: at 1 m/frame every segment end
        lands STRICTLY past the target, so a nominal-L segment actually
        spans L+1 m and t_err = 1% * (L+1)/L per length — computable
        exactly."""
        gt = straight_line_traj(1200, 1.0)
        pred = straight_line_traj(1200, 1.01)
        out = kitti_seg_errors(gt, pred)
        # Per-segment analytic value: 1% * (L+1)/L; average over the
        # actual segment set (long lengths fit fewer start frames).
        expect = 1.0 * np.mean([(l + 1) / l for _, l, _, _ in out["segments"]])
        assert out["t_err_pct"] == pytest.approx(expect, rel=1e-6)
        assert all(
            t * 100 == pytest.approx(1.0 * (l + 1) / l, rel=1e-6)
            for _, l, t, _ in out["segments"]
        )
        assert out["r_err_deg_per_100m"] == pytest.approx(0.0, abs=1e-9)

    def test_known_rotation_drift(self):
        """Constant yaw drift of r rad/frame at 1 m/frame ->
        r_err = r rad/m exactly (relative rotation over L m = r*L)."""
        n, r = 1200, 1e-4
        gt = straight_line_traj(n, 1.0)
        pred = np.tile(np.eye(4), (n, 1, 1))
        pos = np.zeros(3)
        yaw = 0.0
        for i in range(n):
            pred[i, :3, :3] = np.array(
                [
                    [np.cos(yaw), 0, np.sin(yaw)],
                    [0, 1, 0],
                    [-np.sin(yaw), 0, np.cos(yaw)],
                ]
            )
            pred[i, :3, 3] = pos
            dirv = pred[i, :3, :3] @ np.array([0, 0, 1.0])
            pos = pos + dirv
            yaw += r
        out = kitti_seg_errors(gt, pred)
        # Tie overshoot (see scale-drift test): actual span L+1 frames.
        expect = np.degrees(r) * 100.0 * np.mean(
            [(l + 1) / l for _, l, _, _ in out["segments"]]
        )
        assert out["r_err_deg_per_100m"] == pytest.approx(expect, rel=1e-3)

    def test_short_sequence_nan(self):
        gt = straight_line_traj(50, 1.0)  # < 100 m of path
        out = kitti_seg_errors(gt, gt)
        assert np.isnan(out["t_err_pct"])


class TestATE:
    def test_identical_zero(self):
        gt = straight_line_traj(100, 1.0)
        assert ate_rmse(gt, gt) == pytest.approx(0.0, abs=1e-12)

    def test_scale_aligned(self):
        """Monocular scale ambiguity: 2x-scaled pred has ~0 ATE."""
        gt = straight_line_traj(100, 1.0)
        pred = straight_line_traj(100, 2.0)
        assert ate_rmse(gt, pred) == pytest.approx(0.0, abs=1e-9)
        assert ate_rmse(gt, pred, align_scale=False) > 10.0

    def test_known_offset_error(self):
        """Uniform +1m x-noise on half the frames: computable RMSE."""
        gt = straight_line_traj(10, 1.0)
        pred = gt.copy()
        pred[5:, 0, 3] += 1.0
        # After mean-centering, err in x: 5 frames at -0.5, 5 at +0.5
        # (scale fit on z is unaffected by x offsets... approximately).
        val = ate_rmse(gt, pred, align_scale=False)
        assert val == pytest.approx(0.5, rel=1e-6)

    def test_snippet_ate(self):
        gt = straight_line_traj(20, 1.0)
        mean, std = snippet_ate(gt, gt)
        assert mean == pytest.approx(0.0, abs=1e-9)
        pred = straight_line_traj(20, 1.0)
        pred[:, 0, 3] += np.sin(np.arange(20))  # wobble
        mean2, _ = snippet_ate(gt, pred)
        assert mean2 > 0.01


class TestATERef:
    """`compute_ate_ref` pins the SfMLearner-lineage formula exactly:
    first-frame offset alignment, lsq scale, sqrt(SUM err^2)/N."""

    def test_offset_and_scale_invariance(self):
        from davo_tpu.eval.metrics import compute_ate_ref

        gt = straight_line_traj(5, 1.0)
        pred = gt.copy()
        pred[:, :3, 3] = pred[:, :3, 3] * 3.0 + np.array([4.0, -2.0, 7.0])
        assert compute_ate_ref(gt, pred) == pytest.approx(0.0, abs=1e-9)

    def test_formula_hand_computed(self):
        from davo_tpu.eval.metrics import compute_ate_ref

        gt_p = np.array(
            [[0, 0, 0], [0, 0, 1], [0, 0, 2], [0, 0, 3]], float
        )
        pred_p = gt_p.copy()
        pred_p[2, 0] += 0.4  # one 0.4 m x-error
        # Reference formula by hand: offset 0; scale fit on the
        # perturbed trajectory; err = pred*s - gt; sqrt(sum)/4.
        s = float((gt_p * pred_p).sum()) / float((pred_p * pred_p).sum())
        err = pred_p * s - gt_p
        expect = np.sqrt((err**2).sum()) / 4.0
        assert compute_ate_ref(gt_p, pred_p) == pytest.approx(
            expect, rel=1e-12
        )
        # NOT an RMSE: sqrt(sum)/N == rmse/sqrt(N).
        rmse_form = np.sqrt((err**2).sum(-1).mean())
        assert compute_ate_ref(gt_p, pred_p) == pytest.approx(
            rmse_form / np.sqrt(4), rel=1e-12
        )

    def test_snippet_variants_and_short_sequence(self):
        from davo_tpu.eval.metrics import snippet_ate_ref

        gt = straight_line_traj(20, 1.0)
        pred = gt.copy()
        pred[:, 0, 3] += np.sin(np.arange(20))
        m_ref, _ = snippet_ate_ref(gt, pred)
        m_rmse, _ = snippet_ate(gt, pred)
        assert 0 < m_ref < m_rmse  # ~1/sqrt(5) of the RMSE form
        # Degenerate: shorter than a snippet -> explicit NaN, no warning.
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            m, s = snippet_ate(gt[:3], pred[:3])
            m2, s2 = snippet_ate_ref(gt[:3], pred[:3])
        assert np.isnan([m, s, m2, s2]).all()


class TestQuaternionsAndTUM:
    def test_quat_matches_scipy(self, rng):
        import jax.numpy as jnp
        from scipy.spatial.transform import Rotation as R

        from davo_tpu.core import geometry as geo

        rotvecs = rng.normal(size=(32, 3)) * 1.5
        mats = R.from_rotvec(rotvecs).as_matrix()
        ours = np.asarray(geo.mat_to_quat(jnp.asarray(mats, jnp.float32)))
        theirs = R.from_matrix(mats).as_quat()  # [x, y, z, w]
        # Quaternions are sign-ambiguous; align signs before comparing.
        sign = np.sign((ours * theirs).sum(-1, keepdims=True))
        np.testing.assert_allclose(ours * sign, theirs, atol=2e-3)

    def test_quat_roundtrip(self, rng):
        import jax.numpy as jnp

        from davo_tpu.core import geometry as geo

        w = jnp.asarray(rng.normal(size=(16, 3)) * 1.2, jnp.float32)
        rot = geo.so3_exp(w)
        back = geo.quat_to_mat(geo.mat_to_quat(rot))
        np.testing.assert_allclose(
            np.asarray(back), np.asarray(rot), atol=1e-5
        )

    def test_tum_roundtrip(self, rng):
        import jax.numpy as jnp

        from davo_tpu.core import geometry as geo
        from davo_tpu.eval.tum import format_poses_tum, parse_poses_tum

        rel = geo.se3_exp(jnp.asarray(rng.normal(size=(8, 6)) * 0.2, jnp.float32))
        poses = np.asarray(geo.trajectory_from_relatives(rel), np.float64)
        times = np.arange(len(poses)) * 0.1
        text = format_poses_tum(poses, times)
        t2, p2 = parse_poses_tum(text)
        np.testing.assert_allclose(t2, times, atol=1e-6)
        np.testing.assert_allclose(p2, poses, atol=1e-5)


class TestDepthErrors:
    """Eigen-style depth metrics (SURVEY.md R3/R12): exact-GT == 0
    errors / 1.0 accuracies; analytic values for known corruptions."""

    def _gt(self, n=3, h=8, w=10):
        rng = np.random.default_rng(0)
        return rng.uniform(2.0, 50.0, size=(n, h, w))

    def test_exact_is_perfect(self):
        from davo_tpu.eval.depth_metrics import depth_errors

        gt = self._gt()
        r = depth_errors(gt, gt.copy())
        assert r["abs_rel"] == 0.0 and r["rmse"] == 0.0
        assert r["a1"] == 1.0 and r["a3"] == 1.0
        assert r["scale_med"] == pytest.approx(1.0)
        assert r["n_valid"] == gt.size

    def test_median_scaling_removes_global_scale(self):
        from davo_tpu.eval.depth_metrics import depth_errors

        gt = self._gt()
        r = depth_errors(gt, 0.37 * gt)
        assert r["abs_rel"] == pytest.approx(0.0, abs=1e-12)
        assert r["scale_med"] == pytest.approx(1 / 0.37)
        # Without scaling, abs_rel is exactly |1 - 0.37| (pred clipped
        # only outside [min,max], which 0.37*gt stays inside).
        r2 = depth_errors(gt, 0.37 * gt, median_scale=False)
        assert r2["abs_rel"] == pytest.approx(0.63, abs=1e-9)
        assert r2["a1"] == 0.0  # ratio 1/0.37 > 1.25^3 everywhere

    def test_known_multiplicative_error(self):
        from davo_tpu.eval.depth_metrics import depth_errors

        gt = self._gt()
        # Half the pixels at 1.2x, half at 1/1.2 -> median scale 1,
        # abs_rel mixes |0.2| and |1-1/1.2|.
        pred = gt.copy()
        pred[..., ::2] *= 1.2
        pred[..., 1::2] /= 1.2
        r = depth_errors(gt, pred)
        assert r["a1"] == 1.0  # 1.2 < 1.25
        expected = 0.5 * (0.2 + (1 - 1 / 1.2))
        # Median scaling is ~1 but not exact on the mixed-scale pred.
        assert r["abs_rel"] == pytest.approx(expected, rel=5e-2)

    def test_mask_excludes_out_of_range(self):
        from davo_tpu.eval.depth_metrics import depth_errors

        gt = self._gt()
        pred = gt.copy()
        gt[0, 0, 0] = 500.0   # beyond max_depth: masked out
        gt[0, 0, 1] = 1e-6    # below min_depth: masked out
        pred[0, 0, 0] = 1.0   # would be a huge error if counted
        r = depth_errors(gt, pred)
        assert r["abs_rel"] == pytest.approx(0.0, abs=1e-12)
        assert r["n_valid"] == gt.size - 2

    def test_all_masked_is_nan(self):
        from davo_tpu.eval.depth_metrics import depth_errors

        gt = np.full((2, 4, 4), 1000.0)
        r = depth_errors(gt, gt)
        assert np.isnan(r["abs_rel"]) and r["n_valid"] == 0
