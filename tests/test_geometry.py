"""Golden unit tests for davo_tpu.core.geometry (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from davo_tpu.core import geometry as geo


def random_rotvecs(rng, n, scale=1.0):
    return rng.normal(size=(n, 3)) * scale


class TestEuler:
    def test_euler_matches_scipy(self, rng):
        angles = rng.uniform(-1.2, 1.2, size=(32, 3))
        ours = np.asarray(geo.euler_to_mat(jnp.asarray(angles)))
        # R = Rz @ Ry @ Rx == scipy extrinsic 'xyz' == intrinsic 'ZYX'
        theirs = R.from_euler("xyz", angles).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_euler_roundtrip(self, rng):
        angles = rng.uniform(-1.2, 1.2, size=(64, 3))
        mats = geo.euler_to_mat(jnp.asarray(angles))
        back = np.asarray(geo.mat_to_euler(mats))
        np.testing.assert_allclose(back, angles, atol=1e-5)

    def test_identity(self):
        m = geo.euler_to_mat(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(m), np.eye(3), atol=1e-7)


class TestSO3:
    def test_exp_matches_scipy(self, rng):
        w = random_rotvecs(rng, 64, 2.0)
        ours = np.asarray(geo.so3_exp(jnp.asarray(w)))
        theirs = R.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_exp_small_angle(self, rng):
        w = random_rotvecs(rng, 16, 1e-6)
        ours = np.asarray(geo.so3_exp(jnp.asarray(w)))
        theirs = R.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-7)

    def test_log_roundtrip(self, rng):
        # Keep |w| < pi: log returns the principal branch.
        w = random_rotvecs(rng, 64, 1.0)
        norms = np.linalg.norm(w, axis=-1, keepdims=True)
        w = w / norms * (norms % (np.pi - 0.15))
        back = np.asarray(geo.so3_log(geo.so3_exp(jnp.asarray(w))))
        np.testing.assert_allclose(back, w, atol=1e-4)

    def test_log_near_pi(self, rng):
        axes = rng.normal(size=(16, 3))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        w = axes * (np.pi - 1e-5)
        rot = R.from_rotvec(w).as_matrix()
        back = np.asarray(geo.so3_log(jnp.asarray(rot)))
        # log is defined up to sign at exactly pi; compare rotations.
        np.testing.assert_allclose(
            R.from_rotvec(back).as_matrix(), rot, atol=1e-3
        )

    def test_log_near_pi_degenerate_axes(self):
        """Axes with a ~zero x component: the sign-recovery branch must
        not anchor on axis_x (regression: pi about [0,1,-1]/sqrt(2)
        round-tripped to a wholly wrong rotation)."""
        axes = np.array(
            [
                [0.0, 1.0, -1.0],
                [0.0, 1.0, 1.0],
                [0.0, 0.0, 1.0],
                [0.0, 1.0, 0.0],
                [1e-3, 0.7, -0.7],
                [-1e-3, -0.6, 0.8],
            ]
        )
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        w = axes * (np.pi - 1e-5)
        rot = R.from_rotvec(w).as_matrix()
        back = np.asarray(geo.so3_log(jnp.asarray(rot)))
        np.testing.assert_allclose(
            R.from_rotvec(back).as_matrix(), rot, atol=1e-3
        )

    def test_hat_vee(self, rng):
        w = rng.normal(size=(8, 3))
        np.testing.assert_allclose(
            np.asarray(geo.so3_vee(geo.so3_hat(jnp.asarray(w)))), w, atol=1e-7
        )


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(64, 6))
        xi[:, 3:] *= 0.8
        back = np.asarray(geo.se3_log(geo.se3_exp(jnp.asarray(xi))))
        np.testing.assert_allclose(back, xi, atol=1e-4)

    def test_exp_zero(self):
        m = geo.se3_exp(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(m), np.eye(4), atol=1e-7)

    def test_pure_translation(self):
        xi = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
        m = np.asarray(geo.se3_exp(xi))
        np.testing.assert_allclose(m[:3, 3], [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(m[:3, :3], np.eye(3), atol=1e-6)

    def test_inverse(self, rng):
        xi = rng.normal(size=(16, 6))
        T = geo.se3_exp(jnp.asarray(xi))
        eye = np.asarray(T @ geo.se3_inverse(T))
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-5)

    def test_adjoint_identity(self, rng):
        # Ad_T xi == log(T exp(xi) T^-1) for small xi
        T = geo.se3_exp(jnp.asarray(rng.normal(size=6) * 0.5))
        xi = jnp.asarray(rng.normal(size=6) * 1e-3)
        lhs = geo.se3_adjoint(T) @ xi
        rhs = geo.se3_log(T @ geo.se3_exp(xi) @ geo.se3_inverse(T))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


class TestPoseVec:
    def test_roundtrip_euler(self, rng):
        vec = rng.uniform(-0.5, 0.5, size=(32, 6))
        back = np.asarray(
            geo.mat_to_pose_vec(geo.pose_vec_to_mat(jnp.asarray(vec)))
        )
        np.testing.assert_allclose(back, vec, atol=1e-5)

    def test_roundtrip_axis_angle(self, rng):
        vec = rng.uniform(-0.5, 0.5, size=(32, 6))
        m = geo.pose_vec_to_mat(jnp.asarray(vec), rotation="axis_angle")
        back = np.asarray(geo.mat_to_pose_vec(m, rotation="axis_angle"))
        np.testing.assert_allclose(back, vec, atol=1e-5)


class TestCamera:
    def test_pixel_cam_roundtrip(self, rng):
        H, W = 16, 24
        K = geo.make_intrinsics(20.0, 22.0, W / 2, H / 2)[None]
        depth = jnp.asarray(rng.uniform(1.0, 10.0, size=(1, H, W)), jnp.float32)
        pts = geo.pixel_to_cam(depth, K)
        uv, z = geo.cam_to_pixel(pts, K, jnp.eye(4)[None])
        grid = np.asarray(geo.pixel_grid(H, W))[:2]
        np.testing.assert_allclose(np.asarray(uv[0]), grid, atol=1e-4)
        np.testing.assert_allclose(np.asarray(z[0]), np.asarray(depth[0]), atol=1e-4)

    def test_known_translation_shift(self):
        # Camera translating +x by d with depth z shifts pixels by -fx*d/z.
        H, W, fx, d, z0 = 8, 8, 10.0, 0.5, 5.0
        K = geo.make_intrinsics(fx, fx, W / 2, H / 2)[None]
        depth = jnp.full((1, H, W), z0)
        pts = geo.pixel_to_cam(depth, K)
        T = geo.pose_vec_to_mat(jnp.array([[-d, 0, 0, 0, 0, 0]]))
        uv, _ = geo.cam_to_pixel(pts, K, T)
        grid = np.asarray(geo.pixel_grid(H, W))[:2]
        np.testing.assert_allclose(
            np.asarray(uv[0, 0]), grid[0] - fx * d / z0, atol=1e-4
        )

    def test_intrinsics_pyramid(self):
        K = geo.make_intrinsics(100.0, 100.0, 208.0, 64.0)
        pyr = geo.intrinsics_pyramid(K, 3)
        assert float(pyr[2][0, 0]) == pytest.approx(25.0)
        assert float(pyr[1][0, 2]) == pytest.approx(104.0)


class TestTrajectory:
    def test_chain_matches_loop(self, rng):
        rel = geo.se3_exp(jnp.asarray(rng.normal(size=(20, 6)) * 0.1))
        poses = np.asarray(geo.trajectory_from_relatives(rel))
        acc = np.eye(4)
        np.testing.assert_allclose(poses[0], acc, atol=1e-6)
        for i in range(20):
            acc = acc @ np.asarray(rel[i])
            np.testing.assert_allclose(poses[i + 1], acc, atol=1e-4)

    def test_relative_roundtrip(self, rng):
        rel = geo.se3_exp(jnp.asarray(rng.normal(size=(12, 6)) * 0.1))
        poses = geo.trajectory_from_relatives(rel)
        back = np.asarray(geo.relative_from_trajectory(poses))
        np.testing.assert_allclose(back, np.asarray(rel), atol=1e-5)
