"""BA backend tests (SURVEY.md §4.1): Schur vs dense solve on random
well-conditioned problems; GN convergence on noise-injected synthetic
windows; pose-graph smoothing; sharded == single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.ba.gn import BAProblem, ba_cost, ba_refine
from davo_tpu.ba.posegraph import pose_graph_optimize
from davo_tpu.ba import residuals as res
from davo_tpu.ba import schur
from davo_tpu.ba.sharded import make_sharded_ba_refine, shard_problem
from davo_tpu.ba.window import SlidingWindowBA, build_window_problem
from davo_tpu.config import BAConfig
from davo_tpu.core import geometry as geo


def make_problem(rng, M=4, N=60, noise=0.0, pose_noise=0.0, point_noise=0.0):
    """Synthetic BA problem with known GT: cameras in a rough arc
    looking at a landmark cloud around the origin at z ~ 8."""
    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    pts = rng.uniform([-4, -3, 6], [4, 3, 10], size=(N, 3))
    poses_wc = []
    for i in range(M):
        xi = np.concatenate(
            [[i * 0.5 - M * 0.25, 0, 0], rng.normal(0, 0.02, 3)]
        )
        poses_wc.append(np.asarray(geo.se3_exp(jnp.asarray(xi))))
    poses_wc = np.stack(poses_wc)
    poses_cw = np.linalg.inv(poses_wc)

    pix, z = res.project_points(
        jnp.asarray(poses_cw, jnp.float32),
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(K, jnp.float32),
    )
    pix = np.asarray(pix)
    mask = (
        (np.asarray(z) > 0.1)
        & (pix[..., 0] >= 0) & (pix[..., 0] <= 127)
        & (pix[..., 1] >= 0) & (pix[..., 1] <= 95)
    ).astype(np.float32)
    obs = pix + rng.normal(0, noise, pix.shape)

    # Perturb initial estimates away from GT.
    poses_cw_init = poses_cw.copy()
    for i in range(2, M):  # first two poses are gauge anchors
        xi = rng.normal(0, pose_noise, 6)
        poses_cw_init[i] = (
            np.asarray(geo.se3_exp(jnp.asarray(xi))) @ poses_cw_init[i]
        )
    pts_init = pts + rng.normal(0, point_noise, pts.shape)

    problem = BAProblem(
        poses_cw=jnp.asarray(poses_cw_init, jnp.float32),
        points_w=jnp.asarray(pts_init, jnp.float32),
        K=jnp.asarray(K, jnp.float32),
        observations=jnp.asarray(obs, jnp.float32),
        mask=jnp.asarray(mask, jnp.float32),
    )
    return problem, poses_cw, pts


class TestJacobians:
    def test_matches_autodiff(self, rng):
        """Closed-form Jacobians == jax.jacfwd of the residuals."""
        problem, *_ = make_problem(rng, M=3, N=8)

        def r_of_pose(xi):
            poses = geo.se3_exp(xi) @ problem.poses_cw
            return res.reprojection_residuals(
                poses, problem.points_w, problem.K,
                problem.observations, problem.mask,
            )

        def r_of_points(pts):
            return res.reprojection_residuals(
                problem.poses_cw, pts, problem.K,
                problem.observations, problem.mask,
            )

        J_pose, J_point = res.reprojection_jacobians(
            problem.poses_cw, problem.points_w, problem.K, problem.mask
        )
        # autodiff wrt per-pose twist: (M, N, 2, M, 6) — diag over M.
        Ja = jax.jacfwd(r_of_pose)(jnp.zeros((3, 6)))
        for m in range(3):
            np.testing.assert_allclose(
                np.asarray(Ja[m, :, :, m]), np.asarray(J_pose[m]),
                atol=1e-2, rtol=1e-3,
            )
        Jp = jax.jacfwd(r_of_points)(problem.points_w)
        for m in range(3):
            for n in range(8):
                np.testing.assert_allclose(
                    np.asarray(Jp[m, n, :, n]), np.asarray(J_point[m, n]),
                    atol=1e-2, rtol=1e-3,
                )


class TestSchur:
    def test_matches_dense_solve(self, rng):
        """Schur-reduced solution == dense H solve of the full system."""
        problem, *_ = make_problem(rng, M=4, N=20, noise=0.5)
        r = res.reprojection_residuals(
            problem.poses_cw, problem.points_w, problem.K,
            problem.observations, problem.mask,
        )
        w = problem.mask
        J_pose, J_point = res.reprojection_jacobians(
            problem.poses_cw, problem.points_w, problem.K, problem.mask
        )
        B, C, E, rhs_p, rhs_l = schur.gauss_newton_system(J_pose, J_point, r, w)
        damping = 1e-3
        S, rhs, C_inv = schur.schur_reduce(B, C, E, rhs_p, rhs_l, damping)
        dx_pose = schur.solve_window(S, rhs, n_fixed=0)
        dx_point = schur.backsubstitute(C_inv, E, rhs_l, dx_pose)

        # Dense reference in float64 numpy.
        M, N = 4, 20
        Bn = np.zeros((6 * M, 6 * M))
        for m in range(M):
            Bn[6 * m : 6 * m + 6, 6 * m : 6 * m + 6] = np.asarray(B[m])
        Cn = np.zeros((3 * N, 3 * N))
        for n in range(N):
            Cn[3 * n : 3 * n + 3, 3 * n : 3 * n + 3] = np.asarray(C[n])
        En = np.zeros((6 * M, 3 * N))
        for m in range(M):
            for n in range(N):
                En[6 * m : 6 * m + 6, 3 * n : 3 * n + 3] = np.asarray(E[m, n])
        H = np.block([[Bn, En], [En.T, Cn]]) + damping * np.eye(6 * M + 3 * N)
        g = np.concatenate([np.asarray(rhs_p).ravel(), np.asarray(rhs_l).ravel()])

        # 1. Reduction algebra: S == B+damping - E C^-1 E^T (dense f64).
        Cd = Cn + damping * np.eye(3 * N)
        S_ref = (
            Bn + damping * np.eye(6 * M)
            - En @ np.linalg.solve(Cd, En.T)
        )
        S_dense = np.asarray(
            jnp.transpose(S, (0, 2, 1, 3)).reshape(6 * M, 6 * M)
        )
        np.testing.assert_allclose(
            S_dense, S_ref, rtol=1e-4, atol=1e-2 * np.abs(S_ref).max()
        )

        # 2. Solution quality: relative normal-equation residual is at
        # the f32 level (the dense H here is ill-conditioned, so direct
        # f32-vs-f64 elementwise comparison of dx is not meaningful).
        dx_full = np.concatenate(
            [np.asarray(dx_pose).ravel(), np.asarray(dx_point).ravel()]
        )
        rel_res = np.linalg.norm(H @ dx_full - g) / np.linalg.norm(g)
        assert rel_res < 1e-3, rel_res


class TestGaussNewton:
    def test_converges_from_perturbation(self, rng):
        """Noise-injected poses+points -> GN recovers GT (SURVEY §4.3)."""
        problem, gt_poses_cw, gt_pts = make_problem(
            rng, M=5, N=80, noise=0.0, pose_noise=0.03, point_noise=0.05
        )
        cfg = BAConfig(max_iterations=15, damping=1e-4, huber_delta=5.0)
        c0 = float(ba_cost(problem, 5.0))
        refined = ba_refine(problem, cfg)
        c1 = float(ba_cost(refined, 5.0))
        assert c1 < c0 * 1e-3, (c0, c1)
        # Pose error vs GT (first pose anchored at GT by construction).
        err = np.asarray(refined.poses_cw) @ np.linalg.inv(gt_poses_cw)
        t_err = np.linalg.norm(err[:, :3, 3], axis=-1)
        assert t_err.max() < 5e-3

    def test_robust_to_outliers(self, rng):
        problem, gt_poses_cw, _ = make_problem(
            rng, M=4, N=60, noise=0.2, pose_noise=0.02
        )
        # Corrupt 10% of observations massively.
        obs = np.array(problem.observations)  # writable copy
        idx = rng.choice(60, 6, replace=False)
        # Inconsistent per-frame corruption (a consistent shift would
        # just be a displaced-but-valid landmark, not an outlier).
        obs[:, idx] += rng.normal(0, 40.0, obs[:, idx].shape)
        problem = problem._replace(observations=jnp.asarray(obs))
        cfg = BAConfig(
            max_iterations=15, damping=1e-3, huber_delta=1.0, outlier_px=16.0
        )
        refined = ba_refine(problem, cfg)
        err = np.asarray(refined.poses_cw) @ np.linalg.inv(gt_poses_cw)
        t_err = np.linalg.norm(err[:, :3, 3], axis=-1)
        # Must land at the clean-data ML level (~0.05 for this noise /
        # geometry), i.e. the truncated loss fully gates the outliers.
        assert t_err.max() < 0.1


class TestPoseGraph:
    def test_smooths_noisy_chain(self, rng):
        """Odometry chain + noisy duplicate constraints -> closer to GT."""
        P = 12
        gt_rel = np.asarray(
            geo.se3_exp(jnp.asarray(rng.normal(0, 0.1, (P - 1, 6))))
        )
        gt = np.asarray(
            geo.trajectory_from_relatives(jnp.asarray(gt_rel, jnp.float32))
        )
        # Noisy odometry + noisy skip-2 constraints (redundancy to average).
        noisy_rel = np.asarray(
            geo.se3_exp(jnp.asarray(rng.normal(0, 0.02, (P - 1, 6)), jnp.float32))
        ) @ gt_rel
        init = np.asarray(
            geo.trajectory_from_relatives(jnp.asarray(noisy_rel, jnp.float32))
        )
        idx_i = list(range(P - 1))
        idx_j = list(range(1, P))
        Z = list(noisy_rel)
        for i in range(P - 2):
            Zij = np.linalg.inv(gt[i]) @ gt[i + 2]
            noise = np.asarray(
                geo.se3_exp(jnp.asarray(rng.normal(0, 0.005, 6), jnp.float32))
            )
            idx_i.append(i)
            idx_j.append(i + 2)
            Z.append(noise @ Zij)
        refined = np.asarray(
            pose_graph_optimize(
                jnp.asarray(init, jnp.float32),
                jnp.asarray(idx_i), jnp.asarray(idx_j),
                jnp.asarray(np.stack(Z), jnp.float32),
                iterations=8,
            )
        )
        err_before = np.linalg.norm(init[:, :3, 3] - gt[:, :3, 3], axis=-1).mean()
        err_after = np.linalg.norm(refined[:, :3, 3] - gt[:, :3, 3], axis=-1).mean()
        assert err_after < err_before * 0.8


class TestSlidingWindow:
    def test_window_starts_cover_tail(self):
        from davo_tpu.ba.window import window_starts

        # Regression: len=10, M=5, stride=2 stopped at start=4 (frame 9
        # never refined); a clamped final window must cover the end.
        assert window_starts(10, 5, 2) == [0, 2, 4, 5]
        assert window_starts(10, 5, 5) == [0, 5]
        assert window_starts(11, 5, 2) == [0, 2, 4, 6]
        assert window_starts(4, 6, 3) == [0]
        for n in range(3, 30):
            for m in (4, 5, 6):
                starts = window_starts(n, m, max(m // 2, 1))
                assert min(starts) == 0
                assert max(starts) + m >= n

    def test_refines_perturbed_trajectory(self, rng):
        """Windows over a synthetic sequence: BA pulls noisy poses back."""
        from davo_tpu.data.synthetic import SyntheticSequence

        # Close scene (plane at 15m): depth/baseline conditioning strong
        # enough for a 6-frame window to be well-posed in f32.
        seq = SyntheticSequence(
            n_frames=10, height=48, width=64, seed=2,
            plane_z=15.0, forward_speed=1.0,
        )
        gt_wc = seq.poses.copy()
        depths = np.stack([seq.depth(i) for i in range(10)])
        noisy = gt_wc.copy()
        # Anchors (first two window poses) stay at GT — matching how
        # sliding windows chain onto the already-refined past.
        for i in range(2, 10):
            xi = rng.normal(0, 0.01, 6)
            noisy[i] = noisy[i] @ np.asarray(geo.se3_exp(jnp.asarray(xi)))
        # Observations from GT geometry (projections of GT landmarks
        # via GT depth); noise only in the pose initialization.
        cfg = BAConfig(window_size=6, max_iterations=8, damping=1e-4, huber_delta=3.0)
        swba = SlidingWindowBA(cfg)

        # Build observations from GT poses, then refine noisy ones:
        # emulate by constructing problems with GT-projected obs.
        prob = build_window_problem(gt_wc[:6], depths[:6], seq.K, step=8)
        prob = prob._replace(
            poses_cw=jnp.asarray(np.linalg.inv(noisy[:6]), jnp.float32)
        )
        refined = ba_refine(prob, cfg)
        ref_wc = np.linalg.inv(np.asarray(refined.poses_cw))
        err_before = np.linalg.norm(
            noisy[:6, :3, 3] - gt_wc[:6, :3, 3], axis=-1
        ).mean()
        err_after = np.linalg.norm(
            ref_wc[:, :3, 3] - gt_wc[:6, :3, 3], axis=-1
        ).mean()
        assert err_after < err_before * 0.2
        assert swba is not None


class TestShardedBA:
    @pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
    def test_matches_single_device(self, rng):
        from davo_tpu.dist.mesh import make_mesh

        problem, *_ = make_problem(
            rng, M=4, N=64, noise=0.3, pose_noise=0.02, point_noise=0.05
        )
        cfg = BAConfig(max_iterations=5, damping=1e-3, huber_delta=3.0)
        want = ba_refine(problem, cfg)

        mesh = make_mesh(data=1, model=1, window=8)
        sharded = shard_problem(problem, mesh)
        refine = make_sharded_ba_refine(cfg, mesh)
        got = refine(sharded)
        np.testing.assert_allclose(
            np.asarray(got.poses_cw), np.asarray(want.poses_cw),
            atol=1e-4,
        )
        N = problem.points_w.shape[0]
        np.testing.assert_allclose(
            np.asarray(got.points_w)[:N], np.asarray(want.points_w),
            atol=5e-3,  # f32 iteration ordering divergence over 5 GN steps
        )


class TestBatchedWindows:
    def test_vmap_matches_sequential(self):
        """solve_windows_batched == the per-window pipeline, window by
        window (the K axis is embarrassingly parallel)."""
        rng = np.random.default_rng(3)
        K, M, N = 3, 6, 64
        Jp = jnp.asarray(rng.normal(size=(K, M, N, 2, 6)), jnp.float32)
        Jl = jnp.asarray(rng.normal(size=(K, M, N, 2, 3)), jnp.float32)
        r = jnp.asarray(rng.normal(size=(K, M, N, 2)), jnp.float32)
        w = jnp.asarray(rng.uniform(0.1, 1.0, (K, M, N)), jnp.float32)

        dxp_b, dxl_b = jax.jit(schur.solve_windows_batched)(Jp, Jl, r, w)
        for k in range(K):
            B, C, E, rp, rl = schur.gauss_newton_system(
                Jp[k], Jl[k], r[k], w[k]
            )
            S, rhs, C_inv = schur.schur_reduce(B, C, E, rp, rl, 1e-4)
            dxp = schur.solve_window(S, rhs)
            dxl = schur.backsubstitute(C_inv, E, rl, dxp)
            np.testing.assert_allclose(dxp_b[k], dxp, atol=2e-4)
            np.testing.assert_allclose(dxl_b[k], dxl, atol=2e-4)
