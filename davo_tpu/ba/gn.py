"""Damped Gauss-Newton driver for one BA window.

Fixed-iteration loop (XLA-friendly; no data-dependent termination) with
Huber IRLS reweighting each iteration. Poses update left-multiplicatively
(T <- exp(dx) T), landmarks additively.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from davo_tpu.config import BAConfig
from davo_tpu.core import geometry as geo
from davo_tpu.ba import residuals as res
from davo_tpu.ba import schur


class BAProblem(NamedTuple):
    """One fixed-shape BA window.

    poses_cw:     (M, 4, 4) world->camera
    points_w:     (N, 3)
    K:            (3, 3)
    observations: (M, N, 2) pixels
    mask:         (M, N) 1 where observed
    """

    poses_cw: jnp.ndarray
    points_w: jnp.ndarray
    K: jnp.ndarray
    observations: jnp.ndarray
    mask: jnp.ndarray


def ba_cost(problem: BAProblem, delta: float) -> jnp.ndarray:
    """Total Huber cost (for monitoring/tests)."""
    r = res.reprojection_residuals(
        problem.poses_cw, problem.points_w, problem.K,
        problem.observations, problem.mask,
    )
    norm = jnp.linalg.norm(r, axis=-1)
    quad = 0.5 * norm**2
    lin = delta * (norm - 0.5 * delta)
    return jnp.where(norm <= delta, quad, lin).sum()


def ba_iteration(problem: BAProblem, cfg: BAConfig) -> BAProblem:
    """One damped GN step: linearize, Schur-reduce, solve, update."""
    r = res.reprojection_residuals(
        problem.poses_cw, problem.points_w, problem.K,
        problem.observations, problem.mask,
    )
    w = res.huber_weights(r, cfg.huber_delta, cfg.outlier_px) * problem.mask
    J_pose, J_point = res.reprojection_jacobians(
        problem.poses_cw, problem.points_w, problem.K, problem.mask
    )
    B, C, E, rhs_p, rhs_l = schur.gauss_newton_system(J_pose, J_point, r, w)
    S, rhs, C_inv = schur.schur_reduce(B, C, E, rhs_p, rhs_l, cfg.damping)
    dx_pose = schur.solve_window(S, rhs, n_fixed=2)
    dx_point = schur.backsubstitute(C_inv, E, rhs_l, dx_pose)

    new_poses = geo.se3_exp(dx_pose) @ problem.poses_cw
    new_points = problem.points_w + dx_point
    return problem._replace(poses_cw=new_poses, points_w=new_points)


@partial(jax.jit, static_argnames=("cfg",))
def ba_refine(problem: BAProblem, cfg: BAConfig) -> BAProblem:
    """Run cfg.max_iterations damped-GN steps (one compiled program)."""

    def body(_, p):
        return ba_iteration(p, cfg)

    return jax.lax.fori_loop(0, cfg.max_iterations, body, problem)
