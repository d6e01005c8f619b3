"""Pose-graph optimization (odometry smoothing).

Minimizes sum_e w_e ||log( Z_e^-1 · C_i^-1 C_j )||^2 over absolute
poses C (cam-to-world), given relative measurements Z_e ~ C_i^-1 C_j
(odometry increments and any extra constraints, e.g. keyframe BA
results or loop closures). Gauss-Newton on the manifold: poses are
perturbed C_i <- C_i exp(x_i), Jacobians by forward-mode autodiff of
the full residual vector (windows are small; the autodiff J is exact
and XLA-fused).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from davo_tpu.core import geometry as geo


def _edge_residuals(x, poses, idx_i, idx_j, Z_inv, weights):
    """x: (P, 6) perturbations; returns (E, 6) weighted residuals."""
    C = poses @ geo.se3_exp(x)
    Ci = C[idx_i]
    Cj = C[idx_j]
    rel = geo.se3_inverse(Ci) @ Cj
    r = geo.se3_log(Z_inv @ rel)
    return r * jnp.sqrt(weights)[:, None]


@partial(jax.jit, static_argnames=("iterations", "fix_first"))
def pose_graph_optimize(
    poses: jnp.ndarray,
    idx_i: jnp.ndarray,
    idx_j: jnp.ndarray,
    Z: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    iterations: int = 10,
    damping: float = 1e-6,
    fix_first: bool = True,
) -> jnp.ndarray:
    """Optimize (P, 4, 4) poses given (E,) edges with (E, 4, 4) relative
    measurements Z. Returns refined poses."""
    P = poses.shape[0]
    if weights is None:
        weights = jnp.ones(idx_i.shape[0])
    Z_inv = geo.se3_inverse(Z)

    def gn_step(_, C):
        def res_flat(x_flat):
            x = x_flat.reshape(P, 6)
            return _edge_residuals(
                x, C, idx_i, idx_j, Z_inv, weights
            ).reshape(-1)

        x0 = jnp.zeros(P * 6)
        r = res_flat(x0)
        J = jax.jacfwd(res_flat)(x0)  # (6E, 6P)
        H = J.T @ J + damping * jnp.eye(P * 6)
        g = J.T @ r
        if fix_first:
            mask = jnp.concatenate([jnp.zeros(6), jnp.ones(6 * (P - 1))])
            H = H * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
            g = g * mask
        dx = -jnp.linalg.solve(H, g).reshape(P, 6)
        return C @ geo.se3_exp(dx)

    return jax.lax.fori_loop(0, iterations, gn_step, poses)
