"""Reprojection residuals and closed-form Jacobians.

Conventions:
* Poses are world->camera transforms T_cw (4, 4): p_c = R p_w + t.
  (The inverse of the cam-to-world trajectory poses; `window.py`
  converts.)
* Landmarks are world points (N, 3).
* Observations are pixel coords (M, N, 2) with mask (M, N).
* Pose updates are LEFT multiplicative: T <- exp(delta_xi) T, so the
  pose Jacobian of a camera point is d p_c / d xi = [I | -hat(p_c)].
"""

from __future__ import annotations

import jax.numpy as jnp

from davo_tpu.core import geometry as geo

_EPS = 1e-9


def project_points(
    poses_cw: jnp.ndarray, points_w: jnp.ndarray, K: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project all landmarks into all keyframes.

    poses_cw: (M, 4, 4); points_w: (N, 3); K: (3, 3).
    Returns (pixels (M, N, 2), cam-z (M, N)).
    """
    R = poses_cw[:, :3, :3]
    t = poses_cw[:, :3, 3]
    p_c = jnp.einsum("mij,nj->mni", R, points_w) + t[:, None, :]
    z = p_c[..., 2]
    z_safe = jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    u = fx * p_c[..., 0] / z_safe + cx
    v = fy * p_c[..., 1] / z_safe + cy
    return jnp.stack([u, v], axis=-1), z


def reprojection_residuals(
    poses_cw: jnp.ndarray,
    points_w: jnp.ndarray,
    K: jnp.ndarray,
    observations: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Masked residuals (M, N, 2): predicted - observed (0 where unseen
    or behind the camera)."""
    pix, z = project_points(poses_cw, points_w, K)
    valid = (mask > 0) & (z > _EPS)
    return jnp.where(valid[..., None], pix - observations, 0.0)


def reprojection_jacobians(
    poses_cw: jnp.ndarray,
    points_w: jnp.ndarray,
    K: jnp.ndarray,
    mask: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form Jacobians of the residual.

    Returns (J_pose (M, N, 2, 6), J_point (M, N, 2, 3)), zeroed where
    masked/behind-camera. With p_c the camera-frame point:

      d r / d p_c = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]]
      d p_c / d xi = [I | -hat(p_c)]   (left-mult twist [v, w])
      d p_c / d p_w = R
    """
    R = poses_cw[:, :3, :3]
    t = poses_cw[:, :3, 3]
    p_c = jnp.einsum("mij,nj->mni", R, points_w) + t[:, None, :]
    x, y, z = p_c[..., 0], p_c[..., 1], p_c[..., 2]
    valid = (mask > 0) & (z > _EPS)
    z_safe = jnp.where(z < _EPS, 1.0, z)
    inv_z = 1.0 / z_safe
    fx, fy = K[0, 0], K[1, 1]

    # d r / d p_c: (M, N, 2, 3)
    zero = jnp.zeros_like(x)
    dr_dpc = jnp.stack(
        [
            jnp.stack([fx * inv_z, zero, -fx * x * inv_z * inv_z], axis=-1),
            jnp.stack([zero, fy * inv_z, -fy * y * inv_z * inv_z], axis=-1),
        ],
        axis=-2,
    )

    # d p_c / d xi = [I | -hat(p_c)]: (M, N, 3, 6)
    eye = jnp.broadcast_to(jnp.eye(3), p_c.shape[:-1] + (3, 3))
    dpc_dxi = jnp.concatenate([eye, -geo.so3_hat(p_c)], axis=-1)

    J_pose = jnp.einsum("mnij,mnjk->mnik", dr_dpc, dpc_dxi)
    J_point = jnp.einsum("mnij,mjk->mnik", dr_dpc, R)  # R broadcast over N

    vmask = valid[..., None, None]
    return jnp.where(vmask, J_pose, 0.0), jnp.where(vmask, J_point, 0.0)


def huber_weights(
    residuals: jnp.ndarray, delta: float, cutoff: float | None = None
) -> jnp.ndarray:
    """IRLS weights: Huber, truncated at `cutoff` px.

    Pure Huber keeps a constant-slope pull from gross outliers; with
    free structure and few pose anchors that pull steadily bends the
    window even as the cost decreases (measured: 20x pose drift at 10%
    corrupted landmarks). The truncation gates them out entirely once
    they exceed `cutoff` — the classic truncated-robust-loss remedy.
    """
    norm = jnp.linalg.norm(residuals, axis=-1)
    w = jnp.where(norm <= delta, 1.0, delta / jnp.maximum(norm, _EPS))
    if cutoff is not None:
        w = jnp.where(norm > cutoff, 0.0, w)
    return w
