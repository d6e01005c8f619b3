"""Block-Jacobi preconditioned conjugate gradient for the reduced
camera system.

The direct LU in `schur.solve_window` is exact and cheap at 6M <= ~100,
but the distributed design point (SURVEY.md P6: many keyframe blocks
across hosts) needs an iterative solver whose per-iteration cost is a
matvec + small collectives. This PCG operates on the (M, M, 6, 6)
block form directly; the preconditioner is the inverse of the 6x6
diagonal blocks. Fixed iteration count (XLA-friendly); `solve_window`
remains the small-window fast path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _block_matvec(S: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(M, M, 6, 6) x (M, 6) -> (M, 6)."""
    return jnp.einsum("mpij,pj->mi", S, x)


@partial(jax.jit, static_argnames=("iterations", "n_fixed"))
def pcg_solve(
    S: jnp.ndarray,
    rhs: jnp.ndarray,
    iterations: int = 32,
    tol: float = 1e-6,
    n_fixed: int = 2,
) -> jnp.ndarray:
    """Solve S x = rhs for pose updates with gauge clamping.

    S: (M, M, 6, 6); rhs: (M, 6). The first `n_fixed` poses are
    clamped to zero update (rows/cols projected out), mirroring
    `schur.solve_window`.
    """
    M = S.shape[0]
    mask = jnp.concatenate(
        [jnp.zeros((n_fixed, 6)), jnp.ones((M - n_fixed, 6))], axis=0
    )

    def A(x):
        return _block_matvec(S, x * mask) * mask

    # Block-Jacobi preconditioner from the diagonal 6x6 blocks.
    diag = S[jnp.arange(M), jnp.arange(M)]  # (M, 6, 6)
    diag_inv = jnp.linalg.inv(diag + 1e-8 * jnp.eye(6))

    def Minv(r):
        return jnp.einsum("mij,mj->mi", diag_inv, r) * mask

    b = rhs * mask
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = Minv(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def body(_, carry):
        x, r, p, rz = carry
        Ap = A(p)
        denom = jnp.sum(p * Ap)
        alpha = jnp.where(jnp.abs(denom) > 1e-20, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = Minv(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(jnp.abs(rz) > 1e-20, rz_new / rz, 0.0)
        p = z + beta * p
        return x, r, p, rz_new

    x, r, _, _ = jax.lax.fori_loop(0, iterations, body, (x0, r0, p0, rz0))
    del tol  # fixed-iteration variant; tol retained for API parity
    return x
