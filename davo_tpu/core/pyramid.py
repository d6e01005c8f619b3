"""Image pyramids and bilinear resize.

The multi-scale photometric loss evaluates warps at `num_scales` /2
pyramid levels (reference: multi-scale disparity + per-scale intrinsics,
SURVEY.md R4/R9 [H]). `jax.image.resize` lowers to XLA gather/convs that
fuse well; downsampling by exact /2 uses 2x2 average pooling (cheaper,
alias-free for this use).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def downsample2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 average pool over (B, H, W, C); H, W must be even."""
    out = lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    return out * 0.25


def image_pyramid(x: jnp.ndarray, num_scales: int) -> list[jnp.ndarray]:
    """[full-res, /2, /4, ...] — `num_scales` levels of (B, H, W, C)."""
    levels = [x]
    for _ in range(num_scales - 1):
        levels.append(downsample2(levels[-1]))
    return levels


def resize_bilinear(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear resize (B, H, W, C) -> (B, height, width, C)."""
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, height, width, C), method="bilinear")
