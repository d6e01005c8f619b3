"""Shared building blocks for the model zoo."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def dtype_of(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class ConvBlock(nn.Module):
    """Conv + ReLU in compute dtype (params f32, autocast by linen)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return nn.relu(x)


def upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample of NHWC (cheap, fuses into the next
    conv; avoids transposed-conv checkerboarding and lowers cleanly)."""
    B, H, W, C = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


def resize_nearest(x: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest 2x upsample + crop to an exact (H, W).

    Gather-free (broadcast-reshape + slice; `jax.image.resize` lowers
    to a slow TPU gather). Handles the odd sizes a stride-2 SAME
    encoder produces at 416-wide inputs: every decoder target is
    ceil(2x_source/2), so 2x-then-crop reaches it exactly.
    """
    H, W = x.shape[1], x.shape[2]
    h, w = hw
    assert h <= 2 * H and w <= 2 * W, (x.shape, hw)
    return upsample2(x)[:, :h, :w]
