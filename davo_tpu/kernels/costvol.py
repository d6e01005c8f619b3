"""Fused correlation cost volume (Pallas TPU).

out[b, h, w, k] = mean_c f1[b, h, w, c] * f2[b, h+dy_k, w+dx_k, c]

One grid step per batch element: f1 and the padded f2 live in VMEM;
the (2d+1)^2 shifted multiply-reduces run back-to-back on the VPU with
zero HBM round-trips (the XLA lowering writes every shifted product to
HBM — measured 100x off roofline, see kernels/__init__). The kernel
emits (K, H, W) per element (contiguous minor-dim tiles); the wrapper
transposes to the (B, H, W, K) layout the flow estimator consumes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # Interpret mode lets the same kernels run (slowly) on CPU for tests.
    return jax.default_backend() != "tpu"


def _costvol_kernel(f1_ref, f2p_ref, out_ref, *, search: int, height: int, width: int):
    d = 2 * search + 1
    f1 = f1_ref[0].astype(jnp.float32)  # (H, W, C)
    inv_c = 1.0 / f1.shape[-1]
    for k in range(d * d):
        dy, dx = divmod(k, d)
        win = f2p_ref[0, dy : dy + height, dx : dx + width, :].astype(
            jnp.float32
        )
        out_ref[0, k] = jnp.sum(f1 * win, axis=-1) * inv_c


@partial(jax.jit, static_argnames=("search",))
def cost_volume_pallas(
    f1: jnp.ndarray, f2: jnp.ndarray, search: int
) -> jnp.ndarray:
    """(B, H, W, C) x2 -> (B, H, W, (2*search+1)^2), float32."""
    B, H, W, C = f1.shape
    d = 2 * search + 1
    f2p = jnp.pad(
        f2, ((0, 0), (search, search), (search, search), (0, 0))
    )
    out = pl.pallas_call(
        partial(_costvol_kernel, search=search, height=H, width=W),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, H + 2 * search, W + 2 * search, C),
                lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, d * d, H, W), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, d * d, H, W), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * d * d * H * W * C,
            bytes_accessed=4 * B * H * W * (2 * C + d * d),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(f1, f2p)
    return jnp.transpose(out, (0, 2, 3, 1))


def _costvol_rows_kernel(
    f1_ref, f2_ref, out_ref, scratch, *, height: int, width: int, search: int
):
    """All (2s+1)^2 correlation slices in ONE kernel, 2-D rows layout.

    Activations stay (P, C) matrices (P = H*W row-major); the (dy, dx)
    shifted view of f2 is the CONTIGUOUS row slice starting at
    dy*W + dx of a zero-padded scratch, column wrap masked via iota —
    no reshape, no transpose, no matmul inside the kernel, so it
    side-steps both the Mosaic matmul-layout bug (kernels/conv_stack.py
    STATUS) and the (B, K, H, W)->NHWC transpose that made
    `cost_volume_pallas` lose in context (config.py use_pallas note).
    Out-of-frame f2 contributes 0, matching the XLA slice loop.
    """
    P = height * width
    pad = search * width + search
    C = f1_ref.shape[2]
    f1 = f1_ref[0].astype(jnp.float32)  # (P, C)
    scratch[0:pad, :] = jnp.zeros((pad, C), jnp.float32)
    scratch[pad : pad + P, :] = f2_ref[0].astype(jnp.float32)
    scratch[pad + P : 2 * pad + P, :] = jnp.zeros((pad, C), jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) % width
    cols = []
    for dy in range(-search, search + 1):
        for dx in range(-search, search + 1):
            off = pad + dy * width + dx
            tap = scratch[off : off + P, :]
            corr = jnp.sum(f1 * tap, axis=1, keepdims=True) / C
            valid = jnp.logical_and(col >= -dx, col < width - dx)
            cols.append(jnp.where(valid, corr, 0.0))
    out_ref[0] = jnp.concatenate(cols, axis=1).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("search",))
def cost_volume_pallas_rows(
    f1: jnp.ndarray, f2: jnp.ndarray, search: int
) -> jnp.ndarray:
    """(B, H, W, C) x2 -> (B, H, W, (2*search+1)^2), float32.

    Rows-layout single-kernel cost volume (see `_costvol_rows_kernel`).
    The NHWC<->rows reshapes live OUTSIDE the kernel where XLA fuses
    them. Select with `ModelConfig.costvol_impl = "pallas_rows"`.
    """
    B, H, W, C = f1.shape
    P, D = H * W, (2 * search + 1) ** 2
    pad = search * W + search
    out = pl.pallas_call(
        partial(_costvol_rows_kernel, height=H, width=W, search=search),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, P, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, P, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, P, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, P, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P + 2 * pad, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * P * C,
            bytes_accessed=4 * B * P * (2 * C + D),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(f1.reshape(B, P, C), f2.reshape(B, P, C))
    return out.reshape(B, H, W, D)


def cost_volume_xla(f1: jnp.ndarray, f2: jnp.ndarray, search: int) -> jnp.ndarray:
    """Reference XLA lowering (shifted dynamic slices)."""
    B, H, W, C = f1.shape
    f2p = jnp.pad(f2, ((0, 0), (search, search), (search, search), (0, 0)))
    slices = []
    for dy in range(2 * search + 1):
        for dx in range(2 * search + 1):
            shifted = jax.lax.dynamic_slice(f2p, (0, dy, dx, 0), (B, H, W, C))
            slices.append(jnp.mean(f1 * shifted, axis=-1))
    return jnp.stack(slices, axis=-1)


def cost_volume_auto(f1: jnp.ndarray, f2: jnp.ndarray, search: int) -> jnp.ndarray:
    """Pallas on TPU, XLA elsewhere (tests run on CPU)."""
    if jax.default_backend() == "tpu":
        return cost_volume_pallas(f1, f2, search)
    return cost_volume_xla(f1, f2, search)
