"""Fused multi-layer conv stack (Pallas TPU): a whole conv chain in one
kernel.

Per-kernel launch overhead on this stack is ~70 us (measured,
kernels/__init__), so small-conv chains spend most of their time
launching. This kernel runs an entire stack — every conv layer, bias,
ReLU — inside one pallas_call: activations never leave VMEM between
layers. Each conv is unrolled into its k*k taps; each tap is a
(pixels, Cin) x (Cin, Cout) MXU matmul.

Mosaic layout constraints, found empirically (tests/test_kernels.py and
the TPU bisects logged in r1 history): a matmul operand whose layout
descends from value-level `pad` or split-reshape frequently fails to
lower ("Bad lhs type"). The reliable recipe is to LAUNDER such values
through a VMEM scratch ref — store, then re-read — before slicing taps:
ref reads always carry a clean layout. Every padded activation and
every parity plane here goes through a scratch ref for that reason.

Stride-2 layers use the parity-plane decomposition (planes[p][q] =
x[:, p::2, q::2]) so taps are stride-1 shifts of planes; requires even
H/W at stride-2 layers — fuse the prefix of a net while that holds and
fall back to XLA for the tail (`fusable_prefix`).

STATUS (r1): single-layer kernels compile and run on hardware; the
multi-layer chain still trips a Mosaic-internal "Bad lhs type" on the
second layer's dots on this libtpu (bisect scripts in r1 history:
single layer + pad-launder + bias + relu OK; any second conv layer in
the same kernel fails, with or without value pads). Semantics are
fully validated in interpret mode (tests/test_kernels.py); hardware
enablement is tracked for r2 (candidate: transposed (C, pixels)
operand layout).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def same_pads(in_size: int, k: int, stride: int) -> tuple[int, int, int]:
    """XLA SAME padding: (out, pad_low, pad_high)."""
    out = -(-in_size // stride)
    total = max((out - 1) * stride + k - in_size, 0)
    return out, total // 2, total - total // 2


def _layer_geometry(H, W, k, stride):
    """Static geometry for one layer: output dims + padded-scratch dims.

    The padded buffer holds x with SAME padding applied plus slack so
    every tap slice stays in range; for stride 2 it is also even-sized
    so the parity split is exact.
    """
    out_h, pad_h, ph_h = same_pads(H, k, stride)
    out_w, pad_w, ph_w = same_pads(W, k, stride)
    if stride == 1:
        Hp = H + pad_h + max(ph_h, k - 1 - pad_h)
        Wp = W + pad_w + max(ph_w, k - 1 - pad_w)
    else:
        # Plane tap (a + out_h) needs Hp/2 >= (k-1)//2 + out_h.
        Hp = max(H + pad_h + ph_h, 2 * ((k - 1) // 2 + out_h))
        Wp = max(W + pad_w + ph_w, 2 * ((k - 1) // 2 + out_w))
        Hp += Hp % 2
        Wp += Wp % 2
    return out_h, out_w, pad_h, pad_w, Hp, Wp


def _conv_layer(
    src_ref, w, b, stride, relu, pad_ref, plane_refs, geom, compute_dtype
):
    """One conv layer: read src_ref, return the output value."""
    N, H, W, Cin = src_ref.shape
    k = w.shape[0]
    Cout = w.shape[3]
    out_h, out_w, pad_h, pad_w, Hp, Wp = geom

    x = src_ref[...].astype(compute_dtype)
    # Launder the padded activation through VMEM (see module docstring).
    pad_ref[...] = jnp.pad(
        x, ((0, 0), (pad_h, Hp - H - pad_h), (pad_w, Wp - W - pad_w), (0, 0))
    )

    acc = jnp.zeros((N * out_h * out_w, Cout), jnp.float32)
    if stride == 1:
        for dy in range(k):
            for dx in range(k):
                tap = pad_ref[0:N, dy : dy + out_h, dx : dx + out_w, :]
                acc += jax.lax.dot(
                    tap.reshape(N * out_h * out_w, Cin).astype(compute_dtype),
                    w[dy, dx],
                    preferred_element_type=jnp.float32,
                )
    else:
        assert stride == 2
        # Parity planes of the padded buffer, each laundered to VMEM.
        padded = pad_ref[...]
        x2 = padded.reshape(N, Hp // 2, 2, Wp // 2, 2, Cin)
        for p in range(2):
            for q in range(2):
                plane_refs[2 * p + q][...] = jax.lax.slice(
                    x2,
                    (0, 0, p, 0, q, 0),
                    (N, Hp // 2, p + 1, Wp // 2, q + 1, Cin),
                ).reshape(N, Hp // 2, Wp // 2, Cin)
        # Tap (dy, dx): plane[dy%2][dx%2] at offset (dy//2, dx//2)
        # (pad_low already applied inside the padded buffer).
        for dy in range(k):
            a, p = divmod(dy, 2)
            for dx in range(k):
                c, q = divmod(dx, 2)
                tap = plane_refs[2 * p + q][
                    0:N, a : a + out_h, c : c + out_w, :
                ]
                acc += jax.lax.dot(
                    tap.reshape(N * out_h * out_w, Cin).astype(compute_dtype),
                    w[dy, dx],
                    preferred_element_type=jnp.float32,
                )
    acc = acc + b
    if relu:
        acc = jnp.maximum(acc, 0.0)
    return acc.reshape(N, out_h, out_w, Cout)


def fusable_prefix(
    h: int, w: int, ks: Sequence[int], strides: Sequence[int]
) -> int:
    """How many leading layers satisfy the even-dims constraint."""
    n = 0
    for k, s in zip(ks, strides):
        if s == 2 and (h % 2 or w % 2):
            break
        h, _, _ = same_pads(h, k, s)
        w, _, _ = same_pads(w, k, s)
        n += 1
    return n


def _stack_kernel(*refs, layers, n_weights, geoms, compute_dtype):
    x_ref = refs[0]
    out_ref = refs[1 + 2 * n_weights]
    wrefs = refs[1 : 1 + 2 * n_weights]
    scratch = list(refs[2 + 2 * n_weights :])

    idx = 0
    src = x_ref
    for i, (stride, relu) in enumerate(layers):
        w = wrefs[2 * i][...].astype(compute_dtype)
        b = wrefs[2 * i + 1][...].astype(jnp.float32)
        pad_ref = scratch[idx]
        idx += 1
        plane_refs = None
        if stride == 2:
            plane_refs = scratch[idx : idx + 4]
            idx += 4
        y = _conv_layer(
            src, w, b, stride, relu, pad_ref, plane_refs, geoms[i],
            compute_dtype,
        )
        if i == len(layers) - 1:
            out_ref[...] = y.astype(out_ref.dtype)
        else:
            act_ref = scratch[idx]
            idx += 1
            act_ref[...] = y.astype(act_ref.dtype)
            src = act_ref


@partial(
    jax.jit,
    static_argnames=("strides", "relus", "batch_tile", "compute_dtype_name"),
)
def fused_conv_stack(
    x: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    strides: tuple,
    relus: tuple,
    batch_tile: int = 8,
    compute_dtype_name: str = "bfloat16",
) -> jnp.ndarray:
    """Run the conv stack as one Pallas kernel.

    x: (B, H, W, Cin); weights[i]: (k, k, Cin_i, Cout_i); biases[i]:
    (Cout_i,). Returns (B, out_h, out_w, C_last) float32. B must be a
    multiple of batch_tile; stride-2 layers need even input dims
    (check with `fusable_prefix`).
    """
    B, H, W, Cin = x.shape
    compute_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        compute_dtype_name
    ]
    assert B % batch_tile == 0, (B, batch_tile)
    N = batch_tile

    geoms = []
    scratch_shapes = []
    hh, ww, cin = H, W, Cin
    total_flops = 0
    for i, (wt, s) in enumerate(zip(weights, strides)):
        k = wt.shape[0]
        geom = _layer_geometry(hh, ww, k, s)
        geoms.append(geom)
        out_h, out_w, _, _, Hp, Wp = geom
        scratch_shapes.append(pltpu.VMEM((N, Hp, Wp, cin), compute_dtype))
        if s == 2:
            for _ in range(4):
                scratch_shapes.append(
                    pltpu.VMEM((N, Hp // 2, Wp // 2, cin), compute_dtype)
                )
        total_flops += 2 * B * out_h * out_w * k * k * cin * wt.shape[3]
        cin = wt.shape[3]
        if i < len(weights) - 1:
            scratch_shapes.append(
                pltpu.VMEM((N, out_h, out_w, cin), compute_dtype)
            )
        hh, ww = out_h, out_w

    in_specs = [
        pl.BlockSpec(
            (N, H, W, Cin), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        )
    ]
    operands = [x]
    for wt, bs in zip(weights, biases):
        in_specs.append(
            pl.BlockSpec(
                wt.shape, lambda b, nd=wt.ndim: (0,) * nd,
                memory_space=pltpu.VMEM,
            )
        )
        in_specs.append(
            pl.BlockSpec(bs.shape, lambda b: (0,), memory_space=pltpu.VMEM)
        )
        operands.extend([wt, bs])

    return pl.pallas_call(
        partial(
            _stack_kernel,
            layers=tuple(zip(strides, relus)),
            n_weights=len(weights),
            geoms=tuple(geoms),
            compute_dtype=compute_dtype,
        ),
        grid=(B // N,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (N, hh, ww, cin), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, hh, ww, cin), jnp.float32),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=total_flops,
            bytes_accessed=int(np.prod(x.shape)) * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*operands)
