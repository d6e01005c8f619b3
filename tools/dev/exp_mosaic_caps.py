"""Mosaic capability probe for the rows-layout kernel family (r2/r3).

Every rowconv kernel fails on hardware — the strided ones with a typed
"Invalid type: broadcast_in_dim" at the (P, 1) broadcasted_iota, the
stride-1 ones with an opaque compile-helper crash. This probes each
suspect construct in ISOLATION (tiny kernels, one construct each) so
the rewrite targets exactly what this libtpu's Mosaic accepts.

Probes, in run order (ADVICE r2: labels match runtime order; weights
reach kernels as explicit refs, matching the real conv_chain_strided
plumbing, with const capture probed separately):

  a. (P, 1) int32 broadcasted_iota            (current form, expect FAIL)
  b. (P, C) int32 broadcasted_iota, dim 0     (full-lane 2-D iota)
  c. (P, 1) f32 value lane-broadcast multiply against (P, C)
  d. jnp.sum(..., axis=1, keepdims=True) -> (P, 1) store
  e. (P, 1) column slice x[:, t:t+1] then lane-broadcast multiply
  f. padded scratch row-slice taps + dot, weights via ref (no masks)
  g. one 3x3 layer with (P, C) full-lane masks, f32 (rewrite candidate)
  h. same as (g) but bf16 compute
  i. in-kernel s2d merge via naive 5-D transpose-reshape
  j. in-kernel s2d merge via rowconv's reshape-only form
  k. const-captured weight matrix (closure, no ref) — isolates const
     lifting from everything else

Run: tools/dev/tpu_run.sh tools/dev/exp_mosaic_caps.py 1500 2
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

H, W, C = 32, 104, 64
P = H * W
rng = np.random.default_rng(0)
X = jnp.asarray(rng.normal(size=(P, C)), jnp.float32)
W9 = jnp.asarray(rng.normal(size=(9, C, C)) * 0.1, jnp.float32)


def run(tag, kernel, out_shape, scratch_shapes=(), args=(X,)):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            scratch_shapes=list(scratch_shapes),
        )
        out = jax.block_until_ready(jax.jit(f)(*args))
        print(f"{tag:<44} PASS  absmax={float(jnp.abs(out).max()):.3e}",
              flush=True)
        return True
    except Exception as e:  # noqa: BLE001 — probe must survive anything
        msg = " ".join(str(e).split())[:160]
        print(f"{tag:<44} FAIL  {msg}", flush=True)
        return False


def k_iota_p1(x_ref, o_ref):
    col = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) % W
    o_ref[...] = x_ref[...] * (col >= 1).astype(jnp.float32)


def k_iota_pc(x_ref, o_ref):
    col = jax.lax.broadcasted_iota(jnp.int32, (P, C), 0) % W
    o_ref[...] = x_ref[...] * (col >= 1).astype(jnp.float32)


def k_bcast_val(x_ref, o_ref):
    v = jnp.sum(x_ref[...], axis=1, keepdims=True) * 0.0 + 2.0
    o_ref[...] = x_ref[...] * v


def k_keepdims(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 0.0
    o_ref[:, 0:1] = jnp.sum(x_ref[...], axis=1, keepdims=True)


def k_colslice(x_ref, o_ref):
    g = x_ref[:, 3:4]
    o_ref[...] = x_ref[...] * g


def k_taps(x_ref, w_ref, o_ref, scratch):
    pad = W + 1
    scratch[0:pad, :] = jnp.zeros((pad, C), jnp.float32)
    scratch[pad : pad + P, :] = x_ref[...]
    scratch[pad + P :, :] = jnp.zeros((pad, C), jnp.float32)
    acc = jnp.zeros((P, C), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            off = pad + (ky - 1) * W + (kx - 1)
            acc += jax.lax.dot(
                scratch[off : off + P, :], w_ref[ky * 3 + kx],
                preferred_element_type=jnp.float32,
            )
    o_ref[...] = acc


def _masked_layer(x, w_ref, scratch, dt):
    pad = W + 1
    col = jax.lax.broadcasted_iota(jnp.int32, (P, C), 0) % W
    mask_l = (col >= 1).astype(dt)
    mask_r = (col < W - 1).astype(dt)
    scratch[0:pad, :] = jnp.zeros((pad, C), dt)
    scratch[pad : pad + P, :] = x.astype(dt)
    scratch[pad + P :, :] = jnp.zeros((pad, C), dt)
    acc = jnp.zeros((P, C), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            off = pad + (ky - 1) * W + (kx - 1)
            tap = scratch[off : off + P, :]
            if kx == 0:
                tap = tap * mask_l
            elif kx == 2:
                tap = tap * mask_r
            acc += jax.lax.dot(
                tap, w_ref[ky * 3 + kx].astype(dt),
                preferred_element_type=jnp.float32,
            )
    return acc


def k_layer_pc_f32(x_ref, w_ref, o_ref, scratch):
    o_ref[...] = _masked_layer(x_ref[...], w_ref, scratch, jnp.float32)


def k_layer_pc_bf16(x_ref, w_ref, o_ref, scratch):
    o_ref[...] = _masked_layer(x_ref[...], w_ref, scratch, jnp.bfloat16)


def k_s2d(x_ref, o_ref):
    x = x_ref[...]
    h2, w2 = H // 2, W // 2
    y = x.reshape(h2, 2, w2, 2, C).transpose(0, 2, 1, 3, 4)
    o_ref[...] = y.reshape(h2 * w2, 4 * C)


def k_s2d_rows(x_ref, o_ref):
    # the rowconv _s2d_rows formulation: reshape-only merges
    from davo_tpu.kernels.rowconv import _s2d_rows
    o_ref[...] = _s2d_rows(x_ref[...], H, W, C)


def k_const_capture(x_ref, o_ref):
    o_ref[...] = jax.lax.dot(
        x_ref[...], W9[4], preferred_element_type=jnp.float32
    )


def main():
    dev = jax.devices()[0]
    print("devices:", jax.devices(), flush=True)
    if dev.platform != "tpu":
        print(f"REFUSING to run: platform is {dev.platform!r}, not tpu "
              "(CPU fallback would wrongly greenlight every construct)",
              flush=True)
        sys.exit(2)
    run("a. iota (P,1)", k_iota_p1, (P, C))
    run("b. iota (P,C) dim0", k_iota_pc, (P, C))
    run("c. (P,1) value lane-broadcast mul", k_bcast_val, (P, C))
    run("d. keepdims sum -> (P,1) store", k_keepdims, (P, C))
    run("e. (P,1) column slice broadcast mul", k_colslice, (P, C))
    run("f. padded row-slice taps + dot (w ref)", k_taps, (P, C),
        [pltpu.VMEM((P + 2 * (W + 1), C), jnp.float32)], (X, W9))
    run("g. one 3x3 layer, (P,C) masks, f32", k_layer_pc_f32, (P, C),
        [pltpu.VMEM((P + 2 * (W + 1), C), jnp.float32)], (X, W9))
    run("h. one 3x3 layer, (P,C) masks, bf16", k_layer_pc_bf16, (P, C),
        [pltpu.VMEM((P + 2 * (W + 1), C), jnp.bfloat16)], (X, W9))
    run("i. s2d naive 5-D transpose reshape", k_s2d, (P // 4, 4 * C))
    run("j. s2d rowconv merge-reshape form", k_s2d_rows,
        (P // 4, 4 * C))
    run("k. const-captured weight dot (closure)", k_const_capture,
        (P, C))


if __name__ == "__main__":
    main()
