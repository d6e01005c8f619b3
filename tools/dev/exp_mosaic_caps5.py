"""Mosaic capability probe, stage 5: the stage-3 paradox.

Stage 3: a construct-identical reimplementation of the 2-layer chain
PASSES (probe b) while the real `_run_3x3_chain` body FAILS (probe c)
with an HTTP 500 from the remote compile helper — but the only source
deltas are same-dtype `.astype` no-ops that vanish at trace time. So
either (1) the helper failures are FLAKY/load-dependent, or (2) the
160-char error truncation hid the actual cause. This probe:

  a. prints the FULL (untruncated) exception for the real 1-layer
     conv_chain_nhwc — the helper's own stderr usually rides in it
  b. retries the same kernel 3x with a varying dummy bias constant
     (defeats the compile cache) to measure flakiness
  c. same for my stage-3 probe-b kernel (the passing twin), 3x
  d. _s2d_rows sub-bisect (stage-4 merged in): wide reshape, column
     slice, narrow reshape, concat, + dot

Run: tools/dev/tpu_run.sh tools/dev/exp_mosaic_caps5.py 1800 3
"""

import os
import sys
from functools import partial

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
B = 4
H2, W2 = H // 2, W // 2
rng = np.random.default_rng(0)
X3 = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
SC = 8  # small channel count for the s2d probes
XS = jnp.asarray(rng.normal(size=(P, SC)), jnp.float32)
WREM = jnp.asarray(rng.normal(size=(4 * SC, 16)) * 0.1, jnp.float32)


def attempt(tag, fn, full_error=False):
    try:
        out = jax.block_until_ready(fn())
        print(f"{tag:<46} PASS  absmax={float(jnp.abs(out).max()):.3e}",
              flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        if full_error:
            print(f"{tag:<46} FAIL — FULL ERROR BELOW", flush=True)
            print("-" * 72, flush=True)
            print(str(e), flush=True)
            print("-" * 72, flush=True)
        else:
            print(f"{tag:<46} FAIL  "
                  f"{' '.join(str(e).split())[:120]}", flush=True)
        return False


def real_1l(bias_val):
    from davo_tpu.kernels.rowconv import conv_chain_nhwc

    w = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.1, jnp.float32)
    b = jnp.full((C,), bias_val, jnp.float32)
    return conv_chain_nhwc(X3, [w], [b], (True,), "float32")


def const_spec(shape):
    return pl.BlockSpec(
        tuple(shape),
        partial(lambda nd, i: (0,) * nd, len(shape)),
        memory_space=pltpu.VMEM,
    )


def twin_1l(bias_val):
    """Construct-identical standalone 1-layer chain (stage-3 b style)."""
    W9 = jnp.asarray(rng.normal(size=(9, C, C)) * 0.1, jnp.float32)
    B1 = jnp.full((1, C), bias_val, jnp.float32)

    def kern(x_ref, w_ref, b_ref, o_ref, scratch):
        pad = W + 1
        col = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) % W
        ml = (col >= 1).astype(jnp.float32)
        mr = (col < W - 1).astype(jnp.float32)
        x = x_ref[0]
        scratch[0:pad, :] = jnp.zeros((pad, C), jnp.float32)
        scratch[pad : pad + P, :] = x
        scratch[pad + P : 2 * pad + P, :] = jnp.zeros((pad, C), jnp.float32)
        acc = jnp.zeros((P, C), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                off = pad + (ky - 1) * W + (kx - 1)
                tap = scratch[off : off + P, :]
                if kx == 0:
                    tap = tap * ml
                elif kx == 2:
                    tap = tap * mr
                acc += jax.lax.dot(
                    tap, w_ref[ky * 3 + kx],
                    preferred_element_type=jnp.float32,
                )
        x = jax.nn.relu(acc + b_ref[0])
        o_ref[0] = x

    f = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec((9, C, C)),
            const_spec((1, C)),
        ],
        out_specs=pl.BlockSpec((1, P, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P + 2 * (W + 1), C), jnp.float32)],
    )
    return jax.jit(f)(X3.reshape(B, P, C), W9, B1)


def srun(tag, kernel, out_shape, args=(XS,)):
    def go():
        f = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32)
        )
        return jax.jit(f)(*args)

    return attempt(tag, go)


def k_wide(x_ref, o_ref):
    o_ref[...] = x_ref[...].reshape(H2, 2 * W * SC)


def k_slice(x_ref, o_ref):
    o_ref[...] = x_ref[...].reshape(H2, 2 * W * SC)[:, : W * SC]


def k_narrow(x_ref, o_ref):
    even = x_ref[...].reshape(H2, 2 * W * SC)[:, : W * SC]
    o_ref[...] = even.reshape(H2 * W2, 2 * SC)


def k_s2d(x_ref, o_ref):
    from davo_tpu.kernels.rowconv import _s2d_rows
    o_ref[...] = _s2d_rows(x_ref[...], H, W, SC)


def k_s2d_dot(x_ref, w_ref, o_ref):
    from davo_tpu.kernels.rowconv import _s2d_rows
    y = _s2d_rows(x_ref[...], H, W, SC)
    o_ref[...] = jax.lax.dot(y, w_ref[...],
                             preferred_element_type=jnp.float32)


def main():
    dev = jax.devices()[0]
    print("devices:", jax.devices(), flush=True)
    if dev.platform != "tpu":
        print(f"REFUSING: platform {dev.platform!r} != tpu", flush=True)
        sys.exit(2)
    attempt("a. REAL conv_chain_nhwc 1L (FULL error)",
            lambda: real_1l(0.0), full_error=True)
    for i in range(1, 4):
        attempt(f"b{i}. REAL 1L retry (bias={i})", lambda i=i: real_1l(float(i)))
    for i in range(1, 4):
        attempt(f"c{i}. twin 1L (bias={i})", lambda i=i: twin_1l(float(i)))
    srun("d1. wide row-merge reshape", k_wide, (H2, 2 * W * SC))
    srun("d2. + column slice", k_slice, (H2, W * SC))
    srun("d3. + narrow split reshape", k_narrow, (H2 * W2, 2 * SC))
    srun("d4. full _s2d_rows (+ concat)", k_s2d, (H2 * W2, 4 * SC))
    srun("d5. _s2d_rows + dot", k_s2d_dot, (H2 * W2, 16),
         args=(XS, WREM))


if __name__ == "__main__":
    main()
