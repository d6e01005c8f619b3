"""Mosaic capability probe, stage 2: bridge from the PASSING isolated
3x3-layer probe (exp_mosaic_caps g/h) to the FAILING production
conv_chain_nhwc (HTTP 500 in tpu_compile_helper at every layer count).

Stage-1 findings (2026-08-19, this libtpu): iota (P,1)/(P,C), lane
masks, keepdims, column slices, padded-scratch taps + dot all PASS;
in-kernel s2d merge reshapes FAIL (HTTP 500); const capture FAILS with
a typed error. So the stride-1 chain's crash must come from one of the
constructs the real kernel adds on top of probe g:

  a. grid=(B,) + (1,P,C) BlockSpecs + x_ref[0] squeeze-read   [g +]
  b. partial-column scratch slices (scratch[:, :cin], cin < cmax)
  c. bias add + relu epilogue
  d. two layers with DIFFERENT channel widths (64 -> 32)
  e. cost_estimate=pl.CostEstimate(...)
  f. all of a-e = the real kernel shape (64->32 two-layer)
  g. the REAL conv_chain_nhwc at the probe shape
  h. REAL conv_chain_nhwc, B=1 grid=(1,)
  i. (P, 1) iota INSIDE a grid kernel (the strided kernels' typed
     broadcast_in_dim failure is grid-context-dependent?)

Run: tools/dev/tpu_run.sh tools/dev/exp_mosaic_caps2.py 1500 3
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
rng = np.random.default_rng(0)
X2 = jnp.asarray(rng.normal(size=(P, C)), jnp.float32)
X3 = jnp.asarray(rng.normal(size=(B, P, C)), jnp.float32)
W9 = jnp.asarray(rng.normal(size=(9, C, C)) * 0.1, jnp.float32)
W9b = jnp.asarray(rng.normal(size=(9, C, C // 2)) * 0.1, jnp.float32)
BIAS = jnp.asarray(rng.normal(size=(1, C)), jnp.float32)


def report(tag, fn):
    try:
        out = jax.block_until_ready(fn())
        print(f"{tag:<46} PASS  absmax={float(jnp.abs(out).max()):.3e}",
              flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = " ".join(str(e).split())[:160]
        print(f"{tag:<46} FAIL  {msg}", flush=True)
        return False


def const_spec(shape):
    return pl.BlockSpec(
        tuple(shape),
        partial(lambda nd, i: (0,) * nd, len(shape)),
        memory_space=pltpu.VMEM,
    )


def layer(x, w_ref, scratch, cin, cout, mask_l, mask_r, bias=None,
          relu=False):
    pad = W + 1
    scratch[0:pad, :cin] = jnp.zeros((pad, cin), jnp.float32)
    scratch[pad : pad + P, :cin] = x
    scratch[pad + P : 2 * pad + P, :cin] = jnp.zeros((pad, cin), jnp.float32)
    acc = jnp.zeros((P, cout), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            off = pad + (ky - 1) * W + (kx - 1)
            tap = scratch[off : off + P, :cin]
            if kx == 0:
                tap = tap * mask_l[:, :cin]
            elif kx == 2:
                tap = tap * mask_r[:, :cin]
            acc += jax.lax.dot(
                tap, w_ref[ky * 3 + kx], preferred_element_type=jnp.float32
            )
    if bias is not None:
        acc = acc + bias
    if relu:
        acc = jax.nn.relu(acc)
    return acc


def masks():
    col = jax.lax.broadcasted_iota(jnp.int32, (P, C), 0) % W
    return (col >= 1).astype(jnp.float32), (col < W - 1).astype(jnp.float32)


# a. grid + squeeze-read
def k_grid(x_ref, w_ref, o_ref, scratch):
    ml, mr = masks()
    o_ref[0] = layer(x_ref[0], w_ref, scratch, C, C, ml, mr)


def probe_a():
    f = pl.pallas_call(
        k_grid,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec((9, C, C)),
        ],
        out_specs=pl.BlockSpec((1, P, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P + 2 * (W + 1), C), jnp.float32)],
    )
    return jax.jit(f)(X3, W9)


# b. partial-column scratch (cmax = 2C, uses :C)
def k_partial(x_ref, w_ref, o_ref, scratch):
    ml, mr = masks()
    o_ref[...] = layer(x_ref[...], w_ref, scratch, C, C, ml, mr)


def probe_b():
    f = pl.pallas_call(
        k_partial,
        out_shape=jax.ShapeDtypeStruct((P, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P + 2 * (W + 1), 2 * C), jnp.float32)],
    )
    return jax.jit(f)(X2, W9)


# c. bias + relu epilogue
def k_biasrelu(x_ref, w_ref, b_ref, o_ref, scratch):
    ml, mr = masks()
    o_ref[...] = layer(
        x_ref[...], w_ref, scratch, C, C, ml, mr, bias=b_ref[0], relu=True
    )


def probe_c():
    f = pl.pallas_call(
        k_biasrelu,
        out_shape=jax.ShapeDtypeStruct((P, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P + 2 * (W + 1), C), jnp.float32)],
    )
    return jax.jit(f)(X2, W9, BIAS)


# d. two layers, channel change 64 -> 64 -> 32
def k_twolayer(x_ref, w1_ref, w2_ref, o_ref, scratch):
    ml, mr = masks()
    h = layer(x_ref[...], w1_ref, scratch, C, C, ml, mr, relu=True)
    o_ref[...] = layer(h, w2_ref, scratch, C, C // 2, ml, mr)


def probe_d():
    f = pl.pallas_call(
        k_twolayer,
        out_shape=jax.ShapeDtypeStruct((P, C // 2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P + 2 * (W + 1), C), jnp.float32)],
    )
    return jax.jit(f)(X2, W9, W9b)


# e. cost_estimate
def probe_e():
    f = pl.pallas_call(
        k_partial,
        out_shape=jax.ShapeDtypeStruct((P, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P + 2 * (W + 1), 2 * C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * P * 9 * C * C, bytes_accessed=4 * P * 2 * C,
            transcendentals=0,
        ),
    )
    return jax.jit(f)(X2, W9)


# f. everything together (the real kernel's construct set)
def k_full(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, scratch):
    ml, mr = masks()
    h = layer(x_ref[0], w1_ref, scratch, C, C, ml, mr, bias=b1_ref[0],
              relu=True)
    o_ref[0] = layer(h, w2_ref, scratch, C, C // 2, ml, mr,
                     bias=b2_ref[0][:, : C // 2], relu=True)


def probe_f():
    f = pl.pallas_call(
        k_full,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec((9, C, C)),
            const_spec((1, C)),
            const_spec((9, C, C // 2)),
            const_spec((1, C)),
        ],
        out_specs=pl.BlockSpec((1, P, C // 2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, C // 2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P + 2 * (W + 1), C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * P * 9 * C * C, bytes_accessed=4 * B * P * C,
            transcendentals=0,
        ),
    )
    return jax.jit(f)(X3, W9, BIAS, W9b, BIAS)


# g/h. the real production entry point
def probe_real(b):
    from davo_tpu.kernels.rowconv import conv_chain_nhwc

    x = jnp.asarray(rng.normal(size=(b, H, W, C)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, C, C // 2)) * 0.1, jnp.float32)
    b1 = jnp.zeros((C,), jnp.float32)
    b2 = jnp.zeros((C // 2,), jnp.float32)
    return conv_chain_nhwc(
        x, [w1, w2], [b1, b2], (True, True), "float32"
    )


# i. (P,1) iota inside a grid kernel
def k_iota_grid(x_ref, o_ref):
    col = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) % W
    o_ref[0] = x_ref[0] * (col >= 1).astype(jnp.float32)


def probe_i():
    f = pl.pallas_call(
        k_iota_grid,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, P, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, C), jnp.float32),
    )
    return jax.jit(f)(X3)


def main():
    dev = jax.devices()[0]
    print("devices:", jax.devices(), flush=True)
    if dev.platform != "tpu":
        print(f"REFUSING: platform {dev.platform!r} != tpu", flush=True)
        sys.exit(2)
    report("a. grid=(B,) + (1,P,C) specs + [0] read", probe_a)
    report("b. partial-column scratch (:C of 2C)", probe_b)
    report("c. bias + relu epilogue", probe_c)
    report("d. two layers 64->64->32", probe_d)
    report("e. cost_estimate", probe_e)
    report("f. all of a-e combined", probe_f)
    report("g. REAL conv_chain_nhwc (B=4)", lambda: probe_real(B))
    report("h. REAL conv_chain_nhwc (B=1)", lambda: probe_real(1))
    report("i. (P,1) iota inside grid kernel", probe_i)


if __name__ == "__main__":
    main()
