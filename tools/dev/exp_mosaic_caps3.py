"""Mosaic capability probe, stage 3: pin the stride-1 chain's HTTP 500
and validate the empty-store fix for the strided chain.

Stage-2 findings: grid+specs+squeeze, partial-column scratch,
bias+relu, 2-layer channel change, cost_estimate ALL PASS combined —
yet the real conv_chain_nhwc still crashes the compile helper. The
remaining untested delta is the mask FORM: the real kernel multiplies
taps with (P, 1) lane-broadcast masks before the MXU dot; every
passing probe used full (P, C) masks. Stage-1 also showed in-kernel
_s2d_rows reshapes crash the helper independently.

  a. all stage-2 constructs + (P,C) masks (stage-2 f, bug-fixed)
  b. same but (P,1) masks into the dot        <- the real kernel form
  c. standalone pallas_call around the REAL _run_3x3_chain body
  d. REAL conv_chain_nhwc, 1 layer, f32
  e. REAL conv_chain_nhwc, 2 layers, f32
  f. REAL conv_chain_nhwc, 2 layers, bf16 (production form)
  g. REAL conv_chain_strided: k3 s2 single layer (pad_b=0 fix check)
  h. REAL conv_chain_strided: k7 s2 stem (s2d path)
  i. REAL conv_chain_strided_ad grad (k3 s2 + k3 s1), tiny

Run: tools/dev/tpu_run.sh tools/dev/exp_mosaic_caps3.py 1800 4
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
B1 = jnp.asarray(rng.normal(size=(1, C)), jnp.float32)
B2 = jnp.asarray(rng.normal(size=(1, C // 2)), jnp.float32)


def report(tag, fn):
    try:
        out = jax.block_until_ready(fn())
        if isinstance(out, tuple):
            out = out[0]
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


def layer(x, w_ref, scratch, cin, cout, mask_l, mask_r, bias, relu):
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
                tap = tap * (mask_l[:, :cin] if mask_l.shape[1] > 1
                             else mask_l)
            elif kx == 2:
                tap = tap * (mask_r[:, :cin] if mask_r.shape[1] > 1
                             else mask_r)
            acc += jax.lax.dot(
                tap, w_ref[ky * 3 + kx], preferred_element_type=jnp.float32
            )
    acc = acc + bias
    if relu:
        acc = jax.nn.relu(acc)
    return acc


def make_combined(narrow_masks):
    def kern(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, scratch):
        shape = (P, 1) if narrow_masks else (P, C)
        col = jax.lax.broadcasted_iota(jnp.int32, shape, 0) % W
        ml = (col >= 1).astype(jnp.float32)
        mr = (col < W - 1).astype(jnp.float32)
        h = layer(x_ref[0], w1_ref, scratch, C, C, ml, mr, b1_ref[0], True)
        o_ref[0] = layer(
            h, w2_ref, scratch, C, C // 2, ml, mr, b2_ref[0], True
        )

    def run():
        f = pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, P, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                const_spec((9, C, C)),
                const_spec((1, C)),
                const_spec((9, C, C // 2)),
                const_spec((1, C // 2)),
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
        return jax.jit(f)(X3, W9, B1, W9b, B2)

    return run


def probe_c():
    """The REAL _run_3x3_chain body in a standalone pallas_call."""
    from davo_tpu.kernels.rowconv import _run_3x3_chain

    def kern(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, scratch):
        o_ref[0] = _run_3x3_chain(
            x_ref[0], [w1_ref, b1_ref, w2_ref, b2_ref], scratch, W,
            (True, True), jnp.float32,
        ).astype(o_ref.dtype)

    f = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec((9, C, C)),
            const_spec((1, C)),
            const_spec((9, C, C // 2)),
            const_spec((1, C // 2)),
        ],
        out_specs=pl.BlockSpec((1, P, C // 2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, C // 2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P + 2 * (W + 1), C), jnp.float32)],
    )
    return jax.jit(f)(X3, W9, B1, W9b, B2)


def probe_real_nhwc(n_layers, dtype_name):
    from davo_tpu.kernels.rowconv import conv_chain_nhwc

    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    ws = [jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.1, jnp.float32)
          for _ in range(n_layers)]
    bs = [jnp.zeros((C,), jnp.float32) for _ in range(n_layers)]
    return conv_chain_nhwc(x, ws, bs, (True,) * n_layers, dtype_name)


def probe_strided(k, extra_s1=False):
    from davo_tpu.kernels.rowconv import conv_chain_strided

    x = jnp.asarray(rng.normal(size=(B, H, W, 8)), jnp.float32)
    ws = [jnp.asarray(rng.normal(size=(k, k, 8, 16)) * 0.1, jnp.float32)]
    bs = [jnp.zeros((16,), jnp.float32)]
    strides = [2]
    if extra_s1:
        ws.append(
            jnp.asarray(rng.normal(size=(3, 3, 16, 16)) * 0.1, jnp.float32)
        )
        bs.append(jnp.zeros((16,), jnp.float32))
        strides.append(1)
    return conv_chain_strided(
        x, tuple(ws), tuple(bs), tuple(strides),
        (True,) * len(ws), compute_dtype_name="float32",
    )


def probe_strided_grad():
    from davo_tpu.kernels.rowconv import conv_chain_strided_ad

    x = jnp.asarray(rng.normal(size=(2, 16, 24, 8)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 8, 16)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 16, 16)) * 0.1, jnp.float32)
    bs = (jnp.zeros((16,), jnp.float32), jnp.zeros((16,), jnp.float32))

    def loss(w1, w2):
        outs = conv_chain_strided_ad(
            x, (w1, w2), bs, (2, 1), (True, True),
            taps=(1,), compute_dtype_name="float32",
        )
        return jnp.sum(outs[0] ** 2)

    return jax.jit(jax.grad(loss))(w1, w2)


def main():
    dev = jax.devices()[0]
    print("devices:", jax.devices(), flush=True)
    if dev.platform != "tpu":
        print(f"REFUSING: platform {dev.platform!r} != tpu", flush=True)
        sys.exit(2)
    report("a. combined, (P,C) masks", make_combined(False))
    report("b. combined, (P,1) masks -> dot", make_combined(True))
    report("c. REAL _run_3x3_chain body, std call", probe_c)
    report("d. REAL conv_chain_nhwc 1L f32",
           lambda: probe_real_nhwc(1, "float32"))
    report("e. REAL conv_chain_nhwc 2L f32",
           lambda: probe_real_nhwc(2, "float32"))
    report("f. REAL conv_chain_nhwc 2L bf16",
           lambda: probe_real_nhwc(2, "bfloat16"))
    report("g. REAL strided k3 s2 (pad fix)", lambda: probe_strided(3))
    report("h. REAL strided k7 s2 stem", lambda: probe_strided(7))
    report("i. REAL strided_ad grad k3s2+k3s1", probe_strided_grad)


if __name__ == "__main__":
    main()
