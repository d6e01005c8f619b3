"""Mosaic conv-chain bisect, round 2: strictly 2-D (pixels, C)
activations. Every r1 formulation with 3-D/4-D activations hit "Bad
lhs type" on the SECOND in-kernel conv (the bug is a second round of
spatial-op -> reshape -> dot). This variant has NO reshape at all:
taps are row-offset slices of a zero-padded (P + 2W + 2, C) scratch
ref, column wrap masked via in-kernel iota, each tap a
(P, Cin) x (Cin, Cout) dot.

Run: tools/dev/tpu_run.sh tools/dev/exp_conv2d_chain.py 1200 2
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

from davo_tpu.utils.profiling import timed


def _chain_kernel(*refs, H, W, n_layers):
    """n_layers of SAME 3x3 stride-1 conv + bias + relu, all in VMEM.

    refs = [x_ref, (w_ref, b_ref) * n_layers, out_ref, scratch]:
    x_ref (1, P, C0); w (9, Cin, Cout); b (1, Cout);
    scratch (P + 2W + 2, Cmax) f32 zero-padded activation buffer.
    """
    x_ref = refs[0]
    wb_refs = refs[1 : 1 + 2 * n_layers]
    out_ref = refs[1 + 2 * n_layers]
    scratch = refs[2 + 2 * n_layers]
    P = H * W
    pad = W + 1
    col = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) % W
    mask_l = (col >= 1).astype(jnp.float32)   # dx = -1 valid
    mask_r = (col < W - 1).astype(jnp.float32)  # dx = +1 valid
    x = x_ref[0].astype(jnp.float32)  # (P, C0)
    for layer in range(n_layers):
        w_ref = wb_refs[2 * layer]
        b_ref = wb_refs[2 * layer + 1]
        cin = w_ref.shape[1]
        cout = w_ref.shape[2]
        scratch[0:pad, :cin] = jnp.zeros((pad, cin), jnp.float32)
        scratch[pad : pad + P, :cin] = x
        scratch[pad + P : 2 * pad + P, :cin] = jnp.zeros((pad, cin), jnp.float32)
        acc = jnp.zeros((P, cout), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                off = pad + (ky - 1) * W + (kx - 1)
                tap = scratch[off : off + P, :cin]
                if kx == 0:
                    tap = tap * mask_l
                elif kx == 2:
                    tap = tap * mask_r
                acc += jax.lax.dot(
                    tap, w_ref[ky * 3 + kx].astype(jnp.float32)
                )
        x = jax.nn.relu(acc + b_ref[0].astype(jnp.float32))
    out_ref[0] = x.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("H", "W", "n_layers"))
def conv_chain_pallas(x, weights, biases, H, W, n_layers):
    """x: (B, P, C0) bf16; weights[i]: (9, Cin, Cout); biases[i]: (1, Cout)."""
    B, P, C0 = x.shape
    cmax = max([C0] + [w.shape[2] for w in weights[:n_layers]])
    cout = weights[n_layers - 1].shape[2]
    wb = []
    wb_specs = []
    for i in range(n_layers):
        for arr in (weights[i], biases[i]):
            wb.append(arr)
            wb_specs.append(
                pl.BlockSpec(
                    arr.shape,
                    partial(lambda nd, b: (0,) * nd, arr.ndim),
                    memory_space=pltpu.VMEM,
                )
            )
    return pl.pallas_call(
        partial(_chain_kernel, H=H, W=W, n_layers=n_layers),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, C0), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + wb_specs,
        out_specs=pl.BlockSpec((1, P, cout), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((P + 2 * (W + 1), cmax), jnp.float32)],
    )(x, *wb)


def xla_chain(img, weights, biases, n_layers):
    """Reference: lax convs on (B, H, W, C)."""
    x = img.astype(jnp.float32)
    for i in range(n_layers):
        w = weights[i].astype(jnp.float32)  # (9, Cin, Cout)
        k = w.reshape(3, 3, w.shape[1], w.shape[2])
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jax.nn.relu(x + biases[i][0].astype(jnp.float32))
    return x


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B, H, W = 8, 32, 104  # /4 estimator level
    chans = [115, 96, 64, 32]  # estimator-ish widths
    weights = [
        jnp.asarray(
            rng.normal(0, 0.1, (9, chans[i], chans[i + 1])), jnp.bfloat16
        )
        for i in range(3)
    ]
    biases = [
        jnp.asarray(rng.normal(0, 0.1, (1, chans[i + 1])), jnp.bfloat16)
        for i in range(3)
    ]
    img = jnp.asarray(rng.normal(0, 1, (B, H, W, chans[0])), jnp.bfloat16)
    x2d = img.reshape(B, H * W, chans[0])

    for n_layers in (1, 2, 3):
        try:
            out = jax.block_until_ready(
                conv_chain_pallas(x2d, weights, biases, H, W, n_layers)
            )
        except Exception as e:
            print(f"{n_layers}-layer chain FAILED: {str(e)[:300]}", flush=True)
            continue
        ref = xla_chain(img, weights, biases, n_layers)
        got = np.asarray(out, np.float32).reshape(B, H, W, -1)
        err = np.abs(got - np.asarray(ref)).max()
        rel = err / (np.abs(np.asarray(ref)).max() + 1e-6)
        print(f"{n_layers}-layer chain OK maxerr={err:.3e} rel={rel:.3e}", flush=True)
        if n_layers == 3:
            fn = partial(conv_chain_pallas, H=H, W=W, n_layers=3)
            r_p = timed(fn, x2d, weights, biases, iters=20, loops=5)
            jx = jax.jit(lambda a: xla_chain(a, weights, biases, 3))
            jax.block_until_ready(jx(img))
            r_x = timed(jx, img, iters=20, loops=5)
            print(
                f"3-layer timing (B=8): pallas {r_p['ms']:.3f} ms vs XLA {r_x['ms']:.3f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
