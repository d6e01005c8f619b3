"""r2 costvol experiments: find the fastest correlation-volume form.

Level shapes (B=128 flagship bench): /4 (32,104,32) /8 (16,52,64)
/16 (8,26,96), K=81. XLA's 81-slice lowering re-reads both feature
maps per offset (~10 GB HBM traffic at /4) — measured 9.15 ms.
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

from davo_tpu.kernels.costvol import cost_volume_pallas, cost_volume_xla
from davo_tpu.core.warp import flow_warp
from davo_tpu.utils.profiling import timed

SEARCH = 4
K = (2 * SEARCH + 1) ** 2


def _kern_bkhw(f1_ref, f2p_ref, out_ref, *, H, W, d):
    f1 = f1_ref[...]
    inv_c = jnp.float32(1.0 / f1.shape[-1])
    for k in range(d * d):
        dy, dx = divmod(k, d)
        win = f2p_ref[:, dy : dy + H, dx : dx + W, :]
        acc = jnp.sum(
            f1.astype(jnp.float32) * win.astype(jnp.float32), axis=-1
        )
        out_ref[:, k] = (acc * inv_c).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("search", "bb", "out_dtype"))
def costvol_bkhw(f1, f2, search=SEARCH, bb=4, out_dtype=jnp.bfloat16):
    """Batch-tiled kernel, output (B, K, H, W) — no transpose."""
    B, H, W, C = f1.shape
    d = 2 * search + 1
    f2p = jnp.pad(f2, ((0, 0), (search, search), (search, search), (0, 0)))
    return pl.pallas_call(
        partial(_kern_bkhw, H=H, W=W, d=d),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, H + 2 * search, W + 2 * search, C),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, d * d, H, W), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, d * d, H, W), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * d * d * H * W * C,
            bytes_accessed=2 * B * H * W * (2 * C + d * d),
            transcendentals=0,
        ),
    )(f1, f2p)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    B = 128
    shapes = [(32, 104, 32), (16, 52, 64), (8, 26, 96)]
    for H, W, C in shapes:
        print(f"\n=== level ({H},{W},{C}) B={B} K={K} ===")
        f1_f32 = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
        f2_f32 = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
        f1_bf = f1_f32.astype(jnp.bfloat16)
        f2_bf = f2_f32.astype(jnp.bfloat16)

        ref = None
        runs = []

        def add(name, fn, *args):
            nonlocal ref
            try:
                out = jax.block_until_ready(fn(*args))
            except Exception as e:
                print(f"{name:<26} FAILED: {str(e)[:120]}")
                return
            r = timed(fn, *args, iters=20, loops=5)
            val = np.asarray(out, np.float32)
            if val.ndim == 4 and val.shape[1] == K:  # BKHW -> BHWK
                val = np.transpose(val, (0, 2, 3, 1))
            if ref is None:
                ref = val
                err = 0.0
            else:
                err = float(np.abs(val - ref).max())
            print(f"{name:<26} {r['ms']:7.3f} ms  maxerr={err:.2e}")
            runs.append((name, r["ms"]))

        xla32 = jax.jit(lambda a, b: cost_volume_xla(a, b, SEARCH))
        add("xla f32", xla32, f1_f32, f2_f32)
        xlabf = jax.jit(
            lambda a, b: cost_volume_xla(a, b, SEARCH).astype(jnp.bfloat16)
        )
        add("xla bf16", xlabf, f1_bf, f2_bf)
        p32 = jax.jit(lambda a, b: cost_volume_pallas(a, b, SEARCH))
        add("pallas r1 (tr to NHWC)", p32, f1_f32, f2_f32)
        for bb in (4, 8):
            add(f"pallas BKHW bf16 bb={bb}",
                partial(costvol_bkhw, bb=bb), f1_bf, f2_bf)
        add("pallas BKHW f32out bb=4",
            partial(costvol_bkhw, bb=4, out_dtype=jnp.float32),
            f1_bf, f2_bf)

    # flow_warp gather cost at the two refined levels
    print("\n=== flow_warp (bilinear gather) ===")
    for H, W, C in [(32, 104, 32), (16, 52, 64)]:
        src = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
        flw = jnp.asarray(rng.normal(size=(B, H, W, 2)) * 2, jnp.float32)
        fn = jax.jit(lambda s, f: flow_warp(s, f)[0])
        jax.block_until_ready(fn(src, flw))
        r = timed(fn, src, flw, iters=20, loops=5)
        print(f"flow_warp ({H},{W},{C})      {r['ms']:7.3f} ms")


if __name__ == "__main__":
    main()
