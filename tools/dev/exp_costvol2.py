"""Costvol kernel round 2: bb=1 3-D formulation (the shape that
compiled on this Mosaic in r1), bf16, no output transpose. Compare
in-context estimates: XLA slices ~5.3 ms total across levels."""

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

from davo_tpu.models.flownet import cost_volume
from davo_tpu.utils.profiling import timed

SEARCH = 4
D = 2 * SEARCH + 1
K = D * D
B = 128


def _kern(f1_ref, f2p_ref, out_ref, *, H, W):
    f1 = f1_ref[0].astype(jnp.float32)  # (H, W, C)
    inv_c = jnp.float32(1.0 / f1.shape[-1])
    for k in range(K):
        dy, dx = divmod(k, D)
        win = f2p_ref[0, dy : dy + H, dx : dx + W, :].astype(jnp.float32)
        out_ref[0, k] = (jnp.sum(f1 * win, axis=-1) * inv_c).astype(
            out_ref.dtype
        )


@partial(jax.jit, static_argnames=("out_dtype",))
def costvol_b1(f1, f2, out_dtype=jnp.bfloat16):
    Bs, H, W, C = f1.shape
    f2p = jnp.pad(f2, ((0, 0), (SEARCH, SEARCH), (SEARCH, SEARCH), (0, 0)))
    return pl.pallas_call(
        partial(_kern, H=H, W=W),
        grid=(Bs,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H + 2 * SEARCH, W + 2 * SEARCH, C),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, H, W), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bs, K, H, W), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bs * K * H * W * C,
            bytes_accessed=2 * Bs * H * W * (2 * C + K),
            transcendentals=0,
        ),
    )(f1, f2p)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for H, W, C in [(32, 104, 32), (16, 52, 64), (8, 26, 96)]:
        f1 = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
        f2 = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
        try:
            out = jax.block_until_ready(costvol_b1(f1, f2))
        except Exception as e:
            print(f"({H},{W},{C}) pallas FAILED: {str(e)[:150]}", flush=True)
            continue
        ref = cost_volume(
            f1.astype(jnp.float32), f2.astype(jnp.float32), SEARCH
        )
        err = float(
            jnp.abs(
                jnp.transpose(out.astype(jnp.float32), (0, 2, 3, 1)) - ref
            ).max()
        )
        r = timed(costvol_b1, f1, f2, iters=20, loops=5)
        print(
            f"({H},{W},{C}) pallas b1 bf16: {r['ms']:7.3f} ms  maxerr={err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
