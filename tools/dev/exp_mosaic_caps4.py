"""Mosaic capability probe, stage 4: bisect INSIDE _s2d_rows.

The merge-reshape s2d (already transpose-free: contiguous reshapes +
column slices + lane concat) still crashes the compile helper
(stage-1 probes i/j). Which primitive?

  a. wide row-merge reshape (P, C) -> (H/2, 2*W*C) alone
  b. a + column slice [:, :W*C]
  c. b + narrow split reshape -> (H/2*W/2, 2C)
  d. c + lane concat of both halves  (== _s2d_rows)
  e. d + dot against remapped weights (the strided layer's use)
  f. SCRATCH-mediated s2d: write x into a (H/2, 2*W*C)-shaped scratch
     via row-block stores, read halves back — no value reshape at all
  g. two separate narrow reshapes, no wide intermediate:
     even rows via x.reshape(H/2, 2, W*C)[:, 0] indexing

Run: tools/dev/tpu_run.sh tools/dev/exp_mosaic_caps4.py 1500 3
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

H, W, C = 32, 104, 8
P = H * W
H2, W2 = H // 2, W // 2
rng = np.random.default_rng(0)
X = jnp.asarray(rng.normal(size=(P, C)), jnp.float32)
WREM = jnp.asarray(rng.normal(size=(4 * C, 16)) * 0.1, jnp.float32)


def run(tag, kernel, out_shape, scratch_shapes=(), args=(X,)):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            scratch_shapes=list(scratch_shapes),
        )
        out = jax.block_until_ready(jax.jit(f)(*args))
        print(f"{tag:<46} PASS  absmax={float(jnp.abs(out).max()):.3e}",
              flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = " ".join(str(e).split())[:160]
        print(f"{tag:<46} FAIL  {msg}", flush=True)
        return False


def k_a(x_ref, o_ref):
    o_ref[...] = x_ref[...].reshape(H2, 2 * W * C)


def k_b(x_ref, o_ref):
    o_ref[...] = x_ref[...].reshape(H2, 2 * W * C)[:, : W * C]


def k_c(x_ref, o_ref):
    even = x_ref[...].reshape(H2, 2 * W * C)[:, : W * C]
    o_ref[...] = even.reshape(H2 * W2, 2 * C)


def k_d(x_ref, o_ref):
    from davo_tpu.kernels.rowconv import _s2d_rows
    o_ref[...] = _s2d_rows(x_ref[...], H, W, C)


def k_e(x_ref, w_ref, o_ref):
    from davo_tpu.kernels.rowconv import _s2d_rows
    y = _s2d_rows(x_ref[...], H, W, C)
    o_ref[...] = jax.lax.dot(
        y, w_ref[...], preferred_element_type=jnp.float32
    )


def k_f(x_ref, o_ref, scratch):
    # Layout laundering through a scratch REF: rows layout in, wide
    # layout out, no value reshape. scratch is (H2, 2*W*C); row k of
    # scratch = image rows 2k,2k+1 -> store via 2-row value reshapes
    # per... still needs a reshape per store; instead store x whole:
    # scratch viewed flat shares the row-major byte order of x, so ONE
    # full-width store of a (P*C,)-flattened... Mosaic has no 1-D, so:
    # write x into a (P, C) scratch, then READ it back with a column
    # slice trick is impossible across shapes. Fall back: per-row-pair
    # stores of value slices (H2 static stores, no reshape).
    for k in range(H2):
        two = x_ref[2 * k * W : (2 * k + 2) * W, :]  # (2W, C)
        scratch[k : k + 1, 0 : 2 * W * C] = two.reshape(1, 2 * W * C)
    o_ref[...] = scratch[...]


def k_g(x_ref, o_ref):
    even = x_ref[...].reshape(H2, 2, W * C)[:, 0]
    o_ref[...] = even.reshape(H2 * W2, 2 * C)


def main():
    dev = jax.devices()[0]
    print("devices:", jax.devices(), flush=True)
    if dev.platform != "tpu":
        print(f"REFUSING: platform {dev.platform!r} != tpu", flush=True)
        sys.exit(2)
    run("a. wide row-merge reshape", k_a, (H2, 2 * W * C))
    run("b. a + column slice", k_b, (H2, W * C))
    run("c. b + narrow split reshape", k_c, (H2 * W2, 2 * C))
    run("d. full _s2d_rows (+ concat)", k_d, (H2 * W2, 4 * C))
    run("e. d + dot (strided-layer use)", k_e, (H2 * W2, 16),
        args=(X, WREM))
    run("f. scratch-mediated, per-row-pair stores", k_f,
        (H2, 2 * W * C), [pltpu.VMEM((H2, 2 * W * C), jnp.float32)])
    run("g. (H2,2,WC) reshape + middle index", k_g, (H2 * W2, 2 * C))


if __name__ == "__main__":
    main()
