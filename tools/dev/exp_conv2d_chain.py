"""Mosaic conv-chain bisect + fused-kernel candidates, all in strictly
2-D (pixels, C) activation layout.

Every r1 formulation with 3-D/4-D in-kernel activations hit Mosaic's
"Bad lhs type" on the SECOND in-kernel conv (the bug is a second round
of spatial-op -> reshape -> dot). This layout has NO reshape at all:
activations live as (P, C) matrices, spatial taps are CONTIGUOUS ROW
SLICES of a zero-padded (P + 2*pad, C) scratch ref (row-major: the
(dy, dx) tap of pixel p is row p + dy*W + dx), and column wrap is
masked with iota masks.

Phases (each independently try/except'd so one Mosaic failure still
lets the rest report):
  1. bisect: 1/2/3-layer 3x3 chains, small shapes — does the second
     in-kernel dot compile at all in this layout?
  2. estimator: the REAL /4 flow-estimator chain (Cin 115 -> 96, 64,
     32, 2-linear) at production shapes (B=256 folded, 32x104),
     correctness + timing vs XLA.
  3. costvol: ALL (2s+1)^2 correlation slices in ONE kernel
     (elementwise mul + lane reduce per row-sliced tap — NO matmul,
     so it cannot hit the matmul layout bug), /4 shapes, search=3,
     C=8 (davo-fast), vs the XLA slice loop. The slice loop is ~33 us
     dispatch per slice kernel (r2c profile) => ~1.6 ms/level.

Run: tools/dev/tpu_run.sh tools/dev/exp_conv2d_chain.py 2400 3
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

INTERP = jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Conv chain kernel (2-D rows layout)
# ---------------------------------------------------------------------------

def _chain_kernel(*refs, H, W, n_layers, relus):
    """n_layers of SAME 3x3 stride-1 conv + bias (+ relu), all in VMEM.

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
        x = acc + b_ref[0].astype(jnp.float32)
        if relus[layer]:
            x = jax.nn.relu(x)
    out_ref[0] = x.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("H", "W", "n_layers", "relus"))
def conv_chain_pallas(x, weights, biases, H, W, n_layers, relus=None):
    """x: (B, P, C0); weights[i]: (9, Cin, Cout); biases[i]: (1, Cout)."""
    B, P, C0 = x.shape
    if relus is None:
        relus = (True,) * n_layers
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
        partial(_chain_kernel, H=H, W=W, n_layers=n_layers, relus=relus),
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
        interpret=INTERP,
    )(x, *wb)


def xla_chain(img, weights, biases, n_layers, relus=None):
    """Reference: lax convs on (B, H, W, C)."""
    if relus is None:
        relus = (True,) * n_layers
    x = img.astype(jnp.float32)
    for i in range(n_layers):
        w = weights[i].astype(jnp.float32)  # (9, Cin, Cout)
        k = w.reshape(3, 3, w.shape[1], w.shape[2])
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = x + biases[i][0].astype(jnp.float32)
        if relus[i]:
            x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------------------
# Phases
# ---------------------------------------------------------------------------

def phase1_bisect():
    print("== phase 1: 2-D layout bisect ==", flush=True)
    rng = np.random.default_rng(0)
    B, H, W = 8, 32, 104  # /4 estimator level
    chans = [115, 96, 64, 32]
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
                conv_chain_pallas(x2d, tuple(weights), tuple(biases), H, W,
                                  n_layers)
            )
        except Exception as e:
            print(f"{n_layers}-layer chain FAILED: {str(e)[:300]}", flush=True)
            continue
        ref = xla_chain(img, weights, biases, n_layers)
        got = np.asarray(out, np.float32).reshape(B, H, W, -1)
        err = np.abs(got - np.asarray(ref)).max()
        rel = err / (np.abs(np.asarray(ref)).max() + 1e-6)
        print(f"{n_layers}-layer chain OK maxerr={err:.3e} rel={rel:.3e}",
              flush=True)


def phase2_estimator():
    print("== phase 2: estimator chain at production shapes ==", flush=True)
    rng = np.random.default_rng(1)
    B, H, W = 64 if INTERP else 256, 32, 104
    chans = [115, 96, 64, 32, 2]
    relus = (True, True, True, False)
    weights = tuple(
        jnp.asarray(
            rng.normal(0, 0.05, (9, chans[i], chans[i + 1])), jnp.bfloat16
        )
        for i in range(4)
    )
    biases = tuple(
        jnp.asarray(rng.normal(0, 0.05, (1, chans[i + 1])), jnp.bfloat16)
        for i in range(4)
    )
    img = jnp.asarray(rng.normal(0, 1, (B, H, W, chans[0])), jnp.bfloat16)
    x2d = img.reshape(B, H * W, chans[0])
    try:
        out = jax.block_until_ready(
            conv_chain_pallas(x2d, weights, biases, H, W, 4, relus)
        )
    except Exception as e:
        print(f"estimator chain FAILED: {str(e)[:300]}", flush=True)
        return
    ref = xla_chain(img, weights, biases, 4, relus)
    err = np.abs(
        np.asarray(out, np.float32).reshape(B, H, W, -1) - np.asarray(ref)
    ).max()
    print(f"estimator chain OK maxerr={err:.3e}", flush=True)
    if INTERP:
        return
    fn = partial(conv_chain_pallas, H=H, W=W, n_layers=4, relus=relus)
    r_p = timed(fn, x2d, weights, biases, iters=20, loops=5)
    jx = jax.jit(lambda a: xla_chain(a, weights, biases, 4, relus))
    jax.block_until_ready(jx(img))
    r_x = timed(jx, img, iters=20, loops=5)
    print(
        f"estimator timing (B={B}): pallas {r_p['ms']:.3f} ms "
        f"vs XLA {r_x['ms']:.3f} ms",
        flush=True,
    )


def phase3_costvol():
    print("== phase 3: one-kernel costvol ==", flush=True)
    from davo_tpu.kernels.costvol import cost_volume_pallas_rows
    from davo_tpu.models.flownet import cost_volume

    rng = np.random.default_rng(2)
    search, C = 3, 8
    for (H, W) in ((32, 104), (16, 52)):
        B = 32 if INTERP else 256
        f1 = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.float32)
        f2 = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.float32)
        try:
            out = jax.block_until_ready(
                cost_volume_pallas_rows(f1, f2, search)
            )
        except Exception as e:
            print(f"costvol {H}x{W} FAILED: {str(e)[:300]}", flush=True)
            return
        ref = cost_volume(f1, f2, search)
        err = np.abs(np.asarray(out) - np.asarray(ref)).max()
        print(f"costvol {H}x{W} OK maxerr={err:.3e}", flush=True)
        if INTERP:
            continue
        fn = partial(cost_volume_pallas_rows, search=search)
        r_p = timed(fn, f1, f2, iters=20, loops=5)
        jx = jax.jit(lambda a, b: cost_volume(a, b, search))
        jax.block_until_ready(jx(f1, f2))
        r_x = timed(jx, f1, f2, iters=20, loops=5)
        print(
            f"costvol {H}x{W} timing (B={B}): pallas {r_p['ms']:.3f} ms "
            f"vs XLA slices {r_x['ms']:.3f} ms",
            flush=True,
        )


def main():
    print("devices:", jax.devices(), flush=True)
    try:
        phase1_bisect()
    except Exception as e:
        print("phase1 crashed:", str(e)[:300], flush=True)
    try:
        phase2_estimator()
    except Exception as e:
        print("phase2 crashed:", str(e)[:300], flush=True)
    try:
        phase3_costvol()
    except Exception as e:
        print("phase3 crashed:", str(e)[:300], flush=True)


if __name__ == "__main__":
    main()
